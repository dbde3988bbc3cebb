"""CLI entry point — the ``demo.py --task {SND,RND}`` surface of the
reference (``/root/reference/demo.py:87-103``) re-expressed:

    python -m whoiswho_ray snd --input records.parquet --out /tmp/run1 \\
        [--partition-resume] [--tau-edge 1.5] ...
    python -m whoiswho_ray rnd --known known.parquet --new new.parquet --out out.parquet
    python -m whoiswho_ray eval --pred clusters/ --truth ground_truth.parquet
    python -m whoiswho_ray fixtures --out-dir /tmp/fx --n-blocks 50

Owns its Ray session (scripts only — library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cfg_from_args(args) -> "object":
    from whoiswho_ray.config import SNDConfig

    base = SNDConfig()
    overrides = {}
    for field in ("w_tokens", "w_repo", "w_ctx", "w_tfidf", "w_name",
                  "tau_edge", "tau_attach"):
        val = getattr(args, field, None)
        if val is not None:
            overrides[field] = val
    from dataclasses import replace

    return replace(base, **overrides) if overrides else base


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="whoiswho_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("snd", help="cluster records (blocking → scoring → union-find)")
    ps.add_argument("--input", required=True, help="records parquet path/dir")
    ps.add_argument("--out", required=True, help="checkpoint/output directory")
    ps.add_argument("--partition-resume", action="store_true")
    for f in ("w_tokens", "w_repo", "w_ctx", "w_tfidf", "w_name", "tau_edge", "tau_attach"):
        ps.add_argument(f"--{f.replace('_', '-')}", type=float, default=None)

    pr = sub.add_parser("rnd", help="assign new records to existing profiles")
    pr.add_argument("--known", required=True)
    pr.add_argument("--new", required=True)
    pr.add_argument("--out", required=True, help="output parquet dir")

    pi = sub.add_parser("ind", help="flag incorrect assignments in claimed profiles")
    pi.add_argument("--records", required=True, help="records parquet path/dir")
    pi.add_argument("--assignments", required=True,
                    help="parquet with (record_id, profile_id)")
    pi.add_argument("--out", required=True, help="output parquet dir")

    pk = sub.add_parser("kmeans", help="distributed Lloyd's k-means over an embedding column")
    pk.add_argument("--input", required=True, help="parquet with a vector list column")
    pk.add_argument("--out", required=True, help="output parquet dir (key + cluster)")
    pk.add_argument("--k", type=int, required=True)
    pk.add_argument("--iters", type=int, default=4)
    pk.add_argument("--vec-col", default="embedding")
    pk.add_argument("--key-col", default="vec_id")

    pe = sub.add_parser("eval", help="pairwise F1 of clusters vs ground truth")
    pe.add_argument("--pred", required=True, help="cluster parquet path/dir")
    pe.add_argument("--truth", required=True, help="ground_truth parquet")

    pf = sub.add_parser("fixtures", help="generate synthetic fixture tables")
    pf.add_argument("--out-dir", required=True)
    pf.add_argument("--n-blocks", type=int, default=50)
    pf.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    if args.cmd == "fixtures":
        from whoiswho_ray.fixtures import FixtureSpec, write_fixture

        paths = write_fixture(args.out_dir, FixtureSpec(n_blocks=args.n_blocks, seed=args.seed))
        print(json.dumps(paths))
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "snd":
            from whoiswho_ray.pipelines.snd import run_snd, snd_summary

            clusters = run_snd(args.input, _cfg_from_args(args), out_dir=args.out,
                               partition_resume=args.partition_resume)
            n = clusters.count()
            man = snd_summary(args.out)
            print(json.dumps({"rows": n, "out": args.out,
                              "stages": list(man["stages"])}))
        elif args.cmd == "rnd":
            from whoiswho_ray.pipelines.rnd import run_rnd

            out = run_rnd(args.known, args.new)
            out.write_parquet(args.out)
            print(json.dumps({"rows": out.count(), "out": args.out}))
        elif args.cmd == "ind":
            from whoiswho_ray.pipelines.ind import run_ind

            import ray.data as rd

            run_ind(args.records, args.assignments).write_parquet(args.out)
            res = rd.read_parquet(args.out)  # one pipeline run; counts off disk
            flagged = res.map_batches(
                lambda d: d[d["is_outlier"]], batch_format="pandas").count()
            print(json.dumps({"rows": res.count(), "flagged": flagged,
                              "out": args.out}))
        elif args.cmd == "kmeans":
            import ray.data as rd

            from whoiswho_ray.stages.kmeans import run_kmeans

            out = run_kmeans(rd.read_parquet(args.input), k=args.k,
                             iters=args.iters, vec_col=args.vec_col,
                             key_col=args.key_col, keep=[args.key_col])
            out.write_parquet(args.out)
            res = rd.read_parquet(args.out)
            sizes = res.groupby("cluster").count().to_pandas()
            print(json.dumps({"rows": int(sizes["count()"].sum()),
                              "clusters": len(sizes), "out": args.out}))
        elif args.cmd == "eval":
            import ray.data as rd

            from whoiswho_ray.evaluation import pairwise_f1_ds

            res = pairwise_f1_ds(rd.read_parquet(args.pred), rd.read_parquet(args.truth))
            mean = res[res["block_key"] == "__mean__"].iloc[0]
            print(json.dumps({"precision": mean["precision"], "recall": mean["recall"],
                              "f1": mean["f1"], "n_blocks": len(res) - 1}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
