"""Benchmark harness.

Headline: the flagship SND pipeline (blocking → pairwise scoring →
transitive clustering) over a deterministic records table sized to the
scale factor, plus a battery of representative operator queries over
$GRAFT_SF_DIR. Prints ONE JSON line.

    python bench.py                  # sf0.1, num_cpus from $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling        # same job at num_cpus=8 and 32 in fresh
                                     # processes; reports both + scaling efficiency

The records input is generated once (Ray-parallel, seeded, cached in /tmp
keyed by the spec) so repeated runs measure the pipeline, not the
generator; one untimed pass warms the page cache.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q_segment_revenue",
    "q_supplier_volume",
    "q_events_tumbling",
    "q_events_sessions",
    "q_events_top_per_user",
    "q_events_asof",
    "q_events_range_window",
    "q_doc_token_stats",
    "q_doc_langid",
    "q_doc_ngram_pairs",
    "q_doc_minhash_dedup",
    "q_doc_top_tokens",
    "q_doc_surprisal",
    "q_graph_pagerank",
    "q_knn_cosine",
    "q_embed_kmeans",
    "q_doc_pack",
    "q_events_funnel",
    "q_doc_simjoin_tables",
    "q_custkeys_intersect",
    "q_orders_ntile",
    "q_lineitem_melt",
    "q_orders_price_band",
    "q_doc_editjoin",
    "q_doc_keywords",
    "q_orders_snapshot_diff",
    "q_events_cdc_apply",
    "q_graph_kcore",
    "q_graph_hits",
    # round-5 session-4 batch
    "q_graph_sssp",
    "q_events_scd2",
    "q_cust_supp_mutual_best",
    "q_lineitem_key_skew",
    "q_events_debounce",
    "q_doc_fs_linkage",
    "q_part_soundex",
    "q_linreg_by_flag",
    "q_quantity_robust",
    "q_part_fuzzy_dedupe",
    "q_part_fingerprint",
    "q_lang_top_terms",
    "q_orders_infer_types",
    "q_orders_ntile_by_priority",
    "q_orders_prefix_route",
    "q_graph_pagerank_weighted",
    "q_graph_ppr",
    "q_orders_fd_repair",
    "q_discount_weighted_median",
    "q_events_topk_ties",
    "q_events_paths",
    "rnd_assign",
    "ind_detect",
]


def bench_records_path(sf: float, seed: int = 42) -> tuple[str, int]:
    """Generate (once) and cache the bench records table; returns (path, n_blocks)."""
    import ray.data as rd

    from whoiswho_ray.fixtures import FixtureSpec, gen_block

    # sf0.1 → 19200 blocks ≈ 2.1M records: big enough that parallel compute
    # dominates the ~15 s of fixed per-run cost (idf reduce, pool startup,
    # shuffle coordination) at both parallelism levels
    n_blocks = max(20, int(19200 * sf * 10))
    spec = FixtureSpec(n_blocks=n_blocks, hot_factor=20, seed=seed)
    tag = f"whoiswho_bench_{n_blocks}_{spec.hot_factor}_{seed}"
    path = os.path.join("/tmp", tag)
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path, n_blocks

    def gen(batch):
        import pyarrow as pa
        cols = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
        for b in batch["id"]:
            out = gen_block(spec, int(b))["records"]
            for k in cols:
                cols[k].extend(out[k])
        return pa.table(cols)

    # Write into a fresh staging dir and rename atomically: a crashed or
    # concurrent generator must never leave a half-written (or, worse,
    # DOUBLE-written) cache that a later run trusts — a torn cache once
    # inflated the hot blocks with duplicate rows and quadratically
    # distorted the headline.
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix=tag + ".stage.", dir="/tmp")
    rd.range(n_blocks).map_batches(gen, batch_size=16, batch_format="numpy").write_parquet(stage)
    with open(os.path.join(stage, "_DONE"), "w") as f:
        f.write("ok")
    try:
        os.rename(stage, path)  # atomic; loser of a race cleans up
    except OSError:
        if os.path.exists(done):
            shutil.rmtree(stage, ignore_errors=True)
        else:  # stale torn dir from a crashed run — replace it
            shutil.rmtree(path, ignore_errors=True)
            os.rename(stage, path)
    return path, n_blocks


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    from whoiswho_ray.config import SNDConfig
    from whoiswho_ray.pipelines.snd import run_snd

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    rec_path, n_blocks = bench_records_path(sf)
    # warm the page cache (untimed) and count rows
    n_records = rd.read_parquet(rec_path).count()

    cfg = SNDConfig(score_concurrency=max(2, num_cpus // 2))
    t0 = time.time()
    clusters = run_snd(rd.read_parquet(rec_path), cfg)
    n_clustered = clusters.count()
    headline = time.time() - t0
    assert n_clustered == n_records, (n_clustered, n_records)

    qtimes = {}
    queries = entrymod.queries()
    if os.environ.get("RAY_GRAFT_SKIP_QUERIES"):
        queries = {}
    for name in (BENCH_QUERIES if queries else []):
        t0 = time.time()
        res = queries[name](sf_dir)
        if hasattr(res, "count"):
            res.count()  # consume the full pipeline
        qtimes[name] = round(time.time() - t0, 3)

    out = {
        "metric": "snd_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "num_cpus": num_cpus,
        "records": n_records,
        "records_per_sec": round(n_records / headline, 1),
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32,
                repeats: int | None = None) -> dict:
    """Same job, fresh processes, two parallelism levels (the sandbox
    evidence for the north rule's N vs 4N cluster-size criterion).

    ``repeats`` (env ``RAY_GRAFT_SCALE_REPEATS``, default 1) runs each
    level that many times and takes the MIN wall per level — the standard
    noise-floor estimator, applied symmetrically to both levels. This box
    shows ±2× external run-to-run variance; a single pairing can land a
    slow phase on either side and report efficiency noise, not scaling."""
    # pre-generate the shared input at full parallelism so neither timed
    # child pays generation cost
    import ray

    repeats = repeats or int(os.environ.get("RAY_GRAFT_SCALE_REPEATS", "1"))
    ray.init(address="local", include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    bench_records_path(sf)
    ray.shutdown()
    results = {}
    walls = {lo: [], hi: []}
    for r in range(repeats):
        for n in (lo, hi):
            # scaling measures the headline pipeline only (same input,
            # fresh process); queries are timed by the plain bench run
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n), RAY_GRAFT_SKIP_QUERIES="1")
            out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                                 capture_output=True, text=True, check=True,
                                 cwd=os.path.dirname(os.path.abspath(__file__)))
            res = json.loads(out.stdout.strip().splitlines()[-1])
            walls[n].append(res["value"])
            if n not in results or res["value"] < results[n]["value"]:
                results[n] = res
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"rows_per_sec_{lo}": results[lo]["records_per_sec"],
        f"rows_per_sec_{hi}": results[hi]["records_per_sec"],
        "records": results[hi]["records"],
        "sf": results[hi]["sf"],
        "cpus": [lo, hi],
        "repeats": repeats,
        "all_walls": {str(k): [round(x, 1) for x in v] for k, v in walls.items()},
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        # default pair 8→32; any N→4N pair via RAY_GRAFT_SCALE_LO/HI
        # (BASELINE.md records all three measured pairs — per-core
        # throughput peaks near 8 cores on this single box, see analysis)
        lo = int(os.environ.get("RAY_GRAFT_SCALE_LO", "8"))
        hi = int(os.environ.get("RAY_GRAFT_SCALE_HI", str(lo * 4)))
        print(json.dumps(run_scaling(sf_dir, lo=lo, hi=hi)))
    else:
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, num_cpus)))
