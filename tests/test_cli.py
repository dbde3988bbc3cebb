"""End-to-end CLI surface (python -m whoiswho_ray ...).

Each subcommand owns its Ray session, so these run in SUBPROCESSES —
calling main() in-process would tear down the test session's Ray on its
finally-shutdown."""

import json
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq


def _run(args: list[str], timeout: int = 300) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "whoiswho_ray", *args],
        capture_output=True, text=True, check=True, cwd="/root/repo",
        timeout=timeout)
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_fixtures_snd_eval_roundtrip(tmp_path):
    fx = tmp_path / "fx"
    run = tmp_path / "run"
    paths = _run(["fixtures", "--out-dir", str(fx), "--n-blocks", "4"])
    assert set(paths) == {"records", "ground_truth", "labeled_pairs"}

    res = _run(["--num-cpus", "4", "snd",
                "--input", paths["records"], "--out", str(run)])
    assert res["rows"] > 0 and "clusters" in res["stages"]

    ev = _run(["--num-cpus", "4", "eval",
               "--pred", str(run / "clusters"),
               "--truth", paths["ground_truth"]])
    assert ev["f1"] >= 0.99, ev


def test_cli_kmeans(tmp_path):
    import numpy as np
    import pyarrow as pa

    rng = np.random.RandomState(3)
    centers = rng.randn(3, 8) * 8
    vecs = [centers[i % 3] + rng.randn(8) * 0.1 for i in range(90)]
    t = pa.table({"vec_id": pa.array(range(90), pa.int64()),
                  "embedding": pa.array([v.astype("float32") for v in vecs],
                                        pa.list_(pa.float32()))})
    inp = tmp_path / "emb.parquet"
    pq.write_table(t, inp)
    res = _run(["--num-cpus", "4", "kmeans", "--input", str(inp),
                "--k", "3", "--out", str(tmp_path / "km")])
    assert res["rows"] == 90 and res["clusters"] == 3


def test_cli_ind(tmp_path):
    fx = tmp_path / "fx"
    paths = _run(["fixtures", "--out-dir", str(fx), "--n-blocks", "4"])
    gt = pq.read_table(paths["ground_truth"]).to_pandas()
    # every 9th record claimed by another entity
    gt = gt.sort_values("record_id").reset_index(drop=True)
    ents = sorted(gt["entity_id"].unique())
    nxt = {e: ents[(i + 1) % len(ents)] for i, e in enumerate(ents)}
    planted = gt.index % 9 == 0
    asg = pd.DataFrame({
        "record_id": gt["record_id"],
        "profile_id": [nxt[e] if p else e
                       for e, p in zip(gt["entity_id"], planted)],
    })
    asg_path = tmp_path / "asg.parquet"
    asg.to_parquet(asg_path)
    res = _run(["--num-cpus", "4", "ind", "--records", paths["records"],
                "--assignments", str(asg_path),
                "--out", str(tmp_path / "ind")])
    assert res["rows"] == len(gt)
    assert res["flagged"] > 0
