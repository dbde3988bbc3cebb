"""Checkpoint / resume semantics (north_rule: resumable from checkpoint)."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.fixtures import FixtureSpec, generate_tables
from whoiswho_ray.pipelines.snd import run_snd, snd_summary


@pytest.fixture(scope="module")
def tiny_tables():
    return generate_tables(FixtureSpec(n_blocks=4, hot_factor=2, seed=9))


def _input_ds(tabs):
    return rd.from_arrow(tabs["records"])


class TestResume:
    def test_checkpointed_equals_inmemory(self, tiny_tables, tmp_path):
        tabs = tiny_tables
        out = str(tmp_path / "run1")
        a = run_snd(_input_ds(tabs), out_dir=out).to_pandas()
        b = run_snd(_input_ds(tabs)).to_pandas()
        a = a.sort_values("record_id").reset_index(drop=True)
        b = b.sort_values("record_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a[["record_id", "cluster_id"]], b[["record_id", "cluster_id"]])

    def test_manifest_lineage(self, tiny_tables, tmp_path):
        out = str(tmp_path / "run2")
        run_snd(_input_ds(tiny_tables), out_dir=out)
        man = snd_summary(out)
        stages = man["stages"]
        assert {"normalized", "idf", "edges", "clusters", "block_metrics"} <= set(stages)
        assert stages["edges"]["inputs"] == ["normalized", "idf"]
        assert stages["clusters"]["rows"] == tiny_tables["records"].num_rows
        assert "config_hash" in man

    def test_resume_skips_completed_and_matches(self, tiny_tables, tmp_path):
        out = str(tmp_path / "run3")
        first = run_snd(_input_ds(tiny_tables), out_dir=out).to_pandas()
        # simulate a crash after "edges": wipe the later stages
        man_path = os.path.join(out, "manifest.json")
        with open(man_path) as f:
            man = json.load(f)
        for stage in ("clusters", "block_metrics"):
            shutil.rmtree(man["stages"][stage]["path"])
            del man["stages"][stage]
        with open(man_path, "w") as f:
            json.dump(man, f)
        # mtimes of surviving stage outputs must not change on resume
        edges_dir = man["stages"]["edges"]["path"]
        mtimes_before = {p: os.path.getmtime(os.path.join(edges_dir, p)) for p in os.listdir(edges_dir)}
        second = run_snd(_input_ds(tiny_tables), out_dir=out).to_pandas()
        mtimes_after = {p: os.path.getmtime(os.path.join(edges_dir, p)) for p in os.listdir(edges_dir)}
        assert mtimes_before == mtimes_after  # edges were reused, not rebuilt
        a = first.sort_values("record_id").reset_index(drop=True)
        b = second.sort_values("record_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_config_change_invalidates(self, tiny_tables, tmp_path):
        out = str(tmp_path / "run4")
        run_snd(_input_ds(tiny_tables), out_dir=out)
        man1 = snd_summary(out)
        # a different config must not reuse stages silently
        cfg2 = SNDConfig(tau_edge=2.0)
        run_snd(_input_ds(tiny_tables), cfg=cfg2, out_dir=out)
        man2 = snd_summary(out)
        assert man2["config_hash"] != man1["config_hash"]

    def test_block_metrics_content(self, tiny_tables, tmp_path):
        out = str(tmp_path / "run5")
        run_snd(_input_ds(tiny_tables), out_dir=out)
        man = snd_summary(out)
        bm = pq.read_table(man["stages"]["block_metrics"]["path"]).to_pandas()
        truth = tiny_tables["ground_truth"].to_pandas()
        sizes = truth.groupby("block_key").size()
        got = bm.set_index("block_key")["n_records"]
        for bk, n in sizes.items():
            assert got[bk] == n
        assert {"n_pairs", "salted", "truncated_pairs"} <= set(bm.columns)


class TestPartitionResume:
    """North-rule mid-shuffle resume: the edges stage commits one
    block-hash partition at a time with its own lineage/metrics."""

    def test_partitioned_edges_match_default_and_resume_mid_shuffle(
        self, tiny_tables, tmp_path
    ):
        tabs = tiny_tables
        out = str(tmp_path / "prun")
        first = run_snd(_input_ds(tabs), out_dir=out, partition_resume=True,
                        n_edge_partitions=4).to_pandas()
        # same clusters as the default single-stage path
        plain = run_snd(_input_ds(tabs)).to_pandas()
        a = first.sort_values("record_id").reset_index(drop=True)
        b = plain.sort_values("record_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a[["record_id", "cluster_id"]],
                                      b[["record_id", "cluster_id"]])
        man = snd_summary(out)
        parts = [s for s in man["stages"] if s.startswith("edges/part=")]
        assert len(parts) == 4
        assert all("wall_sec" in man["stages"][p] for p in parts)

        # simulate a crash after two edge partitions: drop the others + all
        # downstream stages, rerun, and verify survivors were not rebuilt
        import json as _json
        import shutil as _shutil
        with open(os.path.join(out, "manifest.json")) as f:
            m = _json.load(f)
        for victim in ["edges/part=2", "edges/part=3", "clusters", "block_metrics"]:
            if victim in m["stages"]:
                _shutil.rmtree(m["stages"][victim]["path"], ignore_errors=True)
                del m["stages"][victim]
        with open(os.path.join(out, "manifest.json"), "w") as f:
            _json.dump(m, f)
        survivor = m["stages"]["edges/part=0"]["path"]
        mt = {p: os.path.getmtime(os.path.join(survivor, p)) for p in os.listdir(survivor)}
        second = run_snd(_input_ds(tabs), out_dir=out, partition_resume=True,
                         n_edge_partitions=4).to_pandas()
        mt2 = {p: os.path.getmtime(os.path.join(survivor, p)) for p in os.listdir(survivor)}
        assert mt == mt2
        c = second.sort_values("record_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, c)
