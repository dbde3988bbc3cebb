"""Degenerate and adversarial inputs must not crash the pipeline."""

import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.pipelines.snd import run_snd
from whoiswho_ray.stages.idf import build_idf
from whoiswho_ray.stages.normalize import normalize_records


def _records(rows):
    return rd.from_pandas(pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"]))


class TestEdgeCases:
    def test_single_record(self):
        ds = _records([("o/r", "src/a.py", "c1", "py", "alpha beta")])
        out = run_snd(ds).to_pandas()
        assert len(out) == 1
        assert out["cluster_id"].iloc[0].startswith("a#")

    def test_two_singletons_different_blocks(self):
        ds = _records([
            ("o/r", "src/a.py", "c1", "py", "alpha beta"),
            ("o/r", "src/b.py", "c2", "py", "gamma delta"),
        ])
        out = run_snd(ds).to_pandas()
        assert len(out) == 2
        assert out["cluster_id"].nunique() == 2

    def test_empty_and_unicode_content(self):
        ds = _records([
            ("o/r", "src/x.py", "c1", "py", ""),
            ("o/r", "lib/x.py", "c2", "py", "héllo wörld ünïcode çontent"),
            ("o/r", "x.py", "c3", "py", "日本語のコンテンツ here identifier_name"),
        ])
        out = run_snd(ds).to_pandas()
        assert len(out) == 3
        assert out["record_id"].is_unique

    def test_same_content_different_commits_cluster_together(self):
        content = "shared identifier tokens " + " ".join(f"tok{i}" for i in range(30))
        ds = _records([
            ("o/r", "src/mod.py", f"c{i}", "py", content) for i in range(4)
        ])
        out = run_snd(ds).to_pandas()
        assert out["cluster_id"].nunique() == 1

    def test_pathological_paths(self):
        ds = _records([
            ("o/r", "", "c1", "py", "some tokens here"),
            ("o/r", "...", "c2", "py", "other tokens there"),
            ("o/r", "a//b//..py", "c3", "", "third tokens everywhere"),
            ("o/r", "\\windows\\style\\Path.PY", "c4", "py", "fourth tokens"),
        ])
        out = run_snd(ds).to_pandas()
        assert len(out) == 4

    def test_idf_on_empty_token_corpus(self):
        ds = _records([("o/r", "a.py", "c1", "py", ""), ("o/r", "b.py", "c2", "py", "")])
        norm = normalize_records(ds, SNDConfig())
        idf = build_idf(norm, SNDConfig())
        assert idf.ids.size == 0
        # and the full pipeline still runs
        out = run_snd(ds).to_pandas()
        assert len(out) == 2
