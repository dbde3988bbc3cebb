"""Regression tests for the round-4 ADVICE items fixed in round 5:

- NULL partition keys in the grouped window/moment kernels must follow
  SQL semantics (PARTITION BY / GROUP BY group NULLs together) instead
  of NaN != NaN fragmenting or dropping them.
- int64 moment partials must never silently wrap where the SQL oracle
  (HUGEINT accumulation) stays exact.
- phrase_search over a string-id index must fail with a clear message,
  not an opaque numpy cast error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


class TestNullPartitionKeys:
    def test_dense_rank_groups_null_keys_together(self):
        from whoiswho_ray.stages.agg import dense_rank_grouped

        df = pd.DataFrame({
            "g": [1.0, np.nan, np.nan, 1.0, np.nan],
            "v": [10, 5, 7, 10, 5],
            "rid": np.arange(5, dtype=np.int64),
        })
        out = (dense_rank_grouped(rd.from_pandas(df).repartition(3), "g", "v")
               .to_pandas().sort_values("rid").reset_index(drop=True))
        # SQL: PARTITION BY g puts all NULL-g rows in ONE partition
        # (ranks over v=[5,7,5] → 1,2,1); g=1.0 rows tie at rank 1
        by_rid = dict(zip(out["rid"], out["dense_rank"]))
        assert by_rid[1] == 1 and by_rid[4] == 1 and by_rid[2] == 2
        assert by_rid[0] == 1 and by_rid[3] == 1

    def test_null_order_values_tie(self):
        from whoiswho_ray.stages.agg import dense_rank_grouped

        df = pd.DataFrame({"g": [1, 1, 1], "v": [np.nan, np.nan, 1.0],
                           "rid": np.arange(3, dtype=np.int64)})
        out = (dense_rank_grouped(rd.from_pandas(df), "g", "v")
               .to_pandas().sort_values("rid").reset_index(drop=True))
        # the two NULL order values share one rank
        assert out["dense_rank"][0] == out["dense_rank"][1]

    def test_running_sum_groups_null_keys_together(self):
        from whoiswho_ray.stages.windows import grouped_running_sum

        df = pd.DataFrame({
            "g": ["a", None, None, "a"],
            "v": np.array([1, 10, 20, 2], np.int64),
            "o": np.arange(4, dtype=np.int64),
        })
        out = (grouped_running_sum(rd.from_pandas(df).repartition(2),
                                   "g", "v", ["o"])
               .to_pandas().sort_values("o").reset_index(drop=True))
        by_o = dict(zip(out["o"], out["running_sum"]))
        # NULL keys form ONE running partition: 10, then 30
        assert by_o[1] == 10 and by_o[2] == 30
        assert by_o[0] == 1 and by_o[3] == 3

    def test_zscore_null_keys_standardize_not_keyerror(self):
        from whoiswho_ray.stages.agg import zscore_grouped

        df = pd.DataFrame({
            "g": [1.0, np.nan, np.nan, np.nan],
            "x": np.array([5, 0, 10, 5], np.int64),
            "rid": np.arange(4, dtype=np.int64),
        })
        out = (zscore_grouped(rd.from_pandas(df).repartition(2), "g", "x")
               .to_pandas().sort_values("rid").reset_index(drop=True))
        # NULL group: mean 5, std_pop sqrt(50/3); z of x=0 is negative,
        # x=10 positive, x=5 zero
        z = out["z"].to_numpy()
        assert np.isnan(z[0])  # singleton group: zero variance → NaN
        sd = np.sqrt(np.mean((np.array([0, 10, 5]) - 5.0) ** 2))
        np.testing.assert_allclose(z[1:], [(0 - 5) / sd, (10 - 5) / sd, 0.0],
                                   rtol=1e-12)

    def test_grouped_correlation_keeps_null_key_group(self):
        from whoiswho_ray.stages.agg import grouped_correlation

        df = pd.DataFrame({
            "g": [None, None, None, "a", "a", "a"],
            "x": np.array([1, 2, 3, 1, 2, 3], np.int64),
            "y": np.array([2, 4, 6, 3, 2, 1], np.int64),
        })
        out = grouped_correlation(rd.from_pandas(df).repartition(2),
                                  "g", "x", "y")
        assert len(out) == 2  # NULL group present, not dropped
        vals = {str(k): v for k, v in zip(out["g"], out["corr"])}
        np.testing.assert_allclose(vals["a"], -1.0, rtol=1e-12)
        null_corr = [v for k, v in zip(out["g"], out["corr"])
                     if pd.isna(k)][0]
        np.testing.assert_allclose(null_corr, 1.0, rtol=1e-12)


class TestMomentOverflow:
    def test_exact_products_small_path_unchanged(self):
        from whoiswho_ray.stages.agg import correlation

        df = pd.DataFrame({"x": np.array([1, 2, 3, 4], np.int64),
                           "y": np.array([2, 4, 6, 8], np.int64)})
        out = correlation(rd.from_pandas(df), "x", "y")
        np.testing.assert_allclose(out["corr"][0], 1.0, rtol=1e-12)

    def test_overflowing_moment_sum_raises_not_wraps(self):
        from whoiswho_ray.stages.agg import correlation

        # 3 values of 4e9: each square is 1.6e19 > int64 — the naive
        # int64 kernel would wrap silently; the fixed kernel computes
        # exactly and raises because the sum cannot ship as int64
        big = np.array([4_000_000_000] * 3, np.int64)
        df = pd.DataFrame({"x": big, "y": big})
        # surfaces as RayTaskError wrapping the ValueError — match text
        with pytest.raises(Exception, match="exceeds int64"):
            correlation(rd.from_pandas(df), "x", "y")

    def test_object_path_matches_float_reference(self):
        from whoiswho_ray.stages.agg import zscore_grouped

        # skewed magnitudes: the per-batch bound check (n · max|x|²)
        # trips the exact object path, but the true sums fit int64
        x = np.array([2_000_000_000, 3, 5], np.int64)
        df = pd.DataFrame({"g": [1, 1, 1], "x": x,
                           "rid": np.arange(3, dtype=np.int64)})
        out = (zscore_grouped(rd.from_pandas(df), "g", "x")
               .to_pandas().sort_values("rid").reset_index(drop=True))
        sd = x.std(ddof=0)
        np.testing.assert_allclose(
            out["z"].to_numpy(), (x - x.mean()) / sd, rtol=1e-9)


class TestPhraseStringIds:
    def test_clear_error_on_string_doc_ids(self, tmp_path):
        from whoiswho_ray.stages.text_analysis import (index_build,
                                                       phrase_search)

        docs = pd.DataFrame({
            "doc_id": ["a", "b"],
            "text": ["quick brown fox", "brown fox"],
        })
        d = str(tmp_path / "idx")
        index_build(rd.from_pandas(docs), d, num_buckets=2, positions=True)
        with pytest.raises(TypeError, match="integer doc ids"):
            phrase_search(d, ["quick", "brown"])
