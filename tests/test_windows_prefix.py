"""Round-4 second-half operators: the distributed prefix-sum primitive
(with_running_total), sequence packing (pack_documents), the lag / moving
window functions, and the bottom-k quantile sketch."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.stages.agg import exact_quantiles, with_running_total


@pytest.fixture(scope="module")
def events():
    rng = np.random.RandomState(7)
    n = 4000
    return pd.DataFrame({
        "user_id": rng.randint(0, 40, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "value": rng.rand(n) * 100.0,
    })


class TestRunningTotal:
    def test_exclusive_matches_numpy(self):
        df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                           "w": np.arange(1000, dtype=np.int64) % 7})
        s = rd.from_pandas(df).repartition(9).sort("k").materialize()
        out = with_running_total(s, "w").to_pandas().sort_values("k")
        exp = np.cumsum(df["w"].to_numpy()) - df["w"].to_numpy()
        np.testing.assert_array_equal(out["cum_before"].to_numpy(), exp)

    def test_inclusive_and_single_block(self):
        df = pd.DataFrame({"k": [3, 1, 2], "w": [10, 20, 30]})
        s = rd.from_pandas(df).sort("k").materialize()
        out = with_running_total(s, "w", "run", inclusive=True).to_pandas()
        assert out.sort_values("k")["run"].tolist() == [20, 50, 60]


class TestPackDocuments:
    def test_matches_pandas_reference(self):
        texts = ["a b c", "", "   ", "one", "w " * 50, "x y", None,
                 "q r s t u"] * 25
        df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                           "text": texts})
        from whoiswho_ray.stages.text_analysis import pack_documents

        budget = 16
        out = (pack_documents(rd.from_pandas(df).repartition(5), budget)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))

        n_tok = df["text"].fillna("").str.split().str.len().to_numpy(np.int64)
        cum = np.cumsum(n_tok) - n_tok
        exp_first = cum // budget
        exp_last = np.where(n_tok > 0, (cum + n_tok - 1) // budget, exp_first)
        np.testing.assert_array_equal(out["n_tokens"], n_tok)
        np.testing.assert_array_equal(out["pack_id"], exp_first)
        np.testing.assert_array_equal(out["pack_offset"], cum % budget)
        np.testing.assert_array_equal(out["pack_id_last"], exp_last)
        # packing density: every window before the last is exactly full
        assert (cum + n_tok)[-1] // budget == out["pack_id_last"].max()

    def test_straddle_flagged(self):
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "d e f"]})
        from whoiswho_ray.stages.text_analysis import pack_documents

        out = (pack_documents(rd.from_pandas(df), budget=4)
               .to_pandas().sort_values("doc_id"))
        # doc 2 starts at offset 3 of pack 0 and ends inside pack 1
        assert out["pack_id"].tolist() == [0, 0]
        assert out["pack_offset"].tolist() == [0, 3]
        assert out["pack_id_last"].tolist() == [0, 1]


class TestLagMoving:
    def test_lag_delta_matches_pandas(self, events):
        from whoiswho_ray.stages.windows import lag_delta

        out = (lag_delta(rd.from_pandas(events).repartition(6))
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        g = events.sort_values(["user_id", "ts", "event_id"],
                               kind="stable").copy()
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        g["ts_us"] = ts_us
        g["delta_us"] = g.groupby("user_id")["ts_us"].diff()
        exp = g.dropna(subset=["delta_us"]).sort_values("event_id")
        np.testing.assert_array_equal(out["event_id"], exp["event_id"])
        np.testing.assert_array_equal(
            out["delta_us"], exp["delta_us"].astype(np.int64))

    def test_moving_sum_matches_pandas(self, events):
        from whoiswho_ray.stages.windows import moving_sum

        out = (moving_sum(rd.from_pandas(events).repartition(6), window=3)
               .to_pandas().sort_values("event_id").reset_index(drop=True))
        g = events.sort_values(["user_id", "ts", "event_id"],
                               kind="stable").copy()
        g["cents"] = np.floor(g["value"].to_numpy() * 100.0 + 0.5
                              ).astype(np.int64)
        g["ms"] = (g.groupby("user_id")["cents"]
                   .rolling(3, min_periods=1).sum()
                   .reset_index(level=0, drop=True))
        exp = g.sort_values("event_id")
        np.testing.assert_array_equal(
            out["moving_sum_cents"], exp["ms"].astype(np.int64))


class TestQuantileSketch:
    def test_sharding_invariant_and_matches_replay(self):
        from whoiswho_ray.stages.sketch import quantile_sketch

        rng = np.random.RandomState(3)
        df = pd.DataFrame({"id": np.arange(20000, dtype=np.int64),
                           "v": rng.randn(20000)})
        qs = [0.1, 0.5, 0.9]
        a = quantile_sketch(rd.from_pandas(df).repartition(3), "id", "v",
                            qs, m=512)
        b = quantile_sketch(rd.from_pandas(df).repartition(17), "id", "v",
                            qs, m=512)
        pd.testing.assert_frame_equal(a, b)

        # driver-side replay: the m smallest md5('42|id') rows
        h = df["id"].map(lambda k: hashlib.md5(f"42|{k}".encode()).hexdigest())
        sample = np.sort(df.loc[h.sort_values().index[:512], "v"].to_numpy())
        for q, v in zip(a["q"], a["value"]):
            assert v == sample[max(0, math.ceil(q * 512) - 1)]

    def test_error_bound_vs_exact(self):
        from whoiswho_ray.stages.sketch import quantile_sketch

        rng = np.random.RandomState(11)
        df = pd.DataFrame({"id": np.arange(50000, dtype=np.int64),
                           "v": rng.randn(50000)})
        ds = rd.from_pandas(df).repartition(8)
        approx = quantile_sketch(ds, "id", "v", [0.5, 0.9], m=4096)
        exact = exact_quantiles(ds, "v", [0.5, 0.9])
        # quantile RANK error ~ O(1/sqrt(m)); check the value error via the
        # empirical CDF: the approx value's true rank within 3/sqrt(m)
        v_sorted = np.sort(df["v"].to_numpy())
        for q, av in zip(approx["q"], approx["value"]):
            true_rank = np.searchsorted(v_sorted, av) / len(v_sorted)
            assert abs(true_rank - q) < 3.0 / math.sqrt(4096)
        assert list(exact["q"]) == [0.5, 0.9]

    def test_nulls_dropped_and_empty(self):
        from whoiswho_ray.stages.sketch import quantile_sketch

        df = pd.DataFrame({"id": [1, 2, 3, 4],
                           "v": [1.0, np.nan, 3.0, np.nan]})
        out = quantile_sketch(rd.from_pandas(df), "id", "v", [0.5], m=16)
        assert out["value"].iloc[0] in (1.0, 3.0)
        empty = quantile_sketch(
            rd.from_pandas(pd.DataFrame({"id": [1], "v": [np.nan]})),
            "id", "v", [0.5], m=16)
        assert np.isnan(empty["value"].iloc[0])
