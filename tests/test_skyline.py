"""skyline_2d: brute-force dominance parity incl. duplicates, ties on one
axis, all-dominated chains, and the already-a-front degenerate case."""

import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.joins import skyline_2d


def _brute(df: pd.DataFrame, mx: str, mn: str) -> pd.DataFrame:
    keep = []
    for i in range(len(df)):
        p, d = df[mx].iloc[i], df[mn].iloc[i]
        dom = ((df[mx] >= p) & (df[mn] <= d)
               & ((df[mx] > p) | (df[mn] < d))).any()
        if not dom:
            keep.append(i)
    return df.iloc[keep]


def _check(df: pd.DataFrame):
    out = skyline_2d(rd.from_pandas(df), "price", "date").to_pandas()
    exp = _brute(df, "price", "date")
    a = out.sort_values(["rid"], ignore_index=True)
    b = exp.sort_values(["rid"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b.reset_index(drop=True))


class TestSkyline2D:
    def test_random(self):
        rng = np.random.RandomState(1)
        n = 800
        df = pd.DataFrame({
            "rid": np.arange(n),
            "price": rng.randint(0, 200, n).astype(np.float64),
            "date": rng.randint(0, 200, n).astype(np.int64),
        })
        _check(df)

    def test_duplicates_all_survive(self):
        df = pd.DataFrame({
            "rid": [0, 1, 2, 3],
            "price": [10.0, 10.0, 5.0, 10.0],
            "date": [1, 1, 1, 2],
        })
        out = skyline_2d(rd.from_pandas(df), "price", "date").to_pandas()
        assert sorted(out["rid"]) == [0, 1]  # dup best point: both stay

    def test_already_a_front(self):
        n = 50
        df = pd.DataFrame({
            "rid": np.arange(n),
            "price": np.arange(n, dtype=np.float64),
            "date": np.arange(n, dtype=np.int64),
        })
        out = skyline_2d(rd.from_pandas(df), "price", "date").to_pandas()
        assert len(out) == n

    def test_single_winner_chain(self):
        n = 40
        df = pd.DataFrame({
            "rid": np.arange(n),
            "price": np.arange(n, dtype=np.float64),
            "date": -np.arange(n, dtype=np.int64),
        })
        out = skyline_2d(rd.from_pandas(df), "price", "date").to_pandas()
        assert list(out["rid"]) == [n - 1]

    def test_heavy_axis_ties(self):
        rng = np.random.RandomState(7)
        n = 600
        df = pd.DataFrame({
            "rid": np.arange(n),
            "price": rng.randint(0, 6, n).astype(np.float64),
            "date": rng.randint(0, 6, n).astype(np.int64),
        })
        _check(df)

    def test_int64_beyond_float53(self):
        # dominance on int64 values that collide when cast to float64
        base = np.int64(1) << 60
        df = pd.DataFrame({
            "rid": [0, 1],
            "price": np.array([base, base + 1], dtype=np.int64),
            "date": np.array([5, 5], dtype=np.int64),
        })
        out = skyline_2d(rd.from_pandas(df), "price", "date").to_pandas()
        assert list(out["rid"]) == [1]
