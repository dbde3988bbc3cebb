"""PERCENT_RANK / CUME_DIST: DuckDB parity incl. ties, NULL keys,
NULL order values, and single-row partitions."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.agg import rank_stats_grouped


def _run(df: pd.DataFrame) -> pd.DataFrame:
    out = rank_stats_grouped(rd.from_pandas(df), "k", "v").to_pandas()
    return out.sort_values(["rid"], ignore_index=True)


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    out = con.sql("""
        SELECT rid, k, v,
               percent_rank() OVER (PARTITION BY k ORDER BY v) AS pct_rank,
               cume_dist() OVER (PARTITION BY k ORDER BY v) AS cume_dist
        FROM t
    """).df()
    return out.sort_values(["rid"], ignore_index=True)


def _check(df: pd.DataFrame):
    mine, orc = _run(df), _oracle(df)
    assert len(mine) == len(orc)
    for c in ("pct_rank", "cume_dist"):
        a = mine[c].to_numpy()
        b = orc[c].to_numpy()
        assert (a == b).all(), (c, np.flatnonzero(a != b)[:5])


class TestRankStats:
    def test_random_with_ties(self):
        rng = np.random.RandomState(3)
        n = 2000
        df = pd.DataFrame({
            "rid": np.arange(n),
            "k": rng.randint(0, 40, n).astype(np.int64),
            "v": rng.randint(0, 12, n).astype(np.float64),  # heavy ties
        })
        _check(df)

    def test_null_keys_and_values(self):
        rng = np.random.RandomState(4)
        n = 600
        k = rng.randint(0, 10, n).astype(np.float64)
        k[rng.rand(n) < 0.15] = np.nan
        v = rng.randint(0, 6, n).astype(np.float64)
        v[rng.rand(n) < 0.15] = np.nan
        df = pd.DataFrame({"rid": np.arange(n), "k": k, "v": v})
        _check(df)

    def test_single_row_partitions(self):
        df = pd.DataFrame({"rid": [0, 1, 2], "k": [1, 2, 3],
                           "v": [5.0, 5.0, 7.0]})
        mine = _run(df)
        assert (mine["pct_rank"] == 0.0).all()
        assert (mine["cume_dist"] == 1.0).all()

    def test_all_tied_partition(self):
        df = pd.DataFrame({"rid": range(4), "k": [1] * 4, "v": [2.0] * 4})
        mine = _run(df)
        assert (mine["pct_rank"] == 0.0).all()
        assert (mine["cume_dist"] == 1.0).all()
