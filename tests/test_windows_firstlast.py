"""first_last_grouped / cohort_retention: DuckDB parity incl. NULL keys,
short partitions, and period-boundary timestamps."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.windows import cohort_retention, first_last_grouped


class TestFirstLastGrouped:
    def _check(self, df: pd.DataFrame, nth: int = 2):
        out = first_last_grouped(
            rd.from_pandas(df), "k", ["o", "rid"], "v", nth=nth
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        orc = con.sql(f"""
            WITH r AS (
                SELECT k, v,
                       row_number() OVER (PARTITION BY k ORDER BY o, rid) AS rn,
                       count(*) OVER (PARTITION BY k) AS n
                FROM t)
            SELECT k, CAST(max(n) AS BIGINT) AS n_rows,
                   max(CASE WHEN rn = 1 THEN v END) AS first_v,
                   max(CASE WHEN rn = n THEN v END) AS last_v,
                   max(CASE WHEN rn = {nth} THEN v END) AS nth{nth}_v
            FROM r GROUP BY k
        """).df()
        a = out.sort_values("k", na_position="last", ignore_index=True)
        b = orc.sort_values("k", na_position="last", ignore_index=True)
        assert len(a) == len(b)
        for c in a.columns:
            av, bv = a[c].to_numpy(object), b[c].to_numpy(object)
            same = (av == bv) | (pd.isna(av.astype(object)) & pd.isna(bv.astype(object)))
            assert same.all(), (c, np.flatnonzero(~same)[:5])

    def test_random_with_ties(self):
        rng = np.random.RandomState(11)
        n = 2500
        df = pd.DataFrame({
            "rid": np.arange(n),
            "k": rng.randint(0, 60, n).astype(np.int64),
            "o": rng.randint(0, 9, n).astype(np.int64),  # heavy order ties
            "v": rng.choice(list("abcdef"), n),
        })
        self._check(df)

    def test_singletons_get_null_nth(self):
        df = pd.DataFrame({"rid": [0, 1, 2], "k": [1, 2, 2],
                           "o": [5, 1, 0], "v": ["x", "y", "z"]})
        out = first_last_grouped(
            rd.from_pandas(df), "k", ["o", "rid"], "v", nth=2
        ).to_pandas().set_index("k")
        assert out.loc[1, "first_v"] == "x" and pd.isna(out.loc[1, "nth2_v"])
        assert out.loc[2, "first_v"] == "z" and out.loc[2, "nth2_v"] == "y"

    def test_null_keys_group_together(self):
        df = pd.DataFrame({
            "rid": np.arange(6),
            "k": [1.0, np.nan, 1.0, np.nan, 2.0, np.nan],
            "o": [3, 2, 1, 1, 0, 3],
            "v": list("abcdef"),
        })
        out = first_last_grouped(
            rd.from_pandas(df), "k", ["o", "rid"], "v", nth=2
        ).to_pandas()
        nullrow = out[out["k"].isna()]
        assert len(nullrow) == 1
        assert nullrow["n_rows"].iloc[0] == 3
        assert nullrow["first_v"].iloc[0] == "d"  # (o=1, rid=3)
        assert nullrow["last_v"].iloc[0] == "f"   # (o=3, rid=5)

    def test_nth_one_equals_first(self):
        rng = np.random.RandomState(5)
        n = 300
        df = pd.DataFrame({
            "rid": np.arange(n),
            "k": rng.randint(0, 20, n).astype(np.int64),
            "o": rng.randint(0, 5, n).astype(np.int64),
            "v": rng.choice(list("pqr"), n),
        })
        out = first_last_grouped(
            rd.from_pandas(df), "k", ["o", "rid"], "v", nth=1
        ).to_pandas()
        assert (out["first_v"] == out["nth1_v"]).all()


class TestCohortRetention:
    def _oracle(self, df: pd.DataFrame, period_days: int = 7) -> pd.DataFrame:
        con = duckdb.connect()
        con.register("t", df)
        pus = period_days * 86_400_000_000
        return con.sql(f"""
            WITH per AS (
                SELECT u, (epoch_us(ts) - 345600000000) // {pus} AS p FROM t),
            coh AS (SELECT u, min(p) AS cohort FROM per GROUP BY 1)
            SELECT c.cohort AS cohort_period, per.p - c.cohort AS period_offset,
                   count(DISTINCT per.u) AS n_users
            FROM per JOIN coh c USING (u) GROUP BY 1, 2
        """).df()

    def _check(self, df: pd.DataFrame, period_days: int = 7):
        out = cohort_retention(rd.from_pandas(df), "u", "ts",
                               period_days=period_days)
        orc = self._oracle(df, period_days)
        key = ["cohort_period", "period_offset"]
        a = out.sort_values(key, ignore_index=True)
        b = orc.sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(
            a.astype(np.int64), b.astype(np.int64))

    def test_random_weeks(self):
        rng = np.random.RandomState(3)
        n = 4000
        base = np.datetime64("2024-01-01T00:00:00", "us")
        ts = base + rng.randint(0, 90 * 86_400_000_000, n).astype("timedelta64[us]")
        df = pd.DataFrame({"u": rng.randint(0, 120, n).astype(np.int64),
                           "ts": ts.astype("datetime64[us]")})
        self._check(df)

    def test_monday_boundary(self):
        # 2024-01-01 is a Monday: events at 23:59:59.999999 Sunday and
        # 00:00:00 Monday must land in adjacent weeks
        ts = pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-07 23:59:59.999999",
            "2024-01-08 00:00:00",
        ], format="ISO8601").astype("datetime64[us]")
        df = pd.DataFrame({"u": [1, 1, 1], "ts": ts})
        out = cohort_retention(rd.from_pandas(df), "u", "ts")
        out = out.sort_values("period_offset", ignore_index=True)
        assert list(out["period_offset"]) == [0, 1]
        assert list(out["n_users"]) == [1, 1]

    def test_daily_periods(self):
        rng = np.random.RandomState(9)
        n = 1500
        base = np.datetime64("2024-03-05T12:00:00", "us")
        ts = base + rng.randint(0, 20 * 86_400_000_000, n).astype("timedelta64[us]")
        df = pd.DataFrame({"u": rng.randint(0, 40, n).astype(np.int64),
                           "ts": ts.astype("datetime64[us]")})
        self._check(df, period_days=1)
