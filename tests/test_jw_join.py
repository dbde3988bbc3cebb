"""jw_name_join: DuckDB parity (bit-exact jaro_winkler_similarity),
blocking semantics, multiplicities, and the fixture threshold margin."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.functions.similarity import jaro_winkler
from whoiswho_ray.stages.editjoin import jw_name_join


def _oracle(df: pd.DataFrame, tau: float) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.sql(f"""
        WITH names AS (SELECT n, count(*) AS c FROM t GROUP BY 1)
        SELECT a.n AS name_a, b.n AS name_b,
               jaro_winkler_similarity(a.n, b.n) AS jw,
               a.c AS n_a, b.c AS n_b
        FROM names a JOIN names b
          ON split_part(a.n, ' ', 1) = split_part(b.n, ' ', 1) AND a.n < b.n
        WHERE jaro_winkler_similarity(a.n, b.n) >= {tau!r}
    """).df()


def _check(df: pd.DataFrame, tau: float):
    out = jw_name_join(rd.from_pandas(df), "n", tau=tau).to_pandas()
    orc = _oracle(df, tau)
    key = ["name_a", "name_b"]
    a = out.sort_values(key, ignore_index=True)
    b = orc.sort_values(key, ignore_index=True)
    assert len(a) == len(b)
    for c in ["name_a", "name_b", "n_a", "n_b"]:
        assert (a[c].to_numpy(object) == b[c].to_numpy(object)).all(), c
    assert (a["jw"].to_numpy() == b["jw"].to_numpy()).all()  # bit-exact


class TestJwNameJoin:
    def test_synthetic_typos(self):
        rng = np.random.RandomState(6)
        base = ["small ring", "small rings", "smal ring", "red widget",
                "red widgett", "blue bolt", "blue blot", "hot gear",
                "hot gears", "hot bear"]
        rows = rng.choice(base, 500)
        _check(pd.DataFrame({"n": rows}), tau=0.9)

    def test_blocking_excludes_cross_token(self):
        # 'red widget' vs 'ted widget' is a high-JW pair but different
        # first tokens: blocking must exclude it in BOTH engines
        df = pd.DataFrame({"n": ["red widget", "ted widget",
                                 "red widgets"] * 3})
        out = jw_name_join(rd.from_pandas(df), "n", tau=0.8).to_pandas()
        assert set(zip(out["name_a"], out["name_b"])) == {
            ("red widget", "red widgets")}
        assert (out["n_a"] == 3).all() and (out["n_b"] == 3).all()
        _check(df, tau=0.8)

    def test_duckdb_bit_parity_on_fixture_names(self):
        con = duckdb.connect()
        names = con.execute(
            "SELECT DISTINCT p_name FROM '/root/testdata/sf0.001/part.parquet'"
        ).df()["p_name"].tolist()
        for i in range(0, len(names), 3):
            for j in range(i + 1, min(i + 6, len(names))):
                d = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                                [names[i], names[j]]).fetchone()[0]
                assert d == jaro_winkler(names[i], names[j])

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_fixture_threshold_margin(self, sf):
        # τ=0.875 must sit in a real score gap so the float >= compare
        # can never flip between engines
        con = duckdb.connect()
        m = con.execute(f"""
            WITH names AS (SELECT p_name AS n FROM
                '/root/testdata/{sf}/part.parquet' GROUP BY 1)
            SELECT min(abs(jaro_winkler_similarity(a.n, b.n) - 0.875))
            FROM names a JOIN names b
              ON split_part(a.n, ' ', 1) = split_part(b.n, ' ', 1)
             AND a.n < b.n
        """).fetchone()[0]
        assert m > 1e-6
