"""snapshot_diff: DuckDB FULL JOIN parity incl. NULL payloads
(IS DISTINCT FROM — NULL==NULL is unchanged), identical snapshots,
and one-side-empty snapshots."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.diff import snapshot_diff


def _oracle(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("a", a)
    con.register("b", b)
    return con.sql("""
        SELECT coalesce(a.k, b.k) AS k,
               CASE WHEN a.k IS NULL THEN 'added'
                    WHEN b.k IS NULL THEN 'removed'
                    ELSE 'changed' END AS change_type,
               a.v AS old_v, b.v AS new_v,
               a.s AS old_s, b.s AS new_s
        FROM a FULL JOIN b ON a.k = b.k
        WHERE a.k IS NULL OR b.k IS NULL
           OR a.v IS DISTINCT FROM b.v OR a.s IS DISTINCT FROM b.s
    """).df()


def _check(a: pd.DataFrame, b: pd.DataFrame):
    out = snapshot_diff(rd.from_pandas(a), rd.from_pandas(b),
                        "k", ["v", "s"]).to_pandas()
    orc = _oracle(a, b)
    out = out[sorted(out.columns)].sort_values(sorted(out.columns),
                                               ignore_index=True)
    orc = orc[sorted(orc.columns)].sort_values(sorted(orc.columns),
                                               ignore_index=True)
    assert len(out) == len(orc), (len(out), len(orc))
    for c in out.columns:
        av, bv = out[c].to_numpy(object), orc[c].to_numpy(object)
        same = (av == bv) | (pd.isna(av.astype(object)) & pd.isna(bv.astype(object)))
        assert same.all(), (c, np.flatnonzero(~same)[:5])


class TestSnapshotDiff:
    def test_random_parity_with_nulls(self):
        rng = np.random.default_rng(23)

        def snap(keys):
            n = len(keys)
            v = rng.integers(0, 5, n).astype(object)
            v[rng.random(n) < 0.15] = None
            s = rng.choice(["x", "y"], n).astype(object)
            s[rng.random(n) < 0.1] = None
            return pd.DataFrame({"k": keys,
                                 "v": pd.array([None if x is None else int(x)
                                                for x in v], dtype="Int64"),
                                 "s": s})

        all_keys = np.arange(400, dtype=np.int64)
        a = snap(all_keys[rng.random(400) < 0.8])
        b = snap(all_keys[rng.random(400) < 0.8])
        _check(a, b)

    def test_identical_snapshots_empty_diff(self):
        a = pd.DataFrame({"k": [1, 2], "v": pd.array([1, None], dtype="Int64"),
                          "s": ["x", None]})
        out = snapshot_diff(rd.from_pandas(a), rd.from_pandas(a.copy()),
                            "k", ["v", "s"]).to_pandas()
        assert len(out) == 0  # NULL == NULL is unchanged

    def test_one_side_empty(self):
        a = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                          "v": pd.array([], dtype="Int64"),
                          "s": pd.Series([], dtype=object)})
        b = pd.DataFrame({"k": [7], "v": pd.array([9], dtype="Int64"),
                          "s": ["z"]})
        out = snapshot_diff(rd.from_pandas(a), rd.from_pandas(b),
                            "k", ["v", "s"]).to_pandas()
        assert out["change_type"].tolist() == ["added"]
        assert out["new_v"].tolist() == [9]
