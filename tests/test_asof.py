"""As-of join and range-interval aggregate join (stages/asof.py).

Semantics mirrored from published time-ordered-join behavior (pandas
merge_asof / DuckDB ASOF JOIN); the reference's year-proximity candidate
filtering (`adhoc_features.py`) is the capability these operators
generalize. Each test checks against an independent brute-force result.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.stages.asof import asof_join, range_agg_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(11)
    n_l, n_r, n_keys = 400, 300, 12
    left = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.randint(0, n_keys, n_l),
        "t": pd.Timestamp("2024-01-01")
             + pd.to_timedelta(rng.randint(0, 10_000, n_l), unit="min"),
    })
    right = pd.DataFrame({
        "rk": rng.randint(0, n_keys + 2, n_r),   # some keys never match
        "rt": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(-500, 9_000, n_r), unit="min"),
        "rid": np.arange(n_r),
        "val": rng.uniform(0, 100, n_r).round(2),
    })
    # plant (key, time) ties so the tie-break path is exercised
    right.loc[5, ["rk", "rt"]] = right.loc[4, ["rk", "rt"]].values
    right.loc[77, ["rk", "rt"]] = right.loc[76, ["rk", "rt"]].values
    return left, right


def _brute_asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, l in left.iterrows():
        cand = right[(right.rk == l.k) & (right.rt <= l.t)]
        if not len(cand):
            continue
        best = cand[cand.rt == cand.rt.max()].sort_values("rid").iloc[-1]
        rows.append({"lid": l.lid, "k": l.k, "t": l.t,
                     "rt": best.rt, "rid": best.rid, "val": best.val})
    return pd.DataFrame(rows)


def test_asof_join_matches_brute(frames):
    left, right = frames
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by=("k", "rk"), left_on="t", right_on="rt",
        right_cols=["rid", "val"], tie_break="rid", num_buckets=8,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    exp = _brute_asof(left, right).sort_values("lid").reset_index(drop=True)
    assert len(out) == len(exp) and len(out) < len(left)  # inner drops some
    pd.testing.assert_frame_equal(
        out[["lid", "rid", "val", "rt"]], exp[["lid", "rid", "val", "rt"]],
        check_dtype=False)


def test_asof_join_int_dtypes_restored(frames):
    left, right = frames
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by=("k", "rk"), left_on="t", right_on="rt",
        right_cols=["rid"], tie_break="rid", num_buckets=4,
    ).to_pandas()
    assert out["rid"].dtype == np.int64  # no NaN-float leak from the merge


def test_range_agg_join_matches_brute(frames):
    left, right = frames
    w = pd.Timedelta(hours=8)
    out = range_agg_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by=("k", "rk"), left_on="t", right_on="rt",
        value_col="val", window=w, num_buckets=8,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    assert len(out) == len(left)  # left join: every left row kept
    exp_n, exp_s = [], []
    for _, l in left.iterrows():
        m = right[(right.rk == l.k) & (right.rt <= l.t) & (right.rt > l.t - w)]
        exp_n.append(len(m))
        exp_s.append(int(np.floor(m.val.to_numpy() * 100.0 + 0.5).astype(np.int64).sum()))
    exp = left.sort_values("lid").reset_index(drop=True)
    np.testing.assert_array_equal(out["n_right"].to_numpy(),
                                  np.asarray(exp_n)[exp.index])
    np.testing.assert_array_equal(out["sum_cents"].to_numpy(),
                                  np.asarray(exp_s)[exp.index])


def test_range_agg_join_boundary_semantics():
    """Interval is (t - w, t]: the exact lower bound is OUT, the exact
    upper bound (same timestamp) is IN."""
    t0 = pd.Timestamp("2024-06-01 12:00:00")
    left = pd.DataFrame({"lid": [0], "k": [1], "t": [t0]})
    right = pd.DataFrame({
        "rk": [1, 1, 1, 1],
        "rt": [t0, t0 - pd.Timedelta(hours=1),          # in, in
               t0 - pd.Timedelta(hours=2),              # exact lower bound: out
               t0 + pd.Timedelta(seconds=1)],           # future: out
        "val": [1.0, 1.0, 1.0, 1.0],
    })
    out = range_agg_join(
        rd.from_pandas(left), rd.from_pandas(right), by=("k", "rk"),
        left_on="t", right_on="rt", value_col="val",
        window=pd.Timedelta(hours=2), num_buckets=2,
    ).to_pandas()
    assert out["n_right"].tolist() == [2]
    assert out["sum_cents"].tolist() == [200]


def test_asof_join_preserves_int64_above_2_53():
    """ADVICE r2: NaN padding across the shuffle used to promote int64 to
    float64 and corrupt values above 2^53; the typed-null Arrow union +
    positional-index merge must return them bit-exact."""
    big = np.array([9007199254740993, 9007199254740995], dtype=np.int64)
    left = pd.DataFrame({
        "k": [1, 1, 2],
        "t": pd.to_datetime(["2024-01-02", "2024-01-03", "2024-01-02"]),
    })
    right = pd.DataFrame({
        "k": [1, 1],
        "rt": pd.to_datetime(["2024-01-01", "2024-01-02 12:00"],
                             format="mixed"),
        "event_id": big,
    })
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), by="k",
        left_on="t", right_on="rt", num_buckets=4,
    ).to_pandas().sort_values("t").reset_index(drop=True)
    # k=2 has no match (inner drops it); k=1 rows match big[0] then big[1]
    assert out["event_id"].dtype == np.int64
    assert out["event_id"].tolist() == [big[0], big[1]]


def test_shuffle_semi_join_preserves_int64_above_2_53():
    from whoiswho_ray.stages.joins import shuffle_semi_join

    big = np.int64(9007199254740993)
    left = pd.DataFrame({"k": [1, 2], "payload": [big, big + 2]})
    keys = pd.DataFrame({"k": [1]})
    out = shuffle_semi_join(rd.from_pandas(left), rd.from_pandas(keys),
                            on="k").to_pandas()
    assert out["payload"].dtype == np.int64
    assert out["payload"].tolist() == [big]


def test_asof_join_rejects_overlapping_payload_columns():
    left = pd.DataFrame({"k": [1], "t": pd.to_datetime(["2024-01-01"]),
                         "val": [1.0]})
    right = pd.DataFrame({"k": [1], "rt": pd.to_datetime(["2024-01-01"]),
                          "val": [2.0]})
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_pandas(left), rd.from_pandas(right), by="k",
                  left_on="t", right_on="rt")


def test_asof_join_tie_break_outside_right_cols(frames):
    """tie_break need not be listed in right_cols (ADVICE r2: this used to
    KeyError); dedup consults it either way."""
    left, right = frames
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by=("k", "rk"), left_on="t", right_on="rt",
        right_cols=["val"], tie_break="rid", num_buckets=4,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    exp = _brute_asof(left, right).sort_values("lid").reset_index(drop=True)
    assert "rid" not in out.columns
    pd.testing.assert_frame_equal(out[["lid", "val"]], exp[["lid", "val"]],
                                  check_dtype=False)
