"""Sorted-neighborhood blocking (stages/blocking.py) vs brute force."""
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.stages.blocking import (
    multipass_sorted_neighborhood,
    sorted_neighborhood_pairs,
)


def _brute(df: pd.DataFrame, keys, w, canon=False):
    b = df.sort_values(keys + ["id"], kind="stable")
    ids = b["id"].to_numpy()
    acc = []
    for d in range(1, w + 1):
        if len(ids) <= d:
            break
        a, bb = ids[:-d], ids[d:]
        if canon:
            a, bb = np.minimum(a, bb), np.maximum(a, bb)
        acc.append(pd.DataFrame({"id_a": a, "id_b": bb}))
    if not acc:
        return set()
    out = pd.concat(acc)
    return set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))


def _pairs(out: pd.DataFrame):
    return set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))


@pytest.fixture()
def skewed_df():
    rng = np.random.default_rng(11)
    n = 3000
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k1": rng.choice(["a", "a", "a", "b", "c"], n),  # heavy ties
        "k2": rng.integers(0, 20, n),
    })


def test_snb_matches_brute_force(ray_session, skewed_df):
    ds = rd.from_pandas(skewed_df).repartition(5)
    out = sorted_neighborhood_pairs(
        ds, ["k1", "k2"], "id", window=3, bucket_rows=256).to_pandas()
    exp = _brute(skewed_df, ["k1", "k2"], 3)
    assert _pairs(out) == exp
    assert len(out) == len(exp)  # exactly-once: no duplicate pairs


def test_snb_window_spans_bucket_boundary(ray_session):
    # bucket_rows barely above window forces every pair across a boundary
    df = pd.DataFrame({"id": np.arange(40, dtype=np.int64),
                       "k": np.zeros(40, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(4)
    out = sorted_neighborhood_pairs(
        ds, ["k"], "id", window=5, bucket_rows=6).to_pandas()
    assert _pairs(out) == _brute(df, ["k"], 5)


def test_snb_window_larger_than_input(ray_session):
    df = pd.DataFrame({"id": np.array([3, 1, 2], dtype=np.int64),
                       "k": ["x", "x", "x"]})
    out = sorted_neighborhood_pairs(
        rd.from_pandas(df), ["k"], "id", window=10, bucket_rows=64
    ).to_pandas()
    assert _pairs(out) == {(1, 2), (1, 3), (2, 3)}


def test_snb_rejects_bad_params(ray_session):
    df = pd.DataFrame({"id": [1], "k": ["a"]})
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(rd.from_pandas(df), ["k"], "id", window=0)
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(
            rd.from_pandas(df), ["k"], "id", window=8, bucket_rows=8)


def test_multipass_union_is_canonical_distinct(ray_session, skewed_df):
    ds = rd.from_pandas(skewed_df).repartition(5)
    out = multipass_sorted_neighborhood(
        ds, [["k1", "k2"], ["k2", "k1"]], "id", window=2,
        bucket_rows=256).to_pandas()
    exp = _brute(skewed_df, ["k1", "k2"], 2, canon=True) | _brute(
        skewed_df, ["k2", "k1"], 2, canon=True)
    assert _pairs(out) == exp
    assert len(out) == len(exp)  # distinct
    assert (out["id_a"] < out["id_b"]).all()
