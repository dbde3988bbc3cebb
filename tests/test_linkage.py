"""Fellegi–Sunter EM linkage: brute per-pair EM parity, planted-truth
recovery, partition invariance (pattern counts are exact ints), and
input validation."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.stages.linkage import (
    em_fit,
    fs_classify,
    fs_em,
    pattern_counts,
)

FEATS = ["f0", "f1", "f2"]


def _brute_em(df: pd.DataFrame, n_iters=100, init_m=0.9, init_u=0.1,
              init_p=0.1, eps=1e-6):
    """Per-PAIR EM (no pattern grouping) — the independent reference."""
    gam = df[FEATS].to_numpy(np.float64)
    n, k = gam.shape
    m = np.full(k, init_m)
    u = np.full(k, init_u)
    p = init_p
    for _ in range(n_iters):
        pm = p * np.prod(np.where(gam == 1, m, 1 - m), axis=1)
        pu = (1 - p) * np.prod(np.where(gam == 1, u, 1 - u), axis=1)
        g = pm / (pm + pu)
        m = np.clip((gam * g[:, None]).sum(0) / max(g.sum(), eps),
                    eps, 1 - eps)
        u = np.clip((gam * (1 - g)[:, None]).sum(0)
                    / max((1 - g).sum(), eps), eps, 1 - eps)
        p = float(np.clip(g.sum() / n, eps, 1 - eps))
    return m, u, p


def _planted(rng, n=5000, p=0.2,
             m=(0.9, 0.8, 0.7), u=(0.1, 0.2, 0.3)):
    is_m = rng.random(n) < p
    cols = {}
    for k in range(3):
        pk = np.where(is_m, m[k], u[k])
        cols[FEATS[k]] = (rng.random(n) < pk).astype(np.int64)
    df = pd.DataFrame(cols)
    df["key_a"] = np.arange(n, dtype=np.int64)
    df["key_b"] = np.arange(n, dtype=np.int64) + n
    return df, is_m


class TestEmFit:
    def test_matches_brute_per_pair_em(self, ray_session):
        rng = np.random.default_rng(11)
        df, _ = _planted(rng, n=2000)
        params = fs_em(rd.from_pandas(df).repartition(7), FEATS,
                       n_iters=60)
        bm, bu, bp = _brute_em(df, n_iters=60)
        np.testing.assert_allclose(params["m"], bm, atol=1e-8)
        np.testing.assert_allclose(params["u"], bu, atol=1e-8)
        assert abs(params["p"] - bp) < 1e-8

    def test_recovers_planted_truth(self, ray_session):
        rng = np.random.default_rng(3)
        df, is_m = _planted(rng, n=20000, p=0.25)
        ds = rd.from_pandas(df).repartition(9)
        params = fs_em(ds, FEATS, n_iters=200)
        np.testing.assert_allclose(params["m"], [0.9, 0.8, 0.7],
                                   atol=0.05)
        np.testing.assert_allclose(params["u"], [0.1, 0.2, 0.3],
                                   atol=0.05)
        assert abs(params["p"] - 0.25) < 0.05
        out = fs_classify(ds, FEATS, params).to_pandas()
        # posterior-0.5 classification beats 85% accuracy on this
        # well-separated fixture (Bayes error keeps it below 100%)
        acc = (out.sort_values("key_a")["match"].to_numpy()
               == is_m.astype(np.int64)).mean()
        assert acc > 0.85, acc
        # weight is monotone in the posterior (same likelihood ratio)
        o = out.sort_values("weight")
        assert (np.diff(o["posterior"].to_numpy()) >= -1e-12).all()

    def test_partition_invariant_exact(self, ray_session):
        rng = np.random.default_rng(5)
        df, _ = _planted(rng, n=3000)
        a = fs_em(rd.from_pandas(df).repartition(2), FEATS)
        b = fs_em(rd.from_pandas(df).repartition(31), FEATS)
        assert (a["counts"] == b["counts"]).all()
        np.testing.assert_array_equal(a["posterior"], b["posterior"])
        np.testing.assert_array_equal(a["weight"], b["weight"])

    def test_validation(self, ray_session):
        df = pd.DataFrame({"f0": [2], "f1": [0], "f2": [1]})
        with pytest.raises(Exception):
            pattern_counts(rd.from_pandas(df), FEATS)
        with pytest.raises(ValueError):
            em_fit(np.zeros(8, np.int64), 3)  # no pairs
        with pytest.raises(ValueError):
            em_fit(np.zeros(4, np.int64), 3)  # wrong table size
