"""Fellegi–Sunter probabilistic record linkage with EM estimation.

The classic ER scorer (Fellegi & Sunter, JASA 1969; EM fitting per
Winkler 1988): candidate pairs carry K binary comparison features
(agreement vector γ); a two-class mixture — matches M with per-feature
agreement probabilities m_k, non-matches U with u_k, prior p = P(M) —
is fit by EM, and each pair gets the log-likelihood-ratio match weight
Σ_k [γ_k·log2(m_k/u_k) + (1−γ_k)·log2((1−m_k)/(1−u_k))] plus the
posterior P(M|γ).

Scale shape — the pattern-table trick that makes FS linkage run on
100 TB of pairs: with K binary features there are only 2^K distinct
agreement vectors, so ONE distributed pass packs each pair's features
into a pattern code and partial-counts patterns per batch (the
combiner); a tiny grouped combine leaves ≤ 2^K rows on the driver, and
EM iterates over THAT table in numpy — cost independent of pair count.
Classification is then a second streaming pass that looks each pair's
pattern up in the broadcast (2^K)-entry posterior/weight arrays. No
iteration ever touches the distributed data.

Determinism: pattern counts are exact int64; EM runs a fixed iteration
count from fixed inits on those ints — the fit is bit-reproducible and
partition-invariant. (Like the repo's other learned operators the
OUTPUT is floats from an iterative fit, so queries over it register as
rows-only; correctness is pinned by brute-parity and planted-recovery
tests instead of a SQL oracle.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _pattern_codes(df: pd.DataFrame, feature_cols: list[str]) -> np.ndarray:
    """Pack K binary feature columns into one int64 code (bit k =
    feature_cols[k]); values must be 0/1 (bool or int) — validated."""
    code = np.zeros(len(df), dtype=np.int64)
    for k, c in enumerate(feature_cols):
        v = df[c].to_numpy()
        if v.dtype == bool:
            v = v.astype(np.int64)
        else:
            v = np.asarray(v, dtype=np.int64)
            if len(v) and not np.isin(v, (0, 1)).all():
                raise ValueError(
                    f"fs_em feature {c!r} must be binary 0/1")
        code |= v << k
    return code


def pattern_counts(
    pairs: "ray.data.Dataset",
    feature_cols: list[str],
) -> np.ndarray:
    """One distributed pass: exact count of every agreement pattern.
    Returns a dense int64 array of length 2^K indexed by pattern code.
    Per-batch bincount partials (the combiner — at most 2^K tiny rows
    leave each batch), driver sum."""
    k = len(feature_cols)
    if not 1 <= k <= 20:
        raise ValueError(f"fs_em supports 1..20 binary features, got {k}")
    size = 1 << k

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(_pattern_codes(df, feature_cols), minlength=size)
        return pd.DataFrame({"pattern": np.arange(size, dtype=np.int64),
                             "cnt": c.astype(np.int64)})

    parts = pairs.map_batches(partial, batch_format="pandas",
                              batch_size=131072).to_pandas()
    counts = np.zeros(size, dtype=np.int64)
    if len(parts):
        np.add.at(counts, parts["pattern"].to_numpy(np.int64),
                  parts["cnt"].to_numpy(np.int64))
    return counts


def em_fit(
    counts: np.ndarray,
    n_features: int,
    n_iters: int = 100,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.1,
    eps: float = 1e-6,
) -> dict:
    """EM on the (≤ 2^K)-row pattern table — pure numpy, driver-side.
    Returns {m, u, p, posterior, weight}: per-feature m_k/u_k, the match
    prior, and per-PATTERN posterior P(M|γ) and log2 likelihood-ratio
    weight (arrays of length 2^K, indexed by pattern code). Probabilities
    are clipped to [eps, 1−eps] every step so degenerate features can't
    produce 0/0 or infinite weights."""
    size = 1 << n_features
    if counts.shape != (size,):
        raise ValueError("counts must have length 2^n_features")
    total = counts.sum()
    if total == 0:
        raise ValueError("em_fit needs at least one pair")
    # gamma[pattern, k] = bit k of the pattern code
    codes = np.arange(size, dtype=np.int64)
    gam = ((codes[:, None] >> np.arange(n_features)[None, :]) & 1
           ).astype(np.float64)
    m = np.full(n_features, float(init_m))
    u = np.full(n_features, float(init_u))
    p = float(init_p)
    c = counts.astype(np.float64)
    for _ in range(n_iters):
        log_pm = np.log(p) + gam @ np.log(m) + (1 - gam) @ np.log(1 - m)
        log_pu = (np.log1p(-p) + gam @ np.log(u)
                  + (1 - gam) @ np.log(1 - u))
        hi = np.maximum(log_pm, log_pu)
        pm = np.exp(log_pm - hi)
        pu = np.exp(log_pu - hi)
        g = pm / (pm + pu)
        cg = c * g
        cu = c * (1 - g)
        sm, su = cg.sum(), cu.sum()
        m = np.clip((gam.T @ cg) / max(sm, eps), eps, 1 - eps)
        u = np.clip((gam.T @ cu) / max(su, eps), eps, 1 - eps)
        p = float(np.clip(sm / total, eps, 1 - eps))
    log_pm = np.log(p) + gam @ np.log(m) + (1 - gam) @ np.log(1 - m)
    log_pu = np.log1p(-p) + gam @ np.log(u) + (1 - gam) @ np.log(1 - u)
    hi = np.maximum(log_pm, log_pu)
    posterior = np.exp(log_pm - hi) / (np.exp(log_pm - hi)
                                       + np.exp(log_pu - hi))
    weight = (gam @ np.log2(m / u)
              + (1 - gam) @ np.log2((1 - m) / (1 - u)))
    return {"m": m, "u": u, "p": p,
            "posterior": posterior, "weight": weight}


def fs_em(
    pairs: "ray.data.Dataset",
    feature_cols: list[str],
    n_iters: int = 100,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_p: float = 0.1,
) -> dict:
    """Fit the Fellegi–Sunter mixture on a Dataset of candidate pairs:
    one distributed pattern-count pass, then driver-side EM. Returns the
    :func:`em_fit` params dict plus ``counts``."""
    counts = pattern_counts(pairs, feature_cols)
    params = em_fit(counts, len(feature_cols), n_iters=n_iters,
                    init_m=init_m, init_u=init_u, init_p=init_p)
    params["counts"] = counts
    return params


def fs_classify(
    pairs: "ray.data.Dataset",
    feature_cols: list[str],
    params: dict,
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Attach ``posterior``, ``weight`` and ``match`` (int64 0/1,
    posterior ≥ threshold) to every pair — one streaming pass; the
    (2^K)-entry posterior/weight tables ride the task closure (tiny —
    they are broadcast once per worker by Ray's closure distribution,
    not re-shipped per batch)."""
    post = np.asarray(params["posterior"], dtype=np.float64)
    wt = np.asarray(params["weight"], dtype=np.float64)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        code = _pattern_codes(df, feature_cols)
        out = df.copy()
        out["posterior"] = post[code]
        out["weight"] = wt[code]
        out["match"] = (post[code] >= threshold).astype(np.int64)
        return out

    return pairs.map_batches(attach, batch_format="pandas",
                             batch_size=131072)
