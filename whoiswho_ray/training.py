"""Learned pairwise scorer — the T6 / trainer-surface analog.

The reference trains GBDT cells over pairwise features and thresholds the
ensemble score (``/root/reference/whoiswho/loadmodel/
ClassficationModels.py:151-331``, ``AutoTrainRND.py:52-71``); its SND
trainer exposes hand weights instead (``AutoTrainSND.py:50-52``). This
module closes the loop between the two: a deterministic numpy logistic
regression is fitted on labeled pairs over the engine's five pair features
(token Jaccard, repo/context tanimoto, TF-IDF cosine, Jaro-Winkler), and —
because the engine's blended score is *linear* in those features — the
learned coefficients drop straight back into ``SNDConfig`` as weights with
probability-calibrated thresholds. Training happens on the driver (labeled
pairs are small); scoring stays in the distributed kernel unchanged.
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.config import SNDConfig

FEATURES = ["j_tok", "t_repo", "t_ctx", "cos", "jw"]


def pair_features(
    records: "rd.Dataset",
    labeled_pairs: pd.DataFrame,
    cfg: SNDConfig | None = None,
) -> pd.DataFrame:
    """Feature rows for the labeled pairs: run the normal candidate
    pipeline (normalize → idf → vectorize → pair scoring WITHOUT
    thresholds) and inner-join the labels. Pairs the blocker never
    generates keep their label with zero features (they would never be
    scored at inference either — the trainer must see that regime)."""
    from whoiswho_ray.stages.idf import build_idf
    from whoiswho_ray.stages.normalize import normalize_records
    from whoiswho_ray.stages.pairs import generate_pairs
    from whoiswho_ray.stages.scoring import PairScorer, vectorize

    cfg = cfg or SNDConfig()
    norm = normalize_records(records, cfg).materialize()
    idf = build_idf(norm, cfg)
    vec = vectorize(norm, idf, cfg)
    scored = generate_pairs(vec, cfg).map_batches(
        PairScorer, fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=cfg.score_batch_size, concurrency=(1, cfg.score_concurrency),
    ).to_pandas()
    # canonical orientation for the join
    a = np.minimum(scored["id_a"], scored["id_b"])
    b = np.maximum(scored["id_a"], scored["id_b"])
    scored = scored.assign(record_id_a=a, record_id_b=b)
    out = labeled_pairs.merge(
        scored[["record_id_a", "record_id_b", *FEATURES]],
        on=["record_id_a", "record_id_b"], how="left",
    )
    out[FEATURES] = out[FEATURES].fillna(0.0)
    return out


def fit_logistic(
    X: np.ndarray,
    y: np.ndarray,
    l2: float = 1e-3,
    lr: float = 0.5,
    iters: int = 500,
    seed: int = 42,
) -> tuple[np.ndarray, float]:
    """Deterministic full-batch gradient-descent logistic regression.
    Returns (weights, bias)."""
    rng = np.random.RandomState(seed)
    n, d = X.shape
    w = rng.randn(d) * 0.01
    b = 0.0
    yf = y.astype(np.float64)
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = p - yf
        gw = X.T @ g / n + l2 * w
        gb = float(g.mean())
        w -= lr * gw
        b -= lr * gb
    return w, b


def config_from_model(
    w: np.ndarray,
    b: float,
    base: SNDConfig | None = None,
    p_edge: float = 0.9,
    p_attach: float = 0.7,
) -> SNDConfig:
    """Learned coefficients → SNDConfig: the engine's blended score is
    w·features, so a probability threshold p maps to the linear threshold
    logit(p) − b. Weights are used as-is (sign and scale carry the model)."""
    base = base or SNDConfig()

    def logit(p: float) -> float:
        return float(np.log(p / (1 - p)))

    return replace(
        base,
        w_tokens=float(w[0]), w_repo=float(w[1]), w_ctx=float(w[2]),
        w_tfidf=float(w[3]), w_name=float(w[4]),
        tau_edge=logit(p_edge) - b,
        tau_attach=logit(p_attach) - b,
    )


def fit_snd_config(
    records: "rd.Dataset",
    labeled_pairs: pd.DataFrame,
    base: SNDConfig | None = None,
    p_edge: float = 0.9,
    p_attach: float = 0.7,
) -> tuple[SNDConfig, dict]:
    """End-to-end trainer (the ``SNDTrainer.fit`` analog): labeled pairs →
    fitted weights/thresholds + training diagnostics (AUC, accuracy)."""
    base = base or SNDConfig()
    feats = pair_features(records, labeled_pairs, base)
    X = feats[FEATURES].to_numpy(dtype=np.float64)
    y = feats["same_entity"].to_numpy(dtype=bool)
    w, b = fit_logistic(X, y, seed=base.seed)
    z = X @ w + b
    p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
    order = np.argsort(p, kind="stable")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, p.size + 1)
    n_pos = int(y.sum())
    n_neg = int((~y).sum())
    auc = (ranks[y].sum() - n_pos * (n_pos + 1) / 2) / max(n_pos * n_neg, 1)
    diag = {
        "auc": float(auc),
        "accuracy": float(((p >= 0.5) == y).mean()),
        "n_pairs": int(len(y)),
        "n_pos": n_pos,
        "weights": w.tolist(),
        "bias": float(b),
    }
    return config_from_model(w, b, base, p_edge, p_attach), diag
