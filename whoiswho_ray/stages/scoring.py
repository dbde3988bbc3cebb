"""Stateful scoring stages — actor pools over Arrow batches.

Two actor-pool ``map_batches`` stages, both following the reference's
"load state once per process, score per item" pattern
(``/root/reference/whoiswho/character/feature_process.py:28-44`` loads four
idf dicts in ``__loadEssential`` at construction):

* ``TfidfVectorizer`` — attaches each record's sparse unit-norm TF-IDF
  vector (the w2v-mean-embedding analog of ``semantic_features.py:43-135``;
  BASELINE.json's north star replaces w2v with TF-IDF cosine). The IdfModel
  is broadcast **once** via ``ray.put`` and fetched per actor in
  ``__init__`` — never re-shipped per batch.
* ``PairScorer`` — the 36-dim-hand-feature analog
  (``feature_process.py:242-350``) reduced to the score the SND trainer
  actually blends (``AutoTrainSND.py:142-161``): weighted sum of token
  Jaccard (coauthor analog, w=1.5), repo tanimoto (org, w=1.0), context
  tanimoto (venue, w=1.0), TF-IDF cosine (text), Jaro-Winkler on basenames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.functions.similarity import (
    cosine_sparse,
    jaccard_sorted,
    jaro_winkler,
)
from whoiswho_ray.stages.idf import IdfModel

EDGE_COLUMNS = ["block_key", "id_a", "id_b", "j_tok", "t_repo", "t_ctx", "cos", "jw", "score"]


class TfidfVectorizer:
    """Actor: adds ``tfv_ids`` (sorted in-vocab token ids) and ``tfv_w``
    (idf weights, L2-normalized) columns."""

    def __init__(self, idf_ref: "ray.ObjectRef | IdfModel"):
        self.idf: IdfModel = ray.get(idf_ref) if isinstance(idf_ref, ray.ObjectRef) else idf_ref

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids_out, w_out = [], []
        for toks in batch["tok_ids"]:
            tok = np.asarray(toks, dtype=np.int64)
            ids, w = self.idf.lookup(tok)
            norm = float(np.linalg.norm(w))
            if norm > 0:
                w = (w / norm).astype(np.float32)
            ids_out.append(ids)
            w_out.append(w)
        batch = batch.copy()
        batch["tfv_ids"] = ids_out
        batch["tfv_w"] = w_out
        return batch


def vectorize(
    normalized: "ray.data.Dataset",
    idf: IdfModel,
    cfg: SNDConfig | None = None,
) -> "ray.data.Dataset":
    cfg = cfg or SNDConfig()
    idf_ref = ray.put(idf)
    return normalized.map_batches(
        TfidfVectorizer,
        fn_constructor_kwargs={"idf_ref": idf_ref},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, cfg.score_concurrency),
    )


def score_pair_arrays(
    tok_a: np.ndarray, tok_b: np.ndarray,
    repo_a: np.ndarray, repo_b: np.ndarray,
    ctx_a: np.ndarray, ctx_b: np.ndarray,
    tfv_ids_a: np.ndarray, tfv_w_a: np.ndarray,
    tfv_ids_b: np.ndarray, tfv_w_b: np.ndarray,
    name_a: str, name_b: str,
    cfg: SNDConfig,
) -> tuple[float, float, float, float, float, float]:
    """One pair's features + blended score (pure, unit-testable)."""
    j_tok = jaccard_sorted(tok_a, tok_b)
    t_repo = jaccard_sorted(repo_a, repo_b)
    t_ctx = jaccard_sorted(ctx_a, ctx_b)
    cos = cosine_sparse(tfv_ids_a, tfv_w_a, tfv_ids_b, tfv_w_b)
    jw = jaro_winkler(name_a.lower(), name_b.lower())
    score = (
        cfg.w_tokens * j_tok
        + cfg.w_repo * t_repo
        + cfg.w_ctx * t_ctx
        + cfg.w_tfidf * cos
        + cfg.w_name * jw
    )
    return j_tok, t_repo, t_ctx, cos, jw, score


class PairScorer:
    """Actor: pair rows (with payload signatures) → scored edge rows."""

    def __init__(self, cfg: SNDConfig):
        self.cfg = cfg

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        cfg = self.cfg
        cols = {k: batch[k].to_numpy() for k in (
            "tok_a", "tok_b", "repo_a", "repo_b", "ctx_a", "ctx_b",
            "tfv_ids_a", "tfv_w_a", "tfv_ids_b", "tfv_w_b", "name_a", "name_b",
        )}
        feats = np.empty((n, 6), dtype=np.float64)
        asarr = np.asarray
        for i in range(n):
            feats[i] = score_pair_arrays(
                asarr(cols["tok_a"][i], dtype=np.int64), asarr(cols["tok_b"][i], dtype=np.int64),
                asarr(cols["repo_a"][i], dtype=np.int64), asarr(cols["repo_b"][i], dtype=np.int64),
                asarr(cols["ctx_a"][i], dtype=np.int64), asarr(cols["ctx_b"][i], dtype=np.int64),
                asarr(cols["tfv_ids_a"][i], dtype=np.int64), asarr(cols["tfv_w_a"][i], dtype=np.float32),
                asarr(cols["tfv_ids_b"][i], dtype=np.int64), asarr(cols["tfv_w_b"][i], dtype=np.float32),
                str(cols["name_a"][i]), str(cols["name_b"][i]),
                cfg,
            )
        return pd.DataFrame(
            {
                "block_key": batch["block_key"].to_numpy(),
                "id_a": batch["id_a"].to_numpy(),
                "id_b": batch["id_b"].to_numpy(),
                "j_tok": feats[:, 0],
                "t_repo": feats[:, 1],
                "t_ctx": feats[:, 2],
                "cos": feats[:, 3],
                "jw": feats[:, 4],
                "score": feats[:, 5],
            }
        )


def score_pairs(pairs: "ray.data.Dataset", cfg: SNDConfig | None = None) -> "ray.data.Dataset":
    """pairs → scored edges; keeps only pairs with score ≥ tau_attach (the
    lower of the two thresholds — everything below it can influence neither
    clustering nor post-match, so it is dropped as early as possible)."""
    cfg = cfg or SNDConfig()
    scored = pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pandas",
        batch_size=cfg.score_batch_size,
        concurrency=(1, cfg.score_concurrency),
    )
    tau = min(cfg.tau_attach, cfg.tau_edge)
    return scored.map_batches(
        lambda df: df[df["score"] >= tau],
        batch_format="pandas",
        batch_size=cfg.score_batch_size,
    )
