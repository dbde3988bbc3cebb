"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the exact baseline (numpy matmul per batch
against a broadcast query matrix — the query side is ``ray.put`` once and
read per actor, never re-shipped per batch), with an IVF-bucketed variant
as the scale path (coarse centroids from a driver-side sample, batches
searched only in probed cells).

Mirrors the shape of the reference's KNRM profile-similarity scoring
(``/root/reference/whoiswho/featureGenerator/rndFeature/model.py:103-135``:
batched cosine of paper embedding vs profile embeddings) without the
learned kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class _BruteScorer:
    """Actor: per batch, cosine of every row against the broadcast query
    matrix; emits each batch's per-query top-k candidates (partial top-k —
    the global top-k reduction happens in a tiny groupby after)."""

    def __init__(self, query_ref, k: int, vec_col: str, key_col: str):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.qids = q[0]
        self.qmat = _unit(np.asarray(q[1], dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.key_col = key_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = _unit(_as_matrix(batch[self.vec_col]))
        keys = batch[self.key_col].to_numpy()
        sims = self.qmat @ mat.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        # partial top-k per query within this batch
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out = {"query_id": [], "neighbor_id": [], "cos": []}
        for qi in range(sims.shape[0]):
            cand = idx[qi]
            out["query_id"].extend([self.qids[qi]] * cand.size)
            out["neighbor_id"].extend(keys[cand].tolist())
            out["cos"].extend(sims[qi, cand].tolist())
        return pd.DataFrame(out)


def _topk_reduce(k: int):
    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g
    return reduce_group


def knn_brute(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    exclude_self: bool = True,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Exact cosine top-k: returns (query_id, neighbor_id, cos, rank).

    Deterministic tie-break: (cos desc, neighbor_id asc)."""
    query_ref = ray.put((np.asarray(query_ids), np.asarray(query_vecs)))
    partial = ds.map_batches(
        _BruteScorer,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k + (1 if exclude_self else 0),
                               "vec_col": vec_col, "key_col": key_col},
        batch_format="pandas",
        batch_size=4096,
        concurrency=(1, concurrency),
    )
    if exclude_self:
        partial = partial.map_batches(
            lambda df: df[df["query_id"] != df["neighbor_id"]], batch_format="pandas"
        )
    return partial.groupby("query_id").map_groups(_topk_reduce(k), batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the scale path
# ---------------------------------------------------------------------------


def train_centroids(sample: np.ndarray, n_cells: int, iters: int = 8, seed: int = 42) -> np.ndarray:
    """Tiny Lloyd's k-means on a driver-side sample (the coarse quantizer).
    Deterministic in (sample, n_cells, seed)."""
    rng = np.random.RandomState(seed)
    sample = _unit(np.asarray(sample, dtype=np.float64))
    n = sample.shape[0]
    cents = sample[rng.choice(n, size=min(n_cells, n), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cents[c] = m / norm
    return cents


def knn_ivf(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    seed: int = 42,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """IVF-bucketed ANN: centroids from a sample, each batch searched only
    against queries probing that batch's cells. Approximate — recall
    depends on n_probe/n_cells; same output schema as ``knn_brute``."""
    sample = ds.limit(sample_size).to_pandas()
    cents = train_centroids(_as_matrix(sample[vec_col]), n_cells, seed=seed)
    qmat = _unit(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    state_ref = ray.put((np.asarray(query_ids), qmat, cents, probes))

    class IvfScorer:
        def __init__(self):
            qids, qm, cen, prb = ray.get(state_ref)
            self.qids, self.qmat, self.cents = qids, qm, cen
            # cell -> query indices probing it
            self.cell2q: dict[int, np.ndarray] = {}
            for c in range(cen.shape[0]):
                qs = np.where((prb == c).any(axis=1))[0]
                if qs.size:
                    self.cell2q[c] = qs

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mat = _unit(_as_matrix(batch[vec_col]))
            keys = batch[key_col].to_numpy()
            cells = np.argmax(mat @ self.cents.T, axis=1)
            out = {"query_id": [], "neighbor_id": [], "cos": []}
            for c in np.unique(cells):
                qs = self.cell2q.get(int(c))
                if qs is None:
                    continue
                rows = np.where(cells == c)[0]
                sims = self.qmat[qs] @ mat[rows].T
                kk = min(k + 1, rows.size)
                idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                for qi_local, qi in enumerate(qs):
                    cand = idx[qi_local]
                    out["query_id"].extend([self.qids[qi]] * cand.size)
                    out["neighbor_id"].extend(keys[rows[cand]].tolist())
                    out["cos"].extend(sims[qi_local, cand].tolist())
            return pd.DataFrame(out)

    partial = ds.map_batches(IvfScorer, batch_format="pandas", batch_size=4096,
                             concurrency=(1, concurrency))
    partial = partial.map_batches(
        lambda df: df[df["query_id"] != df["neighbor_id"]], batch_format="pandas"
    )
    return partial.groupby("query_id").map_groups(_topk_reduce(k), batch_format="pandas")
