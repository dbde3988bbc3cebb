"""Deduplication operators over a document table.

The reference's dedup surface is exact line-set dedup (operator D1,
``/root/reference/whoiswho/featureGenerator/sndFeature/relational_features.py:
20-53``) — re-expressed here as hash-partitioned groupby-first, plus the
near-dup family a 100 TB training-data pipeline needs (MinHash-LSH,
SimHash, exact n-gram Jaccard, embedding cosine), each built from the same
primitives as the SND pipeline (MinHash salting, threshold edges,
connected components, the lexsort intersection kernel).

Scale notes: the LSH shuffles move one **(bucket, key)** row per
(doc, band) — token payloads never enter the all-to-all; candidate pairs
are deduped by a native Count aggregate; verification reads the token
side-table from a broadcast (``ray.put`` once, fetched per actor), with a
bucketed join as the documented fallback when the side-table outgrows
worker memory. Oversized buckets degrade to sorted-window pairs under a
budget — bounded, logged, recall recovered by the transitive closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from whoiswho_ray.functions.hashing import MinHasher, band_keys_matrix, hash_tokens64, sha256_hex, simhash64
from whoiswho_ray.functions.textnorm import tokenize_text
from whoiswho_ray.stages.cluster import UnionFind
from whoiswho_ray.stages.scoring import _flat, _intersections

_PAIR_BUDGET = 50_000  # per-bucket candidate-pair budget (window pairs beyond)


# ---------------------------------------------------------------------------
# exact dedup (D1): hash-partition + per-group min — SQL-checkable
# ---------------------------------------------------------------------------


def exact_dedup(ds: "ray.data.Dataset", text_col: str = "text", key_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep one row (minimum key) per distinct text. The groupby shuffle
    partitions by content hash; rows ride along here because payloads are
    small — at scale, ship (sha, key) projections and semi-join the keepers
    back via ``joins.semi_join``."""

    def add_sha(t: pa.Table) -> pa.Table:
        sha = [sha256_hex(x if x is not None else "") for x in t.column(text_col).to_pylist()]
        return t.append_column("_sha", pa.array(sha, pa.string()))

    with_sha = ds.map_batches(add_sha, batch_format="pyarrow", zero_copy_batch=True)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key_col).head(1).drop(columns=["_sha"])

    return with_sha.groupby("_sha").map_groups(keep_min, batch_format="pandas")


# ---------------------------------------------------------------------------
# shared helpers for the near-dup family
# ---------------------------------------------------------------------------


def _tokenize_table(ds: "ray.data.Dataset", text_col: str, key_col: str) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        toks = [hash_tokens64(tokenize_text(x or "", stopwords=frozenset(), min_len=1))
                for x in t.column(text_col).to_pylist()]
        return pa.table({
            key_col: t.column(key_col),
            "tok_ids": pa.array([a.tolist() for a in toks], pa.list_(pa.int64())),
        })
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _bucket_candidates(g: pd.DataFrame, budget: int = _PAIR_BUDGET) -> pd.DataFrame:
    """One bucket group of (bucket, key) rows → candidate key pairs.
    All-pairs under the budget, else deterministic sorted-window pairs."""
    keys = np.unique(g["key"].to_numpy())
    m = keys.size
    if m < 2:
        return pd.DataFrame({"key_a": keys[:0], "key_b": keys[:0]})
    if m * (m - 1) // 2 <= budget:
        ii, jj = np.triu_indices(m, 1)
        return pd.DataFrame({"key_a": keys[ii], "key_b": keys[jj]})
    out_a, out_b = [], []
    w = max(1, budget // m)
    for d in range(1, min(w, m - 1) + 1):
        out_a.append(keys[:-d])
        out_b.append(keys[d:])
    return pd.DataFrame({"key_a": np.concatenate(out_a)[:budget],
                         "key_b": np.concatenate(out_b)[:budget]})


def _local_dedup(cand: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-batch duplicate-pair pruning. Cross-batch duplicates survive —
    deliberately: duplicate candidates only cost re-verification (cheap,
    vectorized) and union-find is idempotent, so a global pair shuffle
    would buy nothing but an all-to-all."""
    return cand.map_batches(lambda df: df.drop_duplicates(), batch_format="pandas",
                            batch_size=262144)


def _components_from_edges(edge_df: pd.DataFrame, keys: pd.Series) -> pd.DataFrame:
    """(key_a, key_b) edges + all keys → (key, dup_group) via union-find.

    Driver-side — verified edge sets are small relative to the corpus. The
    distributed path for unbounded edge sets is
    ``stages.cluster.connected_components`` (same semantics, asserted
    equivalent in tests)."""
    from whoiswho_ray.stages.cluster import cc_labels

    uniq = pd.Index(keys.unique()).sort_values()
    arr = uniq.to_numpy()
    ia = np.searchsorted(arr, edge_df["key_a"].to_numpy())
    ib = np.searchsorted(arr, edge_df["key_b"].to_numpy())
    labels = cc_labels(len(uniq), ia.astype(np.int64), ib.astype(np.int64))
    return pd.DataFrame({"key": uniq, "dup_group": arr[labels]})


class _JaccardVerifier:
    """Actor: candidate (key_a, key_b) rows → verified edges with exact
    Jaccard ≥ threshold. The token side-table is broadcast once as flat
    (sorted keys, values, offsets) arrays; per batch the two sides are
    materialized by one vectorized list-gather and intersected with the
    shared lexsort kernel — no Python loop over pairs."""

    def __init__(self, tok_ref, threshold: float):
        keys, values, offsets = (
            ray.get(tok_ref) if isinstance(tok_ref, ray.ObjectRef) else tok_ref)
        self.keys = keys          # sorted
        self.values = values
        self.offsets = offsets
        self.lens = np.diff(offsets)
        self.threshold = threshold

    def _gather(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        l = self.lens[idx]
        out_off = np.zeros(idx.size + 1, dtype=np.int64)
        np.cumsum(l, out=out_off[1:])
        flat = np.repeat(self.offsets[idx], l) + (
            np.arange(int(out_off[-1])) - np.repeat(out_off[:-1], l))
        return self.values[flat], l

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({"key_a": [], "key_b": [], "jacc": []})
        ia = np.searchsorted(self.keys, df["key_a"].to_numpy())
        ib = np.searchsorted(self.keys, df["key_b"].to_numpy())
        vals_a, len_a = self._gather(ia)
        vals_b, len_b = self._gather(ib)
        inter, _ = _intersections(n, vals_a, len_a, vals_b, len_b)
        union = len_a + len_b - inter
        jacc = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ok = jacc >= self.threshold
        return pd.DataFrame({"key_a": df["key_a"].to_numpy()[ok],
                             "key_b": df["key_b"].to_numpy()[ok],
                             "jacc": jacc[ok]})


def minhash_lsh_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 16,
    rows: int = 8,
    seed: int = 42,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup clustering: shingle → minhash → band →
    bucket-groupby → verify exact Jaccard ≥ threshold → connected
    components. Returns (key_col, dup_group).

    P(candidate | J) = 1 - (1 - J^rows)^bands; defaults give ≈0.96 recall
    at J=0.8. Verification makes precision exact; recall is approximate
    (documented LSH semantics — the exactness oracle is
    ``ngram_jaccard_pairs``)."""
    toks = _tokenize_table(ds, text_col, key_col).materialize()
    mh = MinHasher(num_hashes=bands * rows, seed=seed)

    def explode(t: pa.Table) -> pa.Table:
        values, lens = _flat(t.column("tok_ids"))
        offsets = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        sigs = mh.signatures_flat(values, offsets)
        bkeys = band_keys_matrix(sigs, bands, rows)  # (n, bands)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(bkeys.ravel()),
            "key": pa.array(np.repeat(keys, bands)),
        })

    # materialize the (tiny) exploded table: the sort-based groupby
    # otherwise re-executes its input for boundary sampling
    exploded = toks.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True).materialize()

    toks_df = toks.to_pandas().sort_values(key_col)
    keys = toks_df[key_col].to_numpy()
    arrays = [np.asarray(a, np.int64) for a in toks_df["tok_ids"]]
    offsets = np.zeros(len(arrays) + 1, dtype=np.int64)
    np.cumsum([a.size for a in arrays], out=offsets[1:])
    flat_values = np.concatenate(arrays) if arrays else np.empty(0, np.int64)

    if keys.size and keys.size <= 8192:
        # small-corpus fast path, all driver-side numpy: bucket segments
        # from one lexsort, dedup by packed pair id, and one hybrid
        # intersection matrix answers every candidate in O(1)
        from whoiswho_ray.stages.scoring import allpairs_matrix

        ex_df = exploded.to_pandas()
        bk = ex_df["bucket"].to_numpy()
        kk = np.searchsorted(keys, ex_df["key"].to_numpy())
        order = np.lexsort((kk, bk))
        bk, kk = bk[order], kk[order]
        bounds = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1], True])
        pis, pjs = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            members = np.unique(kk[s:e])
            m = members.size
            if m < 2:
                continue
            if m * (m - 1) // 2 <= _PAIR_BUDGET:
                ti, tj = np.triu_indices(m, 1)
                pis.append(members[ti])
                pjs.append(members[tj])
            else:
                w = max(1, _PAIR_BUDGET // m)
                for d in range(1, min(w, m - 1) + 1):
                    pis.append(members[:-d])
                    pjs.append(members[d:])
        if pis:
            ia = np.concatenate(pis)
            ib = np.concatenate(pjs)
            packed = np.unique(ia * np.int64(keys.size) + ib)
            ia, ib = packed // keys.size, packed % keys.size
        else:
            ia = ib = np.empty(0, dtype=np.int64)

        M = allpairs_matrix(keys.size, flat_values, offsets)
        lens = np.diff(offsets).astype(np.float64)
        inter = M[ia, ib]
        union = lens[ia] + lens[ib] - inter
        jacc = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
        ok = jacc >= threshold
        edges = pd.DataFrame({"key_a": keys[ia[ok]], "key_b": keys[ib[ok]],
                              "jacc": jacc[ok]})
    else:
        cand = exploded.groupby("bucket").map_groups(_bucket_candidates, batch_format="pandas")
        cand = _local_dedup(cand)
        tok_ref = ray.put((keys, flat_values, offsets))
        edges = cand.map_batches(
            _JaccardVerifier, fn_constructor_kwargs={"tok_ref": tok_ref, "threshold": threshold},
            batch_format="pandas", batch_size=32768, concurrency=(1, 8),
        ).to_pandas().drop_duplicates(subset=["key_a", "key_b"])

    keys = ds.select_columns([key_col]).to_pandas()[key_col]
    comp = _components_from_edges(edges, keys).rename(columns={"key": key_col})
    import ray.data as rd
    return rd.from_pandas(comp)


_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)


def _hamming_matrix(sims_a: np.ndarray, sims_b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between aligned uint64 arrays."""
    x = (sims_a ^ sims_b).view(np.uint8).reshape(-1, 8)
    return _POPCNT[x].sum(axis=1)


def simhash_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """SimHash near-dup clustering: 64-bit simhash, split into
    (max_hamming+1) pieces (pigeonhole: any pair within the radius agrees
    on ≥1 piece), bucket-groupby per piece, verify exact Hamming, connected
    components. Returns (key_col, dup_group)."""
    n_pieces = max_hamming + 1
    width = 64 // n_pieces

    def add_simhash(t: pa.Table) -> pa.Table:
        out = []
        for x in t.column(text_col).to_pylist():
            ids = hash_tokens64(tokenize_text(x or "", stopwords=frozenset(), min_len=1))
            out.append(simhash64(ids))
        return pa.table({"key": t.column(key_col),
                         "sim": pa.array(np.array(out, dtype=np.uint64).astype(np.int64))})

    sh = ds.map_batches(add_simhash, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def explode(t: pa.Table) -> pa.Table:
        keys = t.column("key").to_numpy(zero_copy_only=False)
        sims = t.column("sim").to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for p in range(n_pieces):
            piece = ((sims >> np.uint64(p * width)) & np.uint64((1 << width) - 1)).astype(np.int64)
            parts.append(pa.table({"bucket": pa.array(piece | (np.int64(p) << 60)),
                                   "key": pa.array(keys)}))
        return pa.concat_tables(parts)

    cand = _local_dedup(
        sh.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").map_groups(_bucket_candidates, batch_format="pandas")
    )

    sh_df = sh.to_pandas()
    sim_map = dict(zip(sh_df["key"], sh_df["sim"].astype(np.uint64)))
    sim_ref = ray.put(sim_map)

    class HammingVerifier:
        def __init__(self):
            self.sims = ray.get(sim_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({"key_a": [], "key_b": []})
            sa = np.fromiter((self.sims[k] for k in df["key_a"]), np.uint64, len(df))
            sb = np.fromiter((self.sims[k] for k in df["key_b"]), np.uint64, len(df))
            ok = _hamming_matrix(sa, sb) <= max_hamming
            return pd.DataFrame({"key_a": df["key_a"].to_numpy()[ok],
                                 "key_b": df["key_b"].to_numpy()[ok]})

    edges = cand.map_batches(HammingVerifier, batch_format="pandas",
                             batch_size=32768, concurrency=(1, 8)).to_pandas()
    edges = edges.drop_duplicates(subset=["key_a", "key_b"])
    keys = ds.select_columns([key_col]).to_pandas()[key_col]
    comp = _components_from_edges(edges, keys).rename(columns={"key": key_col})
    import ray.data as rd
    return rd.from_pandas(comp)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Exact within-group all-pairs distinct-token Jaccard ≥ threshold —
    the SQL-checkable exact counterpart of the LSH operators. Returns
    (group_col, key_a, key_b, jacc)."""

    def add_toks(t: pa.Table) -> pa.Table:
        toks = [hash_tokens64(tokenize_text(x or "", stopwords=frozenset(), min_len=1))
                for x in t.column(text_col).to_pylist()]
        return pa.table({
            group_col: t.column(group_col),
            key_col: t.column(key_col),
            "tok_ids": pa.array([a.tolist() for a in toks], pa.list_(pa.int64())),
        })

    with_toks = ds.map_batches(add_toks, batch_format="pyarrow", zero_copy_batch=True)

    def allpairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table({group_col: pa.array([], g.column(group_col).type),
                          "key_a": pa.array([], g.column(key_col).type),
                          "key_b": pa.array([], g.column(key_col).type),
                          "jacc": pa.array([], pa.float64())})
        if n < 2:
            return empty
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        values, lens = _flat(g.column("tok_ids"))
        offsets = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        ii, jj = np.triu_indices(n, 1)
        ii, jj = order[ii], order[jj]
        # flatten both sides of every pair through the shared kernel
        def gather(idx):
            l = lens[idx]
            flat = np.repeat(offsets[idx], l) + (
                np.arange(int(l.sum())) - np.repeat(np.r_[0, np.cumsum(l)[:-1]], l))
            return values[flat], l
        va, la = gather(ii)
        vb, lb = gather(jj)
        inter, _ = _intersections(ii.size, va, la, vb, lb)
        union = la + lb - inter
        jacc = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ok = jacc >= threshold
        return pa.table({
            group_col: pa.array(np.repeat(g.column(group_col)[0].as_py(), int(ok.sum()))),
            "key_a": pa.array(keys[ii[ok]]),
            "key_b": pa.array(keys[jj[ok]]),
            "jacc": pa.array(jacc[ok]),
        })

    return with_toks.groupby(group_col).map_groups(allpairs, batch_format="pyarrow")


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    group_col: str = "label",
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.95,
) -> "ray.data.Dataset":
    """Embedding-cosine near-dup pairs within groups (vectorized matmul per
    group). Returns (group_col, key_a, key_b, cos). Float64 so results are
    bit-comparable with a DuckDB oracle."""

    def allpairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col)
        n = len(g)
        if n < 2:
            return pd.DataFrame({group_col: [], "key_a": [], "key_b": [], "cos": []})
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        sims = mat @ mat.T
        ii, jj = np.triu_indices(n, 1)
        cs = sims[ii, jj]
        ok = cs >= threshold
        keys = g[key_col].to_numpy()
        return pd.DataFrame({
            group_col: np.repeat(g[group_col].iloc[0], int(ok.sum())),
            "key_a": keys[ii[ok]],
            "key_b": keys[jj[ok]],
            "cos": cs[ok],
        })

    return ds.groupby(group_col).map_groups(allpairs, batch_format="pandas")
