"""Record normalization stage.

One zero-copy Arrow ``map_batches`` pass that turns the raw ``input_hint``
table ``(repo, path, commit, lang, content)`` into the engine's working
schema. This collapses the reference's whole preprocessing fan-out — the
per-name shard split (``/root/reference/whoiswho/dataset/data_process.py:
60-84``), the four relation-file writers (``data_process.py:104-212``) and
the plain-text corpus dump (``data_process.py:221-308``) — into columns on
a single Dataset instead of files on disk:

========================  ===================================================
column                    meaning
========================  ===================================================
record_id                 sha256(repo ⊕ path ⊕ commit)[:40] — stable identity
block_key                 normalized path-basename (the "cleaned name")
name                      raw basename (Jaro-Winkler feature input)
content_sha256            the per-row invariant required by BASELINE.json
tok_ids  list<int64>      sorted unique hashed identifier tokens (coauthor set)
n_toks                    token count before hashing (for metrics)
repo_ids list<int64>      hashed repo-slug tokens (org analog)
ctx_ids  list<int64>      hashed lang + path-dir tokens (venue analog)
========================  ===================================================

``content`` itself is dropped after this stage — at 100 TB the full text
must not travel through the shuffle; only compact signatures do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.functions.hashing import (
    hash_tokens64,
    record_id_of,
    sha256_hex,
    stable_hash64,
)
from whoiswho_ray.functions.textnorm import (
    CODE_STOPWORDS,
    basename_of,
    ctx_tokens,
    normalize_block_key,
    repo_tokens,
    tokenize_identifiers,
)


def tokenize_identifiers_column(
    content: "pa.ChunkedArray | pa.Array", max_tokens: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized identifier tokenization for a whole string column.

    Same pipeline as :func:`tokenize_identifiers` (camel/snake split,
    lowercase, len≥2, keyword filter, first-appearance distinct capped at
    ``max_tokens``) but expressed with Arrow kernels — only the per-batch
    *unique* token strings are hashed in Python. One edge differs from the
    scalar function: runs led by digits (``123abc``) keep their digits
    (the scalar regex started tokens at a letter) — irrelevant for
    identifier-shaped content, documented here for honesty.

    Returns (flat sorted-unique int64 hashes, row lengths, n_tokens per
    row before capping).
    """
    import pyarrow.compute as pc

    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    content = pc.fill_null(content, "")
    x = pc.replace_substring_regex(content, pattern="([a-z0-9])([A-Z])", replacement=r"\1 \2")
    x = pc.utf8_lower(x)
    toks = pc.split_pattern_regex(x, "[^a-z0-9]+")
    flat = toks.values
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = flat.slice(offsets[0], offsets[-1] - offsets[0])
    offsets = offsets - offsets[0]
    n = len(toks)

    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pylist()
    # validity + hash computed once per unique string
    uniq_ok = np.fromiter(
        ((len(u) >= 2) and (u not in CODE_STOPWORDS) for u in uniq), bool, len(uniq))
    uniq_hash = np.fromiter(
        (stable_hash64(u) if ok else 0 for u, ok in zip(uniq, uniq_ok)),
        np.int64, len(uniq))

    row_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    valid = uniq_ok[codes] if codes.size else np.zeros(0, dtype=bool)
    row_idx = row_idx[valid]
    if row_idx.size == 0:
        return (np.empty(0, dtype=np.int64), np.zeros(n, dtype=np.int64),
                np.zeros(n, dtype=np.int32))
    hashes = uniq_hash[codes[valid]]
    position = np.arange(row_idx.size, dtype=np.int64)

    # first-appearance distinct per row: sort (row, hash, position), keep
    # group heads, then restore appearance order and cap per row
    order = np.lexsort((position, hashes, row_idx))
    r, h, p = row_idx[order], hashes[order], position[order]
    head = np.r_[True, (r[1:] != r[:-1]) | (h[1:] != h[:-1])]
    r, h, p = r[head], h[head], p[head]
    n_toks = np.bincount(r, minlength=n).astype(np.int32)
    # appearance order within row for the cap
    order2 = np.lexsort((p, r))
    r, h = r[order2], h[order2]
    seq = np.arange(r.size) - np.repeat(
        np.r_[0, np.cumsum(np.bincount(r, minlength=n))[:-1]], np.bincount(r, minlength=n))
    keep = seq < max_tokens
    r, h = r[keep], h[keep]
    # final layout: sorted unique hashes per row
    order3 = np.lexsort((h, r))
    r, h = r[order3], h[order3]
    lens = np.bincount(r, minlength=n).astype(np.int64)
    return h, lens, n_toks


def normalize_batch(batch: pa.Table, cfg: SNDConfig) -> pa.Table:
    """Pure per-batch transform (unit-testable without Ray). Content
    tokenization is fully vectorized (Arrow kernels + unique-only
    hashing); identity/path derivations are cheap per-row Python."""
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    lang = batch.column("lang").to_pylist()
    content = batch.column("content")

    n = len(repo)
    rid = [record_id_of(repo[i], path[i], commit[i]) for i in range(n)]
    bkey = [normalize_block_key(p) for p in path]
    name = [basename_of(p) for p in path]
    sha = [sha256_hex(c if c is not None else "")
           for c in content.to_pylist()]

    tok_values, tok_lens, n_toks = tokenize_identifiers_column(
        content, cfg.max_tokens_per_record)
    tok_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tok_lens, out=tok_off[1:])
    tok_list = pa.ListArray.from_arrays(
        pa.array(tok_off.astype(np.int32)), pa.array(tok_values, pa.int64()))

    # repos repeat heavily within a batch (one repo spans many files):
    # hash each distinct repo string once per batch
    repo_cache: dict[str, np.ndarray] = {}
    repo_arrays = []
    for r in repo:
        a = repo_cache.get(r)
        if a is None:
            a = hash_tokens64(repo_tokens(r))
            repo_cache[r] = a
        repo_arrays.append(a)
    ctx_arrays = [hash_tokens64(ctx_tokens(path[i], lang[i] or "")) for i in range(n)]

    def _list_array(arrays: list[np.ndarray]) -> pa.ListArray:
        lens = np.fromiter((a.size for a in arrays), np.int64, len(arrays))
        off = np.zeros(len(arrays) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        vals = (np.concatenate(arrays) if len(arrays)
                else np.empty(0, dtype=np.int64))
        return pa.ListArray.from_arrays(pa.array(off.astype(np.int32)),
                                        pa.array(vals, pa.int64()))

    return pa.table(
        {
            "record_id": pa.array(rid, pa.string()),
            "block_key": pa.array(bkey, pa.string()),
            "name": pa.array(name, pa.string()),
            "repo": batch.column("repo"),
            "path": batch.column("path"),
            "commit": batch.column("commit"),
            "lang": batch.column("lang"),
            "content_sha256": pa.array(sha, pa.string()),
            "n_toks": pa.array(n_toks),
            "tok_ids": tok_list,
            "repo_ids": _list_array(repo_arrays),
            "ctx_ids": _list_array(ctx_arrays),
        }
    )


def normalize_records(ds: "ray.data.Dataset", cfg: SNDConfig | None = None) -> "ray.data.Dataset":
    """records Dataset → normalized Dataset (content dropped)."""
    cfg = cfg or SNDConfig()
    return ds.map_batches(
        lambda b: normalize_batch(b, cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
