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
from whoiswho_ray.functions.hashing import hash_tokens64, record_id_of, sha256_hex
from whoiswho_ray.functions.textnorm import (
    basename_of,
    ctx_tokens,
    normalize_block_key,
    repo_tokens,
    tokenize_identifiers,
)


def normalize_batch(batch: pa.Table, cfg: SNDConfig) -> pa.Table:
    """Pure per-batch transform (unit-testable without Ray)."""
    repo = batch.column("repo").to_pylist()
    path = batch.column("path").to_pylist()
    commit = batch.column("commit").to_pylist()
    lang = batch.column("lang").to_pylist()
    content = batch.column("content").to_pylist()

    n = len(repo)
    rid = [record_id_of(repo[i], path[i], commit[i]) for i in range(n)]
    bkey = [normalize_block_key(p) for p in path]
    name = [basename_of(p) for p in path]
    sha = [sha256_hex(c if c is not None else "") for c in content]
    tok_arrays = []
    n_toks = np.empty(n, dtype=np.int32)
    for i in range(n):
        toks = tokenize_identifiers(content[i] or "", cfg.max_tokens_per_record)
        n_toks[i] = len(toks)
        tok_arrays.append(hash_tokens64(toks))
    repo_arrays = [hash_tokens64(repo_tokens(r)) for r in repo]
    ctx_arrays = [hash_tokens64(ctx_tokens(path[i], lang[i] or "")) for i in range(n)]

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
            "tok_ids": pa.array([a.tolist() for a in tok_arrays], pa.list_(pa.int64())),
            "repo_ids": pa.array([a.tolist() for a in repo_arrays], pa.list_(pa.int64())),
            "ctx_ids": pa.array([a.tolist() for a in ctx_arrays], pa.list_(pa.int64())),
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
