"""Candidate-pair generation inside blocks (the A5 analog of SURVEY.md).

The reference materializes a dense N×N similarity matrix per name
(``/root/reference/whoiswho/training/AutoTrainSND.py:142-161``) — fine for
thousands of rows, fatal at scale. Here each block is one group of a
``groupby(block_key)`` shuffle and pairs are *rows*, not a matrix:

* blocks ≤ ``max_allpairs_block`` records emit all C(n,2) pairs (reference
  parity regime — every pair the reference would score is scored);
* hot blocks are **salted into MinHash-LSH sub-keys** (BASELINE.json north
  star: "skewed hot blocks are split by salted sub-keys and re-merged in
  the transitive-closure pass"): records sharing a signature band land in a
  sub-bucket, pairs are generated within buckets, duplicates across buckets
  removed, and recall across buckets is recovered because union-find joins
  any chain of within-bucket edges. A same-repo sub-key is added since the
  repo field carries the reference's org-weight (w=1.0).
* an oversized sub-bucket degrades to deterministic sorted-neighborhood
  pairing (window pairs on sorted record_id) under ``max_pairs_per_group``
  — bounded-pair scoring has reference precedent (profile caps at
  ``adhoc_features.py:105``), and truncation is *reported* per block via
  the ``truncated_pairs`` metric column, never silent.

Each pair row carries both sides' compact signatures (hashed-token arrays,
TF-IDF sparse vectors, basenames) so scoring needs no join against the
record table — at 100 TB only signatures travel, never content.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.functions.hashing import MinHasher

_PAYLOAD = [
    ("name", "name"),
    ("tok_ids", "tok"),
    ("repo_ids", "repo"),
    ("ctx_ids", "ctx"),
    ("tfv_ids", "tfv_ids"),
    ("tfv_w", "tfv_w"),
]

PAIR_COLUMNS = (
    ["block_key", "id_a", "id_b"]
    + [f"{short}_a" for _, short in _PAYLOAD]
    + [f"{short}_b" for _, short in _PAYLOAD]
)

_MINHASHERS: dict[tuple[int, int], MinHasher] = {}


def _minhasher(cfg: SNDConfig) -> MinHasher:
    key = (cfg.lsh_bands * cfg.lsh_rows, cfg.seed)
    if key not in _MINHASHERS:
        _MINHASHERS[key] = MinHasher(num_hashes=key[0], seed=key[1])
    return _MINHASHERS[key]


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=object) for c in PAIR_COLUMNS})


def _window_pairs(idx: np.ndarray, budget: int) -> list[tuple[int, int]]:
    """Deterministic sorted-neighborhood pairs: (i, i+d) for d ≤ W where W
    keeps the count under budget. idx must already be sorted by record_id
    so the pairing is input-order invariant."""
    n = idx.size
    w = max(1, budget // max(n, 1))
    out = []
    for d in range(1, min(w, n - 1) + 1):
        out.extend(zip(idx[:-d].tolist(), idx[d:].tolist()))
        if len(out) >= budget:
            return out[:budget]
    return out


def candidate_index_pairs(
    record_ids: np.ndarray,
    tok_arrays: list[np.ndarray],
    repo_arrays: list[np.ndarray],
    cfg: SNDConfig,
) -> tuple[list[tuple[int, int]], int]:
    """Index pairs for one block + truncated-pair count. Deterministic."""
    n = record_ids.size
    if n < 2:
        return [], 0
    if n <= cfg.max_allpairs_block:
        ii, jj = np.triu_indices(n, 1)
        return list(zip(ii.tolist(), jj.tolist())), 0

    order = np.argsort(record_ids, kind="stable")  # canonical order for determinism
    mh = _minhasher(cfg)
    buckets: dict[tuple[int, int], list[int]] = {}
    for pos in order.tolist():
        for band_i, key in enumerate(mh.band_keys(tok_arrays[pos], cfg.lsh_bands, cfg.lsh_rows)):
            buckets.setdefault((band_i, key), []).append(pos)
        # same-repo salt: records sharing a repo are likely same-entity
        rh = int(repo_arrays[pos][0]) if repo_arrays[pos].size else -1
        buckets.setdefault((-1, rh), []).append(pos)

    seen: set[tuple[int, int]] = set()
    pairs: list[tuple[int, int]] = []
    truncated = 0
    for key in sorted(buckets):
        idx = np.asarray(buckets[key])
        m = idx.size
        if m < 2:
            continue
        if m * (m - 1) // 2 <= cfg.max_pairs_per_group:
            ii, jj = np.triu_indices(m, 1)
            cand = zip(idx[ii].tolist(), idx[jj].tolist())
        else:
            cand = _window_pairs(idx, cfg.max_pairs_per_group)
            truncated += m * (m - 1) // 2 - len(cand)
        for i, j in cand:
            p = (i, j) if record_ids[i] < record_ids[j] else (j, i)
            if p not in seen:
                seen.add(p)
                pairs.append(p)
    return pairs, truncated


def make_pairs(group: pd.DataFrame, cfg: SNDConfig) -> pd.DataFrame:
    """One block (one map_groups group) → pair rows with payload columns."""
    n = len(group)
    if n < 2:
        return _empty_pairs()
    rids = group["record_id"].to_numpy()
    toks = [np.asarray(t, dtype=np.int64) for t in group["tok_ids"]]
    repos = [np.asarray(t, dtype=np.int64) for t in group["repo_ids"]]
    pairs, _truncated = candidate_index_pairs(rids, toks, repos, cfg)
    if not pairs:
        return _empty_pairs()
    ii = np.fromiter((p[0] for p in pairs), dtype=np.int64, count=len(pairs))
    jj = np.fromiter((p[1] for p in pairs), dtype=np.int64, count=len(pairs))
    out: dict[str, object] = {
        "block_key": np.repeat(group["block_key"].iloc[0], len(pairs)),
        "id_a": rids[ii],
        "id_b": rids[jj],
    }
    for col, short in _PAYLOAD:
        vals = group[col].to_numpy()
        out[f"{short}_a"] = vals[ii]
        out[f"{short}_b"] = vals[jj]
    return pd.DataFrame(out)


def block_metrics(group: pd.DataFrame, cfg: SNDConfig) -> pd.DataFrame:
    """Per-block lineage/metrics row: size, pair counts, salting/truncation."""
    n = len(group)
    rids = group["record_id"].to_numpy()
    toks = [np.asarray(t, dtype=np.int64) for t in group["tok_ids"]]
    repos = [np.asarray(t, dtype=np.int64) for t in group["repo_ids"]]
    pairs, truncated = candidate_index_pairs(rids, toks, repos, cfg)
    return pd.DataFrame(
        {
            "block_key": [group["block_key"].iloc[0]],
            "n_records": [n],
            "n_pairs": [len(pairs)],
            "salted": [n > cfg.max_allpairs_block],
            "truncated_pairs": [truncated],
        }
    )


def generate_pairs(vectorized: "ray.data.Dataset", cfg: SNDConfig | None = None) -> "ray.data.Dataset":
    """vectorized records → pair rows (the blocking shuffle, operator A1)."""
    cfg = cfg or SNDConfig()
    return vectorized.groupby("block_key").map_groups(
        lambda g: make_pairs(g, cfg), batch_format="pandas"
    )


def generate_block_metrics(vectorized: "ray.data.Dataset", cfg: SNDConfig | None = None) -> "ray.data.Dataset":
    cfg = cfg or SNDConfig()
    return vectorized.groupby("block_key").map_groups(
        lambda g: block_metrics(g, cfg), batch_format="pandas"
    )
