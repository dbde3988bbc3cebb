"""Distributed cardinality sketch: HyperLogLog registers as a combinable
aggregate (Flajolet et al. 2007).

Scale shape: the classic partial-combine pattern — every batch folds its
rows into a tiny (register, max_rank) table (at most ``2^b`` rows, 4096
by default), the partials stream through one bounded-key grouped max, and
the driver-side estimate reads a few KB. Nothing proportional to the
input ever concentrates anywhere; merging register tables with ``max`` is
associative and commutative, so the sketch distributes over any
partitioning.

Determinism / oracle: the hash is the first 8 bytes of
``md5(str(value))`` — identical in hashlib and DuckDB
(``('0x' || substr(md5(x), 1, 16))::UBIGINT``), so the REGISTER TABLE
itself is oracle-exact even though the estimate is approximate. The rank
uses only the low 32 bits, where DuckDB's ``floor(log2(x))`` is exactly
the bit length minus one (the nearest-double rounding of ``log2(2^k-1)``
cannot reach ``k`` until ~2^50), giving bit-exact SQL parity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _md5_hash64(values: np.ndarray) -> np.ndarray:
    """First 8 md5 bytes of str(v) as uint64, hashed once per unique value
    (dictionary-encode trick: NOTES.md round-2 item 6)."""
    uniq, inv = np.unique(values, return_inverse=True)
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
         for v in uniq),
        np.uint64, len(uniq))
    return uh[inv]


def _registers_of(h: np.ndarray, b: int) -> tuple[np.ndarray, np.ndarray]:
    """(register, rank) per hash: top ``b`` bits index the register, the
    rank is leading-zeros-plus-one within the low 32-bit window."""
    reg = (h >> np.uint64(64 - b)).astype(np.int64)
    low = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    bitlen = np.zeros(low.size, dtype=np.int64)
    nz = low > 0
    bitlen[nz] = np.floor(np.log2(low[nz])).astype(np.int64) + 1
    rank = 33 - bitlen  # low == 0 -> rank 33
    return reg, rank


def hll_registers(
    ds: "ray.data.Dataset", col: str, b: int = 12
) -> pd.DataFrame:
    """HLL register table for ``col``: one row per non-empty register,
    ``(register int64, max_rank int64)``. ``2^b`` registers — a bounded
    key space, so the grouped max uses the exact driver-side final."""
    from whoiswho_ray.stages.agg import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False)
        if not vals.size:
            return pa.table({"register": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        reg, rank = _registers_of(_md5_hash64(vals), b)
        # in-batch combine: max rank per register before anything ships
        m = 1 << b
        best = np.zeros(m, dtype=np.int64)
        np.maximum.at(best, reg, rank)
        hit = np.flatnonzero(best)
        return pa.table({"register": pa.array(hit, pa.int64()),
                         "rank": pa.array(best[hit], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    # bounded key space (<= 2^b registers): driver final is exact and tiny
    return grouped_agg(partials, "register", {"max_rank": ("rank", "max")})


def quantile_sketch(
    ds: "ray.data.Dataset",
    id_col: str,
    value_col: str,
    qs: list[float],
    m: int = 4096,
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate quantiles WITHOUT the global sort: deterministic
    bottom-k uniform sample (the m rows with the smallest
    ``md5('{seed}|{id}')`` hex digests — a seeded uniform sample, so the
    sample's discrete quantile estimates the population's with the usual
    O(1/sqrt(m)) error) + the exact quantile_disc convention on the
    sample.

    This is the 100-TB path next to :func:`agg.exact_quantiles`: that one
    is exact but pays a distributed sample-sort of every row; this one
    ships at most ``m`` rows per batch (vectorized argpartition partial
    top-k, the :func:`splits.weighted_sample` shape) and one k×batches
    driver merge — zero shuffles. Rows with NULL/NaN values are dropped
    first (quantile_disc semantics).

    Determinism makes the APPROXIMATE operator EXACTLY oracle-replayable:
    DuckDB's ``md5()`` hex string orders identically, so
    ``ORDER BY md5(...) LIMIT m`` rebuilds the very same sample and
    ``quantile_disc`` over it returns bit-identical values.
    """
    import math

    from whoiswho_ray.stages.agg import _drop_null_values

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({
                "__h": pd.Series([], dtype=object),
                value_col: df[value_col].iloc[0:0]})
        h = np.fromiter(
            (hashlib.md5(f"{seed}|{k}".encode()).hexdigest()
             for k in df[id_col]),
            dtype=object, count=n)
        out = pd.DataFrame({"__h": h, value_col: df[value_col].to_numpy()})
        if n > m:
            keep = np.argpartition(h, m - 1)[:m]
            out = out.iloc[keep]
        return out

    cand = _drop_null_values(
        ds, value_col).map_batches(partial, batch_format="pandas").to_pandas()
    if len(cand) == 0:  # fully-empty datasets can drop the schema entirely
        return pd.DataFrame({"q": pd.Series(qs, dtype=float),
                             "value": np.nan})
    cand = cand.sort_values("__h", kind="stable").head(m)
    vals = np.sort(cand[value_col].to_numpy())
    n = vals.size
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=float),
                             "value": np.nan})
    return pd.DataFrame({
        "q": pd.Series(qs, dtype=float),
        "value": [vals[max(0, math.ceil(q * n) - 1)] for q in qs],
    })


def hll_estimate(registers: pd.DataFrame, b: int = 12) -> float:
    """Standard HLL estimate with small-range linear counting."""
    m = 1 << b
    ranks = np.zeros(m, dtype=np.int64)
    ranks[registers["register"].to_numpy()] = registers["max_rank"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -ranks))
    zeros = int(np.sum(ranks == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting regime
    return float(est)

def count_min(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    d: int = 4,
    w: int = 512,
) -> pd.DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream: ``d`` hash rows × ``w`` counters; every counter is the
    SUM of the true counts of the tokens hashing into it, so point
    queries (:func:`cms_query`, min over the d rows) over-estimate by at
    most ``e/w · N`` with probability ``1 - e^-d``.

    Scale shape: the same partial-combine pattern as :func:`hll_registers`
    — each batch tokenizes with Arrow kernels (lower → split
    ``[^a-z0-9]+`` → drop empties, the :func:`text_analysis.top_tokens`
    convention), value-counts to its distinct tokens, hashes ONCE per
    batch-unique token per row, and folds into a dense ``d·w`` int64
    array; only the non-zero ``(cell, cnt)`` rows ship, and the grouped
    sum runs over a BOUNDED key space (``d·w`` cells). Counter merging is
    addition — associative/commutative, distributes over any
    partitioning.

    Determinism / oracle: the row-``r`` hash of token ``t`` is the first
    8 bytes of ``md5('{r}|{t}')`` mod ``w`` — in DuckDB
    ``('0x' || substr(md5(r || '|' || t), 1, 16))::UBIGINT % w`` — so the
    COUNTER TABLE is oracle-EXACT even though point estimates are
    approximate (same split as hll_registers: exact registers,
    approximate read-out).
    """
    import pyarrow.compute as pc

    from whoiswho_ray.stages.agg import grouped_agg

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cell": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t.column(text_col), "")),
            "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return empty
        vc = flat.value_counts()
        tokens = vc.field("values").to_pylist()
        counts = vc.field("counts").to_numpy(zero_copy_only=False
                                             ).astype(np.int64)
        dense = np.zeros(d * w, dtype=np.int64)
        for r in range(d):
            cols = np.fromiter(
                (int.from_bytes(
                    hashlib.md5(f"{r}|{tk}".encode()).digest()[:8],
                    "big") % w for tk in tokens),
                np.int64, len(tokens))
            np.add.at(dense, r * w + cols, counts)
        hit = np.flatnonzero(dense)
        return pa.table({"cell": pa.array(hit, pa.int64()),
                         "cnt": pa.array(dense[hit], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = grouped_agg(partials, "cell", {"cnt": ("cnt", "sum")})
    if len(out) == 0:
        return pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                             "cnt": pd.Series([], dtype=np.int64)})
    out = out.sort_values("cell").reset_index(drop=True)
    out["cell"] = out["cell"].astype(np.int64)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def cms_query(
    cms: pd.DataFrame, tokens: list[str], d: int = 4, w: int = 512
) -> np.ndarray:
    """Point-query the :func:`count_min` counter table: the estimate for
    each token is the MIN of its ``d`` counters (never under-estimates)."""
    dense = np.zeros(d * w, dtype=np.int64)
    dense[cms["cell"].to_numpy()] = cms["cnt"].to_numpy()
    est = np.empty(len(tokens), dtype=np.int64)
    for i, tk in enumerate(tokens):
        cells = [r * w + int.from_bytes(
            hashlib.md5(f"{r}|{tk}".encode()).digest()[:8], "big") % w
            for r in range(d)]
        est[i] = dense[cells].min()
    return est

def hll_registers_grouped(
    ds: "ray.data.Dataset", group_col: str, col: str, b: int = 12
) -> pd.DataFrame:
    """Per-GROUP HLL register tables (approximate distinct-count per
    group): ``(group, register, max_rank)`` rows — the grouped analog of
    :func:`hll_registers`. The key space stays bounded (groups × 2^b), so
    the same partial-combine pattern applies: each batch folds to at most
    |batch groups| × 2^b rows via one lexsort segment-max (no per-group
    Python), and the grouped max over partials is exact. Estimate a
    group's cardinality by passing its rows to :func:`hll_estimate`."""
    from whoiswho_ray.stages.agg import grouped_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({group_col: df[group_col].iloc[0:0],
                                 "register": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        reg, rank = _registers_of(
            _md5_hash64(df[col].to_numpy()), b)
        g = df[group_col].to_numpy()
        # in-batch combine: max rank per (group, register) via one lexsort
        order = np.lexsort((rank, reg, g))
        gs, rs, ks = g[order], reg[order], rank[order]
        last = np.r_[(gs[1:] != gs[:-1]) | (rs[1:] != rs[:-1]), True]
        return pd.DataFrame({group_col: gs[last], "register": rs[last],
                             "rank": ks[last]})

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=131072)
    out = grouped_agg(partials, [group_col, "register"],
                      {"max_rank": ("rank", "max")})
    return out.sort_values([group_col, "register"], ignore_index=True)
