"""Entity-resolution blocking strategies beyond plain key-equality.

The reference's only blocking device is exact key grouping (the per-name
shards of ``whoiswho/dataset/data_process.py:60-84``); classic record
linkage adds *sorted-neighborhood* blocking (Hernandez & Stolfo, SIGMOD
1995): sort all records by a lexicographic key and emit every pair whose
ranks are within a fixed window ``w``.  That catches near-misses that
never share an exact key (typos at the tail of the name) at O(n·w)
candidate pairs instead of O(n²).

Ray-Data-first layout:

1. one global sort on the key columns (+ id tie-break) — the ONLY
   all-to-all exchange;
2. global ranks via the per-block offset pass (``agg.with_global_rank``
   — no shuffle, one tiny task per block);
3. rows fall into rank buckets of ``bucket_rows`` each; the first ``w``
   rows of every bucket are *replicated* into the previous bucket so a
   window never straddles an exchange boundary;
4. one hash-grouped pass per bucket emits pairs ``(rank, rank+d)`` for
   ``d = 1..w`` with pure slice arithmetic (ranks inside a bucket are
   contiguous by construction — no search, no per-row loop), keeping a
   pair iff its LEFT rank is owned by the bucket (exactly-once).

At 100 TB the sort is the cost; everything after is embarrassingly
parallel with ``w``-row overlap — the same boundary-replication trick a
multi-node run needs, so single-node behavior == cluster behavior.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    id_col: str,
    window: int,
    bucket_rows: int = 65536,
) -> "ray.data.Dataset":
    """Candidate pairs ``(id_a, id_b)`` whose global ranks under
    ``ORDER BY key_cols..., id_col`` differ by at most ``window``.

    Output columns: ``id_a``, ``id_b`` (ids at the lower / higher rank
    respectively — NOT sorted by id value, but deterministic because the
    sort is total thanks to the ``id_col`` tie-break).

    Oracle shape::

        WITH r AS (SELECT <id>, ROW_NUMBER() OVER (ORDER BY <keys>, <id>)
                   AS rn FROM t)
        SELECT a.<id> AS id_a, b.<id> AS id_b
        FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + <w>
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if bucket_rows <= window:
        raise ValueError("bucket_rows must exceed window")
    from .agg import with_global_rank

    cols = list(dict.fromkeys(list(key_cols) + [id_col]))
    s = ds.select_columns(cols).sort(
        list(key_cols) + [id_col]).materialize()
    ranked = with_global_rank(s, "__rn").select_columns([id_col, "__rn"])

    w = int(window)
    B = int(bucket_rows)

    def assign(t: pa.Table) -> pa.Table:
        rn = t.column("__rn").to_numpy(zero_copy_only=False)
        own = rn // B
        # head rows of bucket k>0 also serve bucket k-1 as right-side
        # neighbors; they are tagged by a bucket id only — no payload dup
        # beyond the (id, rank) projection.
        head = (rn % B < w) & (own > 0)
        t = t.append_column("__bucket", pa.array(own.astype(np.int64)))
        if not head.any():
            return t
        extra = t.filter(pa.array(head)).drop_columns(["__bucket"])
        extra = extra.append_column(
            "__bucket", pa.array((own[head] - 1).astype(np.int64)))
        return pa.concat_tables([t, extra])

    bucketed = ranked.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=131072)

    def pairs(t: pa.Table) -> pa.Table:
        b = int(t.column("__bucket")[0].as_py())
        t = t.sort_by([("__rn", "ascending")])
        rn = t.column("__rn").to_numpy(zero_copy_only=False)
        ids = t.column(id_col)
        lo, hi = b * B, (b + 1) * B
        parts = []
        n = len(rn)
        for d in range(1, w + 1):
            if n <= d:
                break
            a_rn = rn[:-d]
            # ranks are globally contiguous integers, so within the
            # bucket+overlap slice rank[i+d] == rank[i]+d always holds;
            # assert the invariant instead of searching.
            keep = (a_rn >= lo) & (a_rn < hi)
            if not keep.any():
                continue
            idx = np.flatnonzero(keep)
            if not np.array_equal(rn[idx + d], a_rn[idx] + d):
                raise AssertionError("sorted-neighborhood rank gap — "
                                     "with_global_rank contract violated")
            parts.append(pa.table({
                "id_a": ids.take(pa.array(idx)),
                "id_b": ids.take(pa.array(idx + d)),
            }))
        if not parts:
            return pa.table({"id_a": ids.slice(0, 0), "id_b": ids.slice(0, 0)})
        return pa.concat_tables(parts)

    return bucketed.groupby("__bucket").map_groups(
        pairs, batch_format="pyarrow")


def multipass_sorted_neighborhood(
    ds: "ray.data.Dataset",
    passes: list[list[str]],
    id_col: str,
    window: int,
    bucket_rows: int = 65536,
) -> "ray.data.Dataset":
    """Multi-pass sorted-neighborhood (the production variant of
    Hernandez & Stolfo): one windowed pass per sort-key list, unioned,
    with the pair de-duplicated on the UNordered pair ``{a, b}`` —
    different passes may discover the same pair in opposite rank order.

    Output: ``id_a < id_b`` canonical pairs, distinct.
    """
    import pyarrow.compute as pc
    from .agg import distinct

    parts = [
        sorted_neighborhood_pairs(ds, ks, id_col, window, bucket_rows)
        for ks in passes
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)

    def canon(t: pa.Table) -> pa.Table:
        a, b = t.column("id_a"), t.column("id_b")
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        return pa.table({"id_a": lo, "id_b": hi})

    u = u.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
    return distinct(u, ["id_a", "id_b"], final="shuffle")
