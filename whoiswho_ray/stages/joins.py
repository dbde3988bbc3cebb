"""Join operators (SURVEY.md §2.4).

Two physical strategies, chosen by the caller the way the reference
chooses build sides implicitly (its joins are all dict lookups against an
in-memory build side, ``/root/reference/whoiswho/dataset/
data_process.py:74-84``):

* ``broadcast_join`` — small build side: ``ray.put`` the pandas frame
  once; every map task merges against the shared object-store copy. No
  shuffle. This is the J1/J2-style semi/lookup join.
* ``shuffle_hash_join`` — both sides large: explicit partitioned hash
  join (bucket on ``hash(key) % B``, co-group buckets, merge per bucket).
  The portable pattern recommended by the Ray Data docs when
  ``Dataset.join`` isn't suitable; B is the caller-visible partitioning
  knob, skewed keys can be pre-salted by the caller.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _arrow_type(t):
    """Best-effort pyarrow type for a Ray Dataset schema entry (Arrow
    DataType, numpy dtype, or the ``object`` class pandas-backed blocks
    report for strings)."""
    import pyarrow as pa

    if isinstance(t, pa.DataType):
        return t
    try:
        dt = np.dtype(t)
    except TypeError:
        return pa.string()
    if dt == np.dtype("O"):
        return pa.string()
    return pa.from_numpy_dtype(dt)


#: Fixed hash assigned to NULL key values — keeps nulls co-located without
#: ever letting a null-induced pandas dtype promotion change a VALUE's hash.
_NULL_HASH = np.uint64(0x9E3779B97F4A7C15)


def _col_hash(col) -> np.ndarray:
    """uint64 hash of one Arrow (chunked) key column, stable under nulls.

    ``to_pandas()`` on an int64 column promotes to float64 only in batches
    that happen to contain nulls, and pandas hashes int64 ``2`` and float64
    ``2.0`` differently — the same key value would land in different shuffle
    buckets across batches/sides (ADVICE r3). Canonicalize the dtype FIRST
    (ints/bools/temporals → int64, floats → float64), hash the null-filled
    values, then stamp null positions with a fixed sentinel hash.
    """
    import pyarrow as pa

    t = col.type
    if (pa.types.is_integer(t) or pa.types.is_boolean(t)
            or pa.types.is_temporal(t)):
        c = col.cast(pa.int64())
        mask = c.is_null().to_numpy(zero_copy_only=False)
        vals = c.fill_null(0).to_numpy(zero_copy_only=False)
    elif pa.types.is_floating(t):
        c = col.cast(pa.float64())
        mask = c.is_null().to_numpy(zero_copy_only=False)
        vals = c.fill_null(0.0).to_numpy(zero_copy_only=False)
    else:
        s = col.to_pandas()
        mask = s.isna().to_numpy()
        h = pd.util.hash_pandas_object(s, index=False).to_numpy().astype(
            np.uint64)
        if mask.any():
            h = h.copy()
            h[mask] = _NULL_HASH
        return h
    h = pd.util.hash_array(vals).astype(np.uint64)
    if mask.any():
        h[mask] = _NULL_HASH
    return h


def _key_hash(t, keys: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of one or more key columns of an Arrow
    table (FNV-style combine of per-column siphashes; dtype-canonical and
    null-stable, see ``_col_hash``)."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            h = h * np.uint64(1099511628211) ^ _col_hash(t.column(k))
    return h


def arrow_tagged_union(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    lkeys: list[str],
    rkeys: list[str],
    num_buckets: int,
):
    """Schema-aligned union of two datasets with a side tag (``__side``:
    0=left, 1=right) and a key-hash bucket column, padding each side's
    missing columns with Arrow TYPED NULLS (``pa.nulls(n, type)``).

    This replaces the earlier pandas ``reindex`` + NaN padding: NaN
    promotes int64 columns to float64 across the shuffle and silently
    corrupts values above 2^53 (ADVICE r2). With typed nulls the Arrow
    schema is preserved end-to-end; bucket tasks should filter their side
    and select that side's own columns BEFORE any pandas conversion so no
    padding null ever meets an integer column.

    Returns ``(unioned_ds, lcols, rcols)``.
    """
    import pyarrow as pa

    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    types: dict = {}
    for n, t in zip(lschema.names, lschema.types):
        types[n] = _arrow_type(t)
    for n, t in zip(rschema.names, rschema.types):
        types.setdefault(n, _arrow_type(t))
    all_cols = lcols + [c for c in rcols if c not in lcols]
    target = pa.schema(
        [pa.field(c, types[c]) for c in all_cols]
        + [pa.field("__bucket", pa.int64()), pa.field("__side", pa.int8())])

    def pad(side: int, keys: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            b = (_key_hash(t, keys) % np.uint64(num_buckets)).astype(np.int64)
            cols = {c: (t.column(c) if c in t.column_names
                        else pa.nulls(n, type=types[c])) for c in all_cols}
            cols["__bucket"] = pa.array(b, pa.int64())
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols).cast(target)
        return f

    lb = left.map_batches(pad(0, lkeys), batch_format="pyarrow",
                          zero_copy_batch=True)
    rb = right.map_batches(pad(1, rkeys), batch_format="pyarrow",
                           zero_copy_batch=True)
    return lb.union(rb), lcols, rcols


def split_sides(t, lcols: list[str], rcols: list[str]):
    """Split a tagged-union bucket table back into its (left, right) Arrow
    tables, each with only its own columns — padding nulls never survive,
    so a later ``to_pandas`` restores exact dtypes (int64 stays int64)."""
    import pyarrow as pa

    side = t.column("__side").to_numpy(zero_copy_only=False)
    l = t.filter(pa.array(side == 0)).select(lcols)
    r = t.filter(pa.array(side == 1)).select(rcols)
    return l, r


_BROADCAST_CACHE: dict = {}


def _cached_get(ref, cap: int = 4):
    """Per-worker-process cache for broadcast objects: Ray reuses worker
    processes across tasks, so a task-pool map deserializes each
    broadcast ONCE per worker (the actor-pool benefit) without paying
    actor-pool startup or its concurrency cap. Bounded to ``cap``
    entries so long sessions don't accumulate dead broadcasts."""
    key = ref.hex()
    v = _BROADCAST_CACHE.pop(key, None)
    if v is None:
        v = ray.get(ref)
    _BROADCAST_CACHE[key] = v
    while len(_BROADCAST_CACHE) > cap:
        _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    return v


def broadcast_join(
    large: "ray.data.Dataset",
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    """Hash-lookup join against a broadcast small side (``ray.put`` once,
    read per worker via the process-level cache — never re-shipped per
    batch)."""
    small_ref = ray.put(small)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(_cached_get(small_ref), on=on, how=how)

    return large.map_batches(merge, batch_format="pandas",
                             batch_size=65536)


def detect_hot_keys(
    ds: "ray.data.Dataset",
    key: str,
    top: int = 16,
    min_count: int | None = None,
    min_frac: float = 0.01,
) -> list:
    """Approximate hot-key detection for skew handling: per-batch
    ``value_counts`` top-``top`` partials (a key hot enough to skew a
    shuffle is hot inside most batches), summed on the driver — at most
    ``top × batches`` candidate rows ever concentrate, regardless of key
    cardinality. Returns the candidate keys whose summed count reaches
    ``min_count`` (default: ``min_frac`` of the dataset). Under-detection
    is safe — a missed warm key just stays unsalted."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[key].value_counts().head(top)
        return pd.DataFrame({key: vc.index.to_numpy(), "__c": vc.to_numpy()})

    cands = ds.map_batches(partial, batch_format="pandas",
                           batch_size=131072).to_pandas()
    if cands.empty:
        return []
    if min_count is None:
        min_count = max(2, int(ds.count() * min_frac))
    totals = cands.groupby(key, sort=False)["__c"].sum()
    return totals[totals >= min_count].index.tolist()


def shuffle_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    num_buckets: int = 16,
    how: str = "inner",
    project=None,
    salt: int = 0,
    hot_keys=None,
) -> "ray.data.Dataset":
    """Partitioned hash join: bucket both sides on the key hash, union with
    a side tag (typed-null Arrow padding — see :func:`arrow_tagged_union`),
    co-group by bucket, pandas-merge inside each group.

    ``project``, if given, runs on each bucket's merged frame INSIDE the
    join task (e.g. ``lambda m: m[cols].drop_duplicates()``) — fusing a
    projection/local-dedup into the join so the full joined rows never
    leave the bucket task. A downstream global pass (e.g. ``distinct``)
    then shuffles only the projected survivors.

    ``salt`` > 1 enables SKEW-AWARE salting (single string key, inner/left
    only): hot keys — ``hot_keys`` if given, else :func:`detect_hot_keys`
    on the left side — have their LEFT rows spread across ``salt``
    sub-partitions and their RIGHT rows replicated into every
    sub-partition, so one hot key's work lands on ``salt`` bucket tasks
    instead of one. Replication cost = |right hot rows| × salt — salt the
    side that is large, broadcast-join if the right side is tiny anyway.
    Output is identical to the unsalted join.

    Non-key column names must be disjoint between the sides: a shared
    payload name would silently occupy ONE physical column in the union
    (mixing both sides' values); raise instead and let the caller rename."""
    import pyarrow as pa

    keys = [on] if isinstance(on, str) else list(on)

    lcols_pre = list(left.schema().names)
    rcols_pre = list(right.schema().names)
    overlap = (set(lcols_pre) & set(rcols_pre)) - set(keys)
    if overlap:
        raise ValueError(
            f"shuffle_hash_join: non-key columns {sorted(overlap)} exist on "
            "both sides; rename one side before joining")

    salted = False
    if salt and salt > 1:
        if len(keys) != 1:
            raise ValueError("salt requires a single join key")
        if how not in ("inner", "left"):
            raise ValueError(
                "salt supports inner/left joins (right/outer would need "
                "LEFT-side replication instead)")
        key = keys[0]
        if hot_keys is None:
            hot_keys = detect_hot_keys(left, key)
        hot_list = list(hot_keys)
        if hot_list:
            salted = True
            hot_ref = ray.put(set(hot_list))
            n_salt = int(salt)

            def salt_left(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                s = np.zeros(len(df), dtype=np.int64)
                hot = df[key].isin(ray.get(hot_ref)).to_numpy()
                s[hot] = np.arange(int(hot.sum()), dtype=np.int64) % n_salt
                df["__salt"] = s
                return df

            def explode_right(df: pd.DataFrame) -> pd.DataFrame:
                hot = df[key].isin(ray.get(hot_ref)).to_numpy()
                cold = df[~hot].copy()
                cold["__salt"] = np.int64(0)
                hot_rows = df[hot]
                parts = [cold]
                for sv in range(n_salt):
                    rep = hot_rows.copy()
                    rep["__salt"] = np.int64(sv)
                    parts.append(rep)
                return pd.concat(parts, ignore_index=True)

            left = left.map_batches(salt_left, batch_format="pandas")
            right = right.map_batches(explode_right, batch_format="pandas")
            keys = keys + ["__salt"]

    u, lcols, rcols = arrow_tagged_union(left, right, keys, keys, num_buckets)

    def merge_bucket(g: pa.Table) -> pd.DataFrame:
        l, r = split_sides(g, lcols, rcols)
        m = l.to_pandas().merge(r.to_pandas(), on=keys, how=how)
        if salted:
            m = m.drop(columns=["__salt"])
        return project(m) if project is not None else m

    return u.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")


def semi_join(
    large: "ray.data.Dataset",
    key_values,
    on: str,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Semi/anti join: broadcast the key set, filter inside map_batches."""
    key_set_ref = ray.put(frozenset(key_values))

    class Filt:
        def __init__(self):
            self.keys = ray.get(key_set_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = batch[on].isin(self.keys)
            return batch[~mask] if anti else batch[mask]

    return large.map_batches(Filt, batch_format="pandas", batch_size=8192,
                             concurrency=(1, 4))


def shuffle_semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    num_buckets: int = 16,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Partitioned semi/anti join for a right side too large to broadcast:
    both sides bucket on the key hash, each co-grouped bucket keeps the
    left rows whose key does (not, for ``anti``) appear among the bucket's
    right keys. Left columns only; right-side duplicates cannot multiply
    rows (set membership, not a merge). Left payload columns ride the
    shuffle as typed-null-padded Arrow columns (never NaN-promoted)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    u, lcols, _ = arrow_tagged_union(
        left, right.select_columns([on]), [on], [on], num_buckets)

    def filter_bucket(g: pa.Table) -> pa.Table:
        l, r = split_sides(g, lcols, [on])
        # null keys never match: dropped by semi, kept by anti (pandas
        # isin behavior, matching SQL ANTI JOIN)
        hit = pc.fill_null(
            pc.is_in(l.column(on), value_set=pc.unique(r.column(on))), False)
        return l.filter(pc.invert(hit) if anti else hit)

    return u.groupby("__bucket").map_groups(filter_bucket,
                                            batch_format="pyarrow")


def set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    cols: str | list[str],
    op: str = "intersect",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """SQL ``INTERSECT`` / ``EXCEPT`` (distinct set semantics) over the
    given column tuple.

    Scale shape: each side projects to ``cols`` and locally dedups per
    batch BEFORE the shuffle (so at most ``batches x bucket-distinct``
    rows move, not the raw row count), then one bucketed exchange and a
    vectorized pandas merge inside each bucket task emits the bucket's
    answer. Null key tuples compare equal (pandas merge matches NaN keys),
    matching SQL set-operation semantics where ``NULL INTERSECT NULL``
    yields a row. Output: the distinct ``cols`` rows of the result.

    Both sides are projected to the SAME column tuple, so the tag/bucket
    columns are attached in the dedup pass itself — no schema
    introspection (``Dataset.schema()`` returns None when a side's
    filters leave every block empty) and no null padding needed.
    """
    import pyarrow as pa

    if op not in ("intersect", "except"):
        raise ValueError(f"set_op: op must be intersect|except, got {op!r}")
    cols = [cols] if isinstance(cols, str) else list(cols)

    def side_prep(tag: int):
        def f(t: pa.Table) -> pa.Table:
            # local distinct in Arrow C++ (group_by with no aggregates),
            # no pandas round-trip on the pre-shuffle hot path
            d = t.select(cols).group_by(cols).aggregate([])
            b = (_key_hash(d, cols) % np.uint64(num_buckets)).astype(np.int64)
            d = d.append_column("__bucket", pa.array(b, pa.int64()))
            return d.append_column(
                "__side", pa.array(np.full(d.num_rows, tag, np.int8)))
        return f

    lp = left.select_columns(cols).map_batches(
        side_prep(0), batch_format="pyarrow", batch_size=131072)
    rp = right.select_columns(cols).map_batches(
        side_prep(1), batch_format="pyarrow", batch_size=131072)
    u = lp.union(rp)

    def bucket(g: pa.Table) -> pd.DataFrame:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        base = g.drop_columns(["__bucket", "__side"])
        ldf = base.filter(pa.array(side == 0)).to_pandas().drop_duplicates()
        rdf = base.filter(pa.array(side == 1)).to_pandas().drop_duplicates()
        if op == "intersect":
            return ldf.merge(rdf, on=cols, how="inner")
        m = ldf.merge(rdf, on=cols, how="left", indicator=True)
        return m[m["_merge"] == "left_only"].drop(columns=["_merge"])

    return u.groupby("__bucket").map_groups(bucket, batch_format="pyarrow")


def band_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_l: str,
    key_r: str,
    x_l: str,
    x_r: str,
    delta: int,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Band (interval-distance) join: all pairs with
    ``|left.x_l - right.x_r| <= delta`` over INTEGER value columns —
    the row-pair counterpart of the range-interval AGGREGATE join
    (``asof.range_agg_join``), e.g. near-duplicate prices, timestamps
    within a tolerance, sensor alignment.

    Scale shape: grid-cell partitioning — each side's value maps to cell
    ``x // delta``; any qualifying pair's cells differ by at most 1, so
    LEFT rows replicate into cells ``{c-1, c, c+1}`` (3× one side, never
    a cross product) and RIGHT rows post once, meeting in the right's
    own cell (each pair meets EXACTLY once — no output dedup needed).
    One cell-hash bucketed exchange; inside each bucket task one
    vectorized pass per cell segment: rights sorted by value, each left
    binary-searches its ``[x-delta, x+delta]`` window (the searchsorted
    bounds ARE the verify) and pairs enumerate with the repeat/offset
    trick. Output: ``(key_l, key_r, x_l, x_r)``.
    """
    import pyarrow as pa

    if delta < 0:
        raise ValueError("band_join: delta must be >= 0")
    step = max(int(delta), 1)  # delta=0 -> exact-value join, cell = x
    # output column names; suffix on collision (self-joins)
    okl, okr = (key_l, key_r) if key_l != key_r else (f"{key_l}_l",
                                                      f"{key_r}_r")
    oxl, oxr = (x_l, x_r) if x_l != x_r else (f"{x_l}_l", f"{x_r}_r")

    def side_prep(side: int, key: str, x: str, replicate: bool):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            xv = t.column(x).to_numpy(zero_copy_only=False).astype(np.int64)
            cell = xv // np.int64(step)
            if replicate:
                k = np.tile(k, 3)
                xv = np.tile(xv, 3)
                cell = np.concatenate([cell - 1, cell, cell + 1])
            b = (cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 % np.uint64(num_buckets)).astype(np.int64)
            return pa.table({
                "key": pa.array(k), "x": pa.array(xv, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
                "__side": pa.array(np.full(xv.size, side, np.int8)),
            })
        return f

    lp = left.select_columns([key_l, x_l]).map_batches(
        side_prep(0, key_l, x_l, True), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=131072)
    rp = right.select_columns([key_r, x_r]).map_batches(
        side_prep(1, key_r, x_r, False), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=131072)
    u = lp.union(rp)

    def bucket(g: pa.Table) -> pd.DataFrame:
        # cell = x // step is MONOTONE in x, so the bucket's rights
        # sorted by x are also grouped by cell with contiguous value
        # ranges [c*step, (c+1)*step). Each left replica's per-cell
        # match window is therefore its [x-delta, x+delta] band clamped
        # to the target cell's value range — ONE vectorized searchsorted
        # over the whole bucket, no per-cell Python loop.
        side = g.column("__side").to_numpy(zero_copy_only=False)
        xs = g.column("x").to_numpy(zero_copy_only=False)
        cell = g.column("cell").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        lm = side == 0
        lx, lk, lcell = xs[lm], keys[lm], cell[lm]
        rx, rk = xs[~lm], keys[~lm]
        empty = pd.DataFrame({okl: np.empty(0, keys.dtype),
                              okr: np.empty(0, keys.dtype),
                              oxl: np.empty(0, np.int64),
                              oxr: np.empty(0, np.int64)})
        if lx.size == 0 or rx.size == 0:
            return empty
        ro = np.argsort(rx, kind="stable")
        rx, rk = rx[ro], rk[ro]
        st = np.int64(step)
        lo_v = np.maximum(lx - np.int64(delta), lcell * st)
        hi_v = np.minimum(lx + np.int64(delta), (lcell + 1) * st - 1)
        lo = np.searchsorted(rx, lo_v, side="left")
        hi = np.searchsorted(rx, hi_v, side="right")
        cnt = np.maximum(hi - lo, 0)
        keep = cnt > 0
        if not keep.any():
            return empty
        lo, cnt = lo[keep], cnt[keep]
        off = np.zeros(cnt.size + 1, np.int64)
        np.cumsum(cnt, out=off[1:])
        t = np.arange(int(off[-1]), dtype=np.int64)
        gi = np.searchsorted(off, t, side="right") - 1
        j = lo[gi] + (t - off[gi])
        li = np.flatnonzero(keep)[gi]
        return pd.DataFrame({okl: lk[li], okr: rk[j],
                             oxl: lx[li], oxr: rx[j]})

    return u.groupby("__bucket").map_groups(bucket, batch_format="pyarrow")


def interval_join(
    intervals: "ray.data.Dataset",
    points: "ray.data.Dataset",
    key_i: str,
    lo: str,
    hi: str,
    key_p: str,
    x: str,
    step: int,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Point-in-interval join: all (interval, point) pairs with
    ``lo <= x <= hi`` over INTEGER columns — validity windows, session
    membership, time-range containment.

    Scale shape: the :func:`band_join` grid generalized to variable
    widths — each interval replicates into the ``(hi-lo)//step + 1``
    (+1 boundary) cells it overlaps, points post once at ``x // step``
    and each qualifying pair meets EXACTLY once in the point's own cell.
    Pick ``step`` near the typical interval width so replication stays
    O(1); a single huge interval degrades to its width/step replicas
    (skew is per-interval and visible, never a cross product). Inside
    each bucket ONE vectorized pass: points sorted by value (cells are
    monotone in x, so cell grouping is value-contiguous), every interval
    replica binary-searches its clamped [lo, hi] window. Output:
    ``(key_i, key_p, x)``.
    """
    import pyarrow as pa

    if step <= 0:
        raise ValueError("interval_join: step must be > 0")
    st = np.int64(step)

    def iv_prep(t: pa.Table) -> pa.Table:
        k = t.column(key_i).to_numpy(zero_copy_only=False)
        l = t.column(lo).to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column(hi).to_numpy(zero_copy_only=False).astype(np.int64)
        ok = h >= l
        k, l, h = k[ok], l[ok], h[ok]
        c0, c1 = l // st, h // st
        reps = (c1 - c0 + 1)
        idx = np.repeat(np.arange(k.size, dtype=np.int64), reps)
        starts = np.zeros(k.size + 1, np.int64)
        np.cumsum(reps, out=starts[1:])
        cell = (np.arange(int(starts[-1]), dtype=np.int64)
                - np.repeat(starts[:-1], reps) + np.repeat(c0, reps))
        b = (cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "key": pa.array(k[idx]),
            "lo": pa.array(l[idx], pa.int64()),
            "hi": pa.array(h[idx], pa.int64()),
            "cell": pa.array(cell, pa.int64()),
            "__bucket": pa.array(b, pa.int64()),
            "__side": pa.array(np.zeros(cell.size, np.int8)),
        })

    def pt_prep(t: pa.Table) -> pa.Table:
        k = t.column(key_p).to_numpy(zero_copy_only=False)
        xv = t.column(x).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = xv // st
        b = (cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "key": pa.array(k),
            "lo": pa.array(xv, pa.int64()),   # point value rides in lo
            "hi": pa.array(xv, pa.int64()),
            "cell": pa.array(cell, pa.int64()),
            "__bucket": pa.array(b, pa.int64()),
            "__side": pa.array(np.ones(cell.size, np.int8)),
        })

    ip = intervals.select_columns([key_i, lo, hi]).map_batches(
        iv_prep, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072)
    pp = points.select_columns([key_p, x]).map_batches(
        pt_prep, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072)
    u = ip.union(pp)
    okp = key_p if key_p != key_i else f"{key_p}_p"
    oxp = x

    def bucket(g: pa.Table) -> pd.DataFrame:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        lo_a = g.column("lo").to_numpy(zero_copy_only=False)
        hi_a = g.column("hi").to_numpy(zero_copy_only=False)
        cell = g.column("cell").to_numpy(zero_copy_only=False)
        im = side == 0
        ik, il, ih, ic = keys[im], lo_a[im], hi_a[im], cell[im]
        pk, px = keys[~im], lo_a[~im]
        empty = pd.DataFrame({key_i: np.empty(0, keys.dtype),
                              okp: np.empty(0, keys.dtype),
                              oxp: np.empty(0, np.int64)})
        if ik.size == 0 or pk.size == 0:
            return empty
        po = np.argsort(px, kind="stable")
        px, pk = px[po], pk[po]
        lo_v = np.maximum(il, ic * st)
        hi_v = np.minimum(ih, (ic + 1) * st - 1)
        l_ = np.searchsorted(px, lo_v, side="left")
        h_ = np.searchsorted(px, hi_v, side="right")
        cnt = np.maximum(h_ - l_, 0)
        keep = cnt > 0
        if not keep.any():
            return empty
        l_, cnt = l_[keep], cnt[keep]
        off = np.zeros(cnt.size + 1, np.int64)
        np.cumsum(cnt, out=off[1:])
        t = np.arange(int(off[-1]), dtype=np.int64)
        gi = np.searchsorted(off, t, side="right") - 1
        j = l_[gi] + (t - off[gi])
        ii = np.flatnonzero(keep)[gi]
        return pd.DataFrame({key_i: ik[ii], okp: pk[j], oxp: px[j]})

    return u.groupby("__bucket").map_groups(bucket, batch_format="pyarrow")


def interval_overlap_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_l: str,
    lo_l: str,
    hi_l: str,
    key_r: str,
    lo_r: str,
    hi_r: str,
    step: int,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Interval×interval OVERLAP join: all (left, right) pairs whose
    closed INTEGER intervals intersect — ``lo_l <= hi_r AND lo_r <=
    hi_l`` (SQL OVERLAPS on inclusive bounds) — validity-window
    reconciliation, sessions × promotions (VERDICT r4 #3).

    Scale shape: :func:`interval_join`'s variable-width grid with BOTH
    sides replicating into their ``(hi-lo)//step + 1`` cells. A
    qualifying pair is emitted exactly once, in the canonical cell
    containing the overlap's START ``max(lo_l, lo_r)`` (cells are
    monotone in value, so that cell is shared by both replicas sets).
    The kernel decomposes disjointly by which side starts the overlap:

    * right starts at-or-after left (``lo_r >= lo_l``): every left
      replica binary-searches the bucket's NATIVE right starts (rows
      whose ``lo_r`` lies in their own replica cell) within
      ``[lo_l, hi_l]`` clamped to the cell — point-in-interval with the
      right's start as the point;
    * left starts strictly after (``lo_l > lo_r``): the mirror pass
      with a strict lower bound, so ``lo_l == lo_r`` ties count once.

    Both passes are whole-bucket searchsorted — no per-cell loop. Output
    ``(key_l, key_r, lo_l, hi_l, lo_r, hi_r)`` (key names suffixed _l/_r
    on collision). Pick ``step`` near the typical interval width; a
    single huge interval degrades to width/step replicas (visible skew,
    never a cross product).
    """
    import pyarrow as pa

    if step <= 0:
        raise ValueError("interval_overlap_join: step must be > 0")
    st = np.int64(step)
    okl, okr = (key_l, key_r) if key_l != key_r else (f"{key_l}_l",
                                                      f"{key_r}_r")
    oll, ohl = (lo_l, hi_l) if lo_l != lo_r else (f"{lo_l}_l", f"{hi_l}_l")
    olr, ohr = (lo_r, hi_r) if lo_l != lo_r else (f"{lo_r}_r", f"{hi_r}_r")

    def side_prep(side: int, key: str, lo: str, hi: str):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(key).to_numpy(zero_copy_only=False)
            l = t.column(lo).to_numpy(zero_copy_only=False).astype(np.int64)
            h = t.column(hi).to_numpy(zero_copy_only=False).astype(np.int64)
            ok = h >= l
            k, l, h = k[ok], l[ok], h[ok]
            c0, c1 = l // st, h // st
            reps = c1 - c0 + 1
            idx = np.repeat(np.arange(k.size, dtype=np.int64), reps)
            starts = np.zeros(k.size + 1, np.int64)
            np.cumsum(reps, out=starts[1:])
            cell = (np.arange(int(starts[-1]), dtype=np.int64)
                    - np.repeat(starts[:-1], reps) + np.repeat(c0, reps))
            b = (cell.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 % np.uint64(num_buckets)).astype(np.int64)
            return pa.table({
                "key": pa.array(k[idx]),
                "lo": pa.array(l[idx], pa.int64()),
                "hi": pa.array(h[idx], pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "__bucket": pa.array(b, pa.int64()),
                "__side": pa.array(np.full(cell.size, side, np.int8)),
            })
        return f

    lp = left.select_columns([key_l, lo_l, hi_l]).map_batches(
        side_prep(0, key_l, lo_l, hi_l), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=131072)
    rp = right.select_columns([key_r, lo_r, hi_r]).map_batches(
        side_prep(1, key_r, lo_r, hi_r), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=131072)
    u = lp.union(rp)

    def _pass(qk, ql, qh, qc, tk, tl, th, strict: bool):
        """Query replicas × native target STARTS: one clamped
        searchsorted window per query replica over target lo (sorted).
        Returns (query_idx, target_idx) into the passed arrays."""
        e = (np.empty(0, np.int64), np.empty(0, np.int64))
        if qk.size == 0 or tl.size == 0:
            return e
        to = np.argsort(tl, kind="stable")
        tls = tl[to]
        lo_v = np.maximum(ql + (1 if strict else 0), qc * st)
        hi_v = np.minimum(qh, (qc + 1) * st - 1)
        l_ = np.searchsorted(tls, lo_v, side="left")
        h_ = np.searchsorted(tls, hi_v, side="right")
        cnt = np.maximum(h_ - l_, 0)
        keep = cnt > 0
        if not keep.any():
            return e
        l_, cnt = l_[keep], cnt[keep]
        off = np.zeros(cnt.size + 1, np.int64)
        np.cumsum(cnt, out=off[1:])
        t = np.arange(int(off[-1]), dtype=np.int64)
        gi = np.searchsorted(off, t, side="right") - 1
        j = to[l_[gi] + (t - off[gi])]
        qi = np.flatnonzero(keep)[gi]
        return qi, j

    def bucket(g: pa.Table) -> pd.DataFrame:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        keys = g.column("key").to_numpy(zero_copy_only=False)
        lo_a = g.column("lo").to_numpy(zero_copy_only=False)
        hi_a = g.column("hi").to_numpy(zero_copy_only=False)
        cell = g.column("cell").to_numpy(zero_copy_only=False)
        lm = side == 0
        native = (lo_a // st) == cell
        lk, ll, lh, lc = keys[lm], lo_a[lm], hi_a[lm], cell[lm]
        rk, rl, rh, rc = keys[~lm], lo_a[~lm], hi_a[~lm], cell[~lm]
        ln, rn = native[lm], native[~lm]
        # pass 1: right starts inside left (ties included)
        qi1, ti1 = _pass(lk, ll, lh, lc,
                         rk[rn], rl[rn], rh[rn], strict=False)
        # pass 2: left starts strictly inside right
        qi2, ti2 = _pass(rk, rl, rh, rc,
                         lk[ln], ll[ln], lh[ln], strict=True)
        rn_ix = np.flatnonzero(rn)
        ln_ix = np.flatnonzero(ln)
        li = np.concatenate([qi1, ln_ix[ti2]])
        ri = np.concatenate([rn_ix[ti1], qi2])
        return pd.DataFrame({
            okl: lk[li], okr: rk[ri],
            oll: ll[li], ohl: lh[li],
            olr: rl[ri], ohr: rh[ri],
        })

    return u.groupby("__bucket").map_groups(bucket, batch_format="pyarrow")


def bloom_semi_join(
    large: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    on: str,
    bits_log2: int = 23,
    n_hashes: int = 4,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Semi-join against a MEDIUM key side: Bloom prefilter, then exact
    verification — the result equals a plain semi-join exactly (Bloom
    filters have false positives only; verification removes them).

    Scale shape: the broadcast is ``2^bits_log2 / 8`` bytes (1 MiB at the
    default) however many keys there are — where broadcasting the exact
    key set (``semi_join``) would ship GBs — and it is built in ONE
    streaming pass over the key side (the driver holds the bitmap plus
    one batch at a time, never the key set). The prefilter then drops
    non-members inside ``map_batches`` with zero shuffle at false-positive
    rate ~(1-e^(-kn/m))^k, and only the surviving sliver pays the
    partitioned exact semi-join. Double hashing h1 + i*h2 (Kirsch &
    Mitzenmacher 2006) derives all probes from two 64-bit hashes.
    """
    m = np.uint64(1 << bits_log2)
    mask = np.uint64((1 << bits_log2) - 1)
    bits = np.zeros(1 << max(bits_log2 - 6, 0), dtype=np.uint64)

    def probe_positions(vals: pd.Series) -> np.ndarray:
        h1 = pd.util.hash_pandas_object(vals, index=False).to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h2 = (h1 ^ np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
            h2 |= np.uint64(1)  # odd, so probes cycle through the table
            pos = (h1[:, None] + np.arange(n_hashes, dtype=np.uint64)[None, :] * h2[:, None])
        return (pos & mask).reshape(-1)

    for batch in keys.select_columns([on]).iter_batches(
            batch_size=65536, batch_format="pandas"):
        p = probe_positions(batch[on])
        np.bitwise_or.at(bits, (p >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (p & np.uint64(63)))
    bits_ref = ray.put(bits)

    class BloomFilt:
        def __init__(self):
            self.bits = ray.get(bits_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            p = probe_positions(df[on])
            hit = (self.bits[(p >> np.uint64(6)).astype(np.int64)]
                   >> (p & np.uint64(63))) & np.uint64(1)
            return df[hit.reshape(len(df), n_hashes).all(axis=1)]

    survivors = large.map_batches(BloomFilt, batch_format="pandas",
                                  batch_size=8192, concurrency=(1, 4))
    return shuffle_semi_join(survivors, keys, on, num_buckets=num_buckets)


def skyline_2d(
    ds: "ray.data.Dataset",
    max_col: str,
    min_col: str,
) -> "ray.data.Dataset":
    """2-D skyline (Pareto front): rows NOT dominated by any other row,
    where r2 dominates r1 iff ``r2[max_col] >= r1[max_col]`` AND
    ``r2[min_col] <= r1[min_col]`` with at least one strict — the
    NOT-EXISTS inequality self-anti-join. Duplicate points (equal on
    both axes) all survive. Values are only COMPARED, never computed
    on, so float columns carry no arithmetic-parity risk.

    Scale shape: the front of the whole dataset is a subset of the
    union of per-block fronts (dominance is transitive), so one
    vectorized local-front pass per block cuts the data to candidates
    — expected O(log n) per block on independently-distributed axes —
    and ONE final task runs the same kernel over the merged candidate
    set. No driver materialization; worst case (input already a front)
    the final task sees the whole input, the same degenerate bound
    every skyline algorithm has.
    """
    def front(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        if df[max_col].isna().any() or df[min_col].isna().any():
            raise ValueError(
                "skyline_2d: NULL axis values are not supported (SQL "
                "three-valued dominance differs from any total order)")
        # sort: min_col asc, max_col desc — one lexsort, then boundary
        # masks; within an equal-min_col run the first row holds the max
        df = df.sort_values([min_col, max_col], kind="stable",
                            ascending=[True, False]).reset_index(drop=True)
        mn = df[min_col]
        new_mn = ~mn.eq(mn.shift()).to_numpy()
        new_mn[0] = True
        pos = np.arange(len(df), dtype=np.int64)
        grp_first = np.maximum.accumulate(np.where(new_mn, pos, 0))
        mxv = df[max_col].to_numpy()
        group_best = mxv[grp_first]
        # best max_col among STRICTLY smaller min_col groups: prefix max
        # of group bests shifted one group back, dtype preserved (no
        # float cast — int64 > 2^53 would lose dominance comparisons)
        starts = np.flatnonzero(new_mn)
        gb = np.maximum.accumulate(mxv[starts])
        gidx = np.cumsum(new_mn) - 1
        dominated = mxv < group_best
        later = gidx >= 1
        dominated[later] |= gb[gidx[later] - 1] >= mxv[later]
        return df[~dominated]

    candidates = ds.map_batches(front, batch_format="pandas",
                                batch_size=131072)
    return candidates.repartition(1).map_batches(
        front, batch_format="pandas", batch_size=None)


def mutual_best_match(
    pairs: "ray.data.Dataset",
    left_col: str,
    right_col: str,
    score_col: str,
    mode: str = "max",
) -> "ray.data.Dataset":
    """Reciprocal-best-match 1:1 linkage: from scored candidate pairs,
    keep exactly the pairs where EACH side is the other's best partner
    (ties pinned deterministically to the smallest partner id, the
    ``ROW_NUMBER() OVER (... ORDER BY score DESC, partner) = 1`` order)
    — the standard symmetric-best-match filter entity resolution applies
    after candidate scoring to enforce a 1:1 assignment without solving
    a global matching problem. Mutual-best is a subset of the greedy
    max-weight matching and never assigns one record twice.

    Scale shape: two :func:`~whoiswho_ray.stages.agg.arg_extreme_grouped`
    passes (per-batch one-winner-per-key combiner, then one key-hash
    bucketed exchange each — at most |distinct keys| rows move) + one
    composite-key hash join of the two winner sets (each at most one row
    per entity, so the join input is entity-sized, not pair-sized).
    Output: (left_col, right_col, score_col) for surviving pairs.
    """
    from whoiswho_ray.stages.agg import arg_extreme_grouped

    # two consumers (per-left and per-right winners) — materialize once
    # or the caller's candidate-generation lineage runs twice
    pairs = pairs.materialize()
    best_l = arg_extreme_grouped(pairs, left_col, score_col,
                                 [right_col], mode)
    best_r = arg_extreme_grouped(pairs, right_col, score_col,
                                 [left_col], mode)
    lhs = best_l.map_batches(
        lambda df: df[[left_col, right_col, score_col]],
        batch_format="pandas")
    rhs = best_r.map_batches(
        lambda df: df[[left_col, right_col]], batch_format="pandas")
    return shuffle_hash_join(lhs, rhs, on=[left_col, right_col])


def longest_prefix_join(
    ds: "ray.data.Dataset",
    col: str,
    prefixes,
    out_col: str = "prefix",
) -> "ray.data.Dataset":
    """Longest-prefix-match join — the routing-table lookup (IP/phone
    prefixes, URL path categories): attach to each row the LONGEST
    entry of ``prefixes`` that prefixes ``col``; rows with no match are
    dropped (inner semantics, like the SQL
    ``starts_with`` + argmax-by-length replay).

    Scale shape: the prefix table is the broadcast small side (grouped
    by length once on the driver, shipped in the task closure); each
    batch runs ONE vectorized slice + hash-isin per DISTINCT prefix
    length, longest first, first hit wins — O(#lengths) kernels per
    batch, no shuffle, no per-row Python.
    """
    by_len: dict[int, set] = {}
    for p in prefixes:
        if not p:
            raise ValueError("empty prefix is not allowed")
        by_len.setdefault(len(p), set()).add(str(p))
    lens = sorted(by_len, reverse=True)

    def match(df: pd.DataFrame) -> pd.DataFrame:
        s = df[col].astype(str)
        res = pd.Series([None] * len(df), index=df.index, dtype=object)
        unmatched = np.ones(len(df), dtype=bool)
        for length in lens:
            if not unmatched.any():
                break
            cand = s.str.slice(0, length)
            hit = cand.isin(by_len[length]).to_numpy() & unmatched
            res[hit] = cand[hit]
            unmatched &= ~hit
        out = df.copy()
        out[out_col] = res
        return out[res.notna().to_numpy()]

    return ds.map_batches(match, batch_format="pandas",
                          batch_size=131072)
