"""Time-ordered joins: as-of join and range-interval aggregate join.

The reference's nearest analog is its year-proximity candidate filtering
(`/root/reference/whoiswho/featureGenerator/rndFeature/adhoc_features.py`
caps candidate papers by year distance inside per-author loops); here the
capability is promoted to two first-class distributed operators the
Dataset API lacks natively:

* ``asof_join`` — for each left row, the right row of the same key with
  the greatest right-time <= left-time (backward as-of, inner). One hash
  shuffle on the key; ``pd.merge_asof`` (a C merge kernel) inside each
  bucket task. Ties on (key, right-time) are broken deterministically by
  ``tie_break`` (max wins) so the result is oracle-exact against DuckDB's
  ``ASOF JOIN`` over a tie-deduped right side.
* ``range_agg_join`` — per left row, COUNT + integer-cents SUM of right
  rows of the same key with right-time in ``(left-time - window,
  left-time]``. Same single shuffle; inside the bucket the aggregate is
  fully vectorized: rank-compress times, build a composite
  (key_code, time_rank) sort key over the right side, two global
  ``searchsorted`` calls for the interval bounds, and a prefix-sum for
  the windowed sums — no per-row or per-key Python loop.

Partitioning assumption (SURVEY.md §2.9 discipline): all right-side rows
of one key fit one hash bucket's task. Buckets default to 64 so skew in
one key spreads only within its bucket; salt upstream if a single key's
history exceeds task memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _pd_dtypes(schema) -> dict:
    """Pandas dtypes for a Ray Dataset schema (Arrow- or pandas-backed)."""
    import pyarrow as pa

    out = {}
    for n, t in zip(schema.names, schema.types):
        if isinstance(t, pa.DataType):
            out[n] = pa.schema([pa.field(n, t)]).empty_table().to_pandas().dtypes[n]
        else:
            out[n] = t if isinstance(t, np.dtype) else np.dtype(t)
    return out


def _tagged_union(left, right, lkey: str, rkey: str, num_buckets: int):
    """Schema-aligned union of two datasets with a side tag and a hash
    bucket on the join key; returns (unioned, lcols, rcols, ldtypes,
    rdtypes). Same physical pattern as ``joins.shuffle_hash_join``."""
    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    all_cols = lcols + [c for c in rcols if c not in lcols]
    ldtypes, rdtypes = _pd_dtypes(lschema), _pd_dtypes(rschema)

    def bucketed(side: str, key: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(df[key], index=False).to_numpy()
            df = df.reindex(columns=all_cols)
            df["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
            df["__side"] = side
            return df
        return f

    lb = left.map_batches(bucketed("l", lkey), batch_format="pandas")
    rb = right.map_batches(bucketed("r", rkey), batch_format="pandas")
    return lb.union(rb), lcols, rcols, ldtypes, rdtypes


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: tuple[str, str] | str,
    left_on: str,
    right_on: str,
    right_cols: list[str] | None = None,
    tie_break: str | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Backward inner as-of join (latest right row at or before left time).

    ``by`` is the equality key: one column name shared by both sides or a
    ``(left_key, right_key)`` pair. ``tie_break``: when several right rows
    share (key, right_on), keep the one with the max ``tie_break`` value —
    mirrors a GROUP BY dedup in the SQL oracle so both engines pick the
    same row.
    """
    lkey, rkey = (by, by) if isinstance(by, str) else by
    rcols_out = right_cols if right_cols is not None else None

    u, lcols, rcols, ldtypes, rdtypes = _tagged_union(
        left, right, lkey, rkey, num_buckets)
    keep_r = [rkey, right_on] + [c for c in (rcols_out or rcols)
                                 if c not in (rkey, right_on)]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][lcols].astype(ldtypes)
        r = g[g["__side"] == "r"][rcols].astype(rdtypes)[keep_r]
        if len(r) and tie_break is not None:
            r = (r.sort_values([rkey, right_on, tie_break], kind="stable")
                  .drop_duplicates([rkey, right_on], keep="last"))
        l = l.sort_values(left_on, kind="stable")
        r = r.sort_values(right_on, kind="stable")
        out = pd.merge_asof(
            l, r, left_on=left_on, right_on=right_on,
            left_by=lkey, right_by=rkey,
            direction="backward", allow_exact_matches=True)
        # inner semantics: drop left rows with no match, restore int dtypes
        out = out.dropna(subset=[right_on])
        for c in keep_r:
            if c != rkey:
                out[c] = out[c].astype(rdtypes[c])
        return out.drop(columns=[rkey]) if rkey != lkey else out

    return (u.groupby("__bucket")
             .map_groups(lambda g: merge_bucket(g.drop(columns=["__bucket"])),
                         batch_format="pandas"))


def range_agg_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: tuple[str, str] | str,
    left_on: str,
    right_on: str,
    value_col: str,
    window: "pd.Timedelta",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Windowed-interval aggregate join: per left row, count and
    integer-cents sum of same-key right rows with
    ``right_on`` in ``(left_on - window, left_on]``.

    Returns the left columns plus ``n_right`` (int64) and ``sum_cents``
    (int64). Sums are exact by NOTES.md rule 7: per-row
    ``floor(v*100+0.5)`` then integer prefix-sums — never an
    order-dependent float sum.
    """
    lkey, rkey = (by, by) if isinstance(by, str) else by
    win_ns = np.int64(pd.Timedelta(window).value)

    u, lcols, rcols, ldtypes, rdtypes = _tagged_union(
        left, right, lkey, rkey, num_buckets)

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][lcols].astype(ldtypes)
        out = l.copy()
        if not len(l):
            return out.assign(n_right=np.int64(0), sum_cents=np.int64(0)).iloc[:0]
        r = g[g["__side"] == "r"][rcols].astype(rdtypes)
        r = r.sort_values([rkey, right_on], kind="stable")
        rk = r[rkey].to_numpy()
        rt = r[right_on].to_numpy().astype("datetime64[ns]").astype(np.int64)
        cents = np.floor(r[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        csum = np.concatenate([[np.int64(0)], np.cumsum(cents)])

        lk = l[lkey].to_numpy()
        lt = l[left_on].to_numpy().astype("datetime64[ns]").astype(np.int64)
        lo_b, hi_b = lt - win_ns, lt

        # rank-compress all times so interval bounds share the right side's
        # ordinal space, then one composite (key_code, rank) searchsorted
        # per bound — vectorized over every left row at once
        all_t = np.unique(np.concatenate([rt, lo_b, hi_b]))
        m = np.int64(len(all_t) + 1)
        keys_all = np.unique(np.concatenate([rk, lk]))
        rkc = np.searchsorted(keys_all, rk).astype(np.int64)
        lkc = np.searchsorted(keys_all, lk).astype(np.int64)
        comp_r = rkc * m + np.searchsorted(all_t, rt)  # sorted by construction
        lo_idx = np.searchsorted(comp_r, lkc * m + np.searchsorted(all_t, lo_b),
                                 side="right")  # strict: rank > rank(lo)
        hi_idx = np.searchsorted(comp_r, lkc * m + np.searchsorted(all_t, hi_b),
                                 side="right")  # inclusive: rank <= rank(hi)
        out["n_right"] = (hi_idx - lo_idx).astype(np.int64)
        out["sum_cents"] = csum[hi_idx] - csum[lo_idx]
        return out

    return (u.groupby("__bucket")
             .map_groups(lambda g: agg_bucket(g.drop(columns=["__bucket"])),
                         batch_format="pandas"))
