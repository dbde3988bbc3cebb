"""Changelog compaction — CDC upsert/delete apply (merge-on-read).

The lakehouse primitive a 100 TB pipeline hits the moment its input is a
mutation stream instead of an append-only log: collapse a keyed changelog
to its final snapshot — for each primary key, the LAST change under a
total order wins, and a tombstone op deletes the key from the snapshot.

Scale shape: one per-batch partial compaction (each batch keeps at most
one row per key it sees — the classic combiner, so the shuffle moves
O(distinct keys per batch), not O(rows)) + ONE key-hash bucketed final
pass. The kernel is a sort + boundary mask (`duplicated(keep='last')`)
— no per-key Python. Tombstoned keys are dropped AFTER the final
compaction (a delete must still shadow earlier upserts of its key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def apply_changelog(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: list[str],
    op_col: str,
    tombstones: tuple = (),
    payload_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """Collapse a changelog to its snapshot: last row per ``key`` under
    ``order_cols`` (must totally order rows within a key — include a
    unique tie-break), minus keys whose last op is in ``tombstones``.

    Returns (key, *order_cols, op_col, *payload_cols) for surviving keys.
    NULL keys compact together (pandas ``duplicated`` groups NaN), which
    matches SQL ``PARTITION BY`` (ADVICE r4 NULL-key discipline).
    """
    from whoiswho_ray.stages.agg import group_apply

    cols = [key, *order_cols, op_col, *(payload_cols or [])]
    sort_cols = [key, *order_cols]

    def last_per_key(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(sort_cols, kind="stable")
        return df[~df[key].duplicated(keep="last")]

    partial = ds.map_batches(
        lambda df: last_per_key(df[cols]), batch_format="pandas",
        batch_size=131072)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = last_per_key(df)
        if tombstones:
            out = out[~out[op_col].isin(tombstones)]
        return out.reset_index(drop=True)

    return group_apply(partial, key, final, batch_format="pandas",
                       whole_bucket=True)


def _null_stable_change(s: pd.Series) -> "pd.Series":
    """True where row differs from the previous row, NULLs equal."""
    prev = s.shift()
    return ~(s.eq(prev) | (s.isna() & prev.isna()))


def scd2_build(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    payload_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    current_sentinel=None,
) -> "ray.data.Dataset":
    """Slowly-Changing-Dimension Type 2 build: collapse a keyed change
    stream into versioned dimension rows with validity ranges.

    Per key (ordered by ``order_col`` + ``tiebreak_cols``), a new VERSION
    opens only when any payload column CHANGES (IS DISTINCT FROM the
    previous row — NULL-stable, so NULL→NULL is not a change); runs of
    identical payloads collapse into the version that opened them. Each
    version row carries ``valid_from`` (= its opening row's order value),
    ``valid_to`` (= next version's valid_from, or ``current_sentinel``
    for the open version) and ``is_current`` (int64 0/1 — int so the
    DuckDB oracle types identically).

    Scale shape: ONE key-hash bucketed exchange (whole rows must
    co-locate — SCD2's run-collapse is inherently order-dependent per
    key, so unlike :func:`apply_changelog` there is no lossless per-batch
    combiner); inside each bucket the kernel is fully vectorized across
    keys — one sort + NULL-stable boundary masks + a shift for the lead,
    no per-key Python. Project to (key, order, tiebreaks, payload)
    before calling if the stream carries more columns.
    """
    from whoiswho_ray.stages.agg import group_apply

    ties = list(tiebreak_cols or [])
    sort_cols = [key, order_col, *ties]
    cols = [key, order_col, *ties, *payload_cols]

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                key: df.get(key, pd.Series(dtype=object)),
                "valid_from": pd.Series(dtype=object),
                "valid_to": pd.Series(dtype=object),
                "is_current": pd.Series(dtype=np.int64),
                **{c: pd.Series(dtype=object) for c in payload_cols},
            })
        df = df[cols].sort_values(sort_cols, kind="stable")
        change = _null_stable_change(df[key])
        for c in payload_cols:
            change |= _null_stable_change(df[c])
        out = df[change].reset_index(drop=True)
        nxt_key = out[key].shift(-1)
        same_next = (out[key].eq(nxt_key)
                     | (out[key].isna() & nxt_key.isna()))
        valid_to = out[order_col].shift(-1)
        if current_sentinel is not None:
            valid_to = valid_to.where(same_next, current_sentinel)
        else:
            valid_to = valid_to.where(same_next)
        res = pd.DataFrame({key: out[key],
                            "valid_from": out[order_col],
                            "valid_to": valid_to,
                            "is_current":
                                (~same_next).to_numpy().astype(np.int64)})
        for c in payload_cols:
            res[c] = out[c]
        return res

    return group_apply(ds, key, bucket, batch_format="pandas",
                       whole_bucket=True)
