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
