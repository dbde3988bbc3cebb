"""Window-shaped operators over the events table.

Ray Data has no event-time windowing; per the engine's streaming stance
(SURVEY.md §2.9 — the reference has none either), windows are expressed as
batch groupbys: tumbling = truncate-ts + grouped aggregate; sessions =
per-key sorted gap detection inside ``map_groups``. Both have exact SQL
oracles (``date_trunc`` / ``lag() over``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Mean, Sum


def tumbling_window(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> "ray.data.Dataset":
    """Per (key, time-bucket): count + sum + mean of value.

    Buckets via ``pc.floor_temporal`` (== DuckDB ``date_trunc``)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("window_start", pc.floor_temporal(t.column(ts_col), unit=unit))

    agg = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="avg_value"),
        )
    )
    return agg


def sessionize(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> "ray.data.Dataset":
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. Returns one row per session:
    (user_id, session_id, n_events, session_start, session_end).

    Partitioning assumption (documented per SURVEY.md §2.9): all events of
    one user fit one group; the groupby shuffle co-locates them."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"] if "event_id" in g.columns else [ts_col])
        ts = g[ts_col]
        new_session = (ts.diff() > gap).fillna(True)
        sid = new_session.cumsum()
        out = g.groupby(sid).agg(
            n_events=(ts_col, "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index(drop=True)
        out.insert(0, "session_id", np.arange(1, len(out) + 1))
        out.insert(0, user_col, g[user_col].iloc[0])
        return out

    return ds.groupby(user_col).map_groups(per_user, batch_format="pandas")
