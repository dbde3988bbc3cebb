"""Pre-aggregated grouped aggregation (operator A2/A10 pattern).

A bare ``groupby(key).aggregate(...)`` shuffles every row. This helper
combines inside ``map_batches`` first — one partial row per key per batch
— so the all-to-all moves only partials; the final aggregate runs over a
few thousand rows regardless of input size. This is the pattern the
reference approximates by building its idf dicts corpus-side once
(``/root/reference/whoiswho/character/feature_process.py:36-43``) and the
Ray Data docs recommend for aggregation at scale.

Supported specs: sum, count, min, max, mean (sum+count partials, divided
after the final combine — exact for integer inputs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

_PARTIAL = {"sum": "sum", "count": "count", "min": "min", "max": "max"}
_FINAL = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: str | list[str],
    spec: dict[str, tuple[str | None, str]],
    final: str = "driver",
):
    """spec: out_col -> (src_col, op) with op in sum/count/min/max/mean.
    For count, src_col may be None. Output columns: keys + spec keys.

    ``final='driver'`` (default): the per-batch partials — one row per key
    per batch, small by construction — are tree-combined on the driver with
    one pandas groupby; returns a DataFrame. Right whenever the result
    cardinality is human-scale (reports, dashboards, dimension rollups).
    ``final='shuffle'``: a distributed ``groupby().aggregate`` over the
    partials; returns a Dataset — for unbounded key cardinality.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    from ray.data.aggregate import Max, Min, Sum

    # expand means into sum+count partials
    plan: dict[str, tuple[str | None, str]] = {}
    means: dict[str, tuple[str, str]] = {}
    need_count: str | None = None
    for out, (src, op) in spec.items():
        if op == "mean":
            plan[f"__{out}_sum"] = (src, "sum")
            means[out] = (f"__{out}_sum", "__n")
            need_count = "__n"
        else:
            plan[out] = (src, op)
    if need_count and need_count not in plan:
        plan[need_count] = (None, "count")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for out, (src, op) in plan.items():
            if op == "count":
                cols[out] = g.size()
            else:
                cols[out] = g[src].agg(_PARTIAL[op])
        return pd.DataFrame(cols).reset_index()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=131072)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        for out, (sum_col, n_col) in means.items():
            df[out] = df[sum_col] / df[n_col]
        drop = [c for c in df.columns if c.startswith("__")]
        return df.drop(columns=drop)

    if final == "driver":
        import ray

        parts = [ray.get(r) for r in partials.to_arrow_refs()]
        import pyarrow as pa

        merged = pa.concat_tables(parts, promote_options="default").to_pandas()
        if len(merged) == 0:
            return finish(merged)
        combined = merged.groupby(keys, sort=False, dropna=False).agg(
            {out: _FINAL[op] for out, (src, op) in plan.items()}
        ).reset_index()
        return finish(combined)

    aggs = []
    for out, (src, op) in plan.items():
        cls = {"sum": Sum, "min": Min, "max": Max}[_FINAL[op]]
        aggs.append(cls(out, alias_name=out))
    result = partials.groupby(keys).aggregate(*aggs)
    if means:
        result = result.map_batches(finish, batch_format="pandas")
    return result


def distinct(ds: "ray.data.Dataset", cols: list[str], final: str = "driver"):
    """Distinct rows over cols: local drop_duplicates per batch, then a
    final combine over the (small) survivors — driver-side by default,
    ``final='shuffle'`` for unbounded distinct-value counts."""
    local = ds.map_batches(
        lambda df: df[cols].drop_duplicates(), batch_format="pandas", batch_size=262144
    )
    if final == "driver":
        import pyarrow as pa
        import ray

        parts = [ray.get(r) for r in local.to_arrow_refs()]
        return pa.concat_tables(parts, promote_options="default").to_pandas().drop_duplicates(
        ).reset_index(drop=True)
    from ray.data.aggregate import Count

    return local.groupby(cols).aggregate(Count(alias_name="_n")).select_columns(cols)
