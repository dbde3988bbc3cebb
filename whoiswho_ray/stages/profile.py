"""Data-quality column profiling (Deequ/TFDV-shaped summary stats).

The first thing a 100 TB ingest runs before any transform: per column —
row count, null count, EXACT distinct count, min and max. One streaming
pass computes all scalar partials for every profiled column at once
(O(cols) tiny rows per batch leave the scan); the exact distinct counts
ride a second skinny exchange of per-batch-unique (col, value) pairs —
the shuffle moves each distinct value once per batch it appears in,
never the raw rows. Supports int64 and string columns (the fixture's
types); min/max are formatted to VARCHAR only at the very end so
partials combine under the NATIVE type order ('9' < '10' stays numeric).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def profile_columns(ds: "ray.data.Dataset", cols: list[str]) -> "ray.data.Dataset":
    """Profile ``cols`` → one row per column:
    (col, n_rows, n_null, n_distinct, min_value, max_value) with
    min/max as VARCHAR (NULL when the column is entirely null) and
    n_distinct excluding NULLs (SQL ``count(DISTINCT x)`` semantics).
    """
    from whoiswho_ray.stages.agg import distinct, grouped_agg

    def scalar_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            nn = s.dropna()
            is_int = pd.api.types.is_integer_dtype(s)
            rows.append({
                "col": c,
                "n_rows": np.int64(len(s)),
                "n_null": np.int64(s.isna().sum()),
                "vmin_i": np.int64(nn.min()) if is_int and len(nn) else None,
                "vmax_i": np.int64(nn.max()) if is_int and len(nn) else None,
                "vmin_s": None if is_int else (str(nn.min()) if len(nn) else None),
                "vmax_s": None if is_int else (str(nn.max()) if len(nn) else None),
            })
        out = pd.DataFrame(rows)
        out["vmin_i"] = out["vmin_i"].astype("Int64")
        out["vmax_i"] = out["vmax_i"].astype("Int64")
        return out

    scalars = grouped_agg(
        ds.map_batches(scalar_partial, batch_format="pandas",
                       batch_size=131072),
        "col",
        {"n_rows": ("n_rows", "sum"), "n_null": ("n_null", "sum"),
         "vmin_i": ("vmin_i", "min"), "vmax_i": ("vmax_i", "max"),
         "vmin_s": ("vmin_s", "min"), "vmax_s": ("vmax_s", "max")},
        final="shuffle")

    def value_partial(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for c in cols:
            u = df[c].dropna().unique()
            parts.append(pd.DataFrame({"col": c,
                                       "value": pd.Series(u).astype(str)}))
        return pd.concat(parts, ignore_index=True)

    ndist = grouped_agg(
        distinct(ds.map_batches(value_partial, batch_format="pandas",
                                batch_size=131072),
                 ["col", "value"], final="shuffle"),
        "col", {"n_distinct": (None, "count")}, final="shuffle")

    from whoiswho_ray.stages.joins import shuffle_hash_join

    def fmt(m: pd.DataFrame) -> pd.DataFrame:
        vi = m["vmin_i"]
        min_v = np.where(vi.notna(), vi.astype("Int64").astype(str), m["vmin_s"])
        max_v = np.where(m["vmax_i"].notna(),
                         m["vmax_i"].astype("Int64").astype(str), m["vmax_s"])
        return pd.DataFrame({
            "col": m["col"],
            "n_rows": m["n_rows"].astype("int64"),
            "n_null": m["n_null"].astype("int64"),
            # an entirely-NULL column has no distinct rows to join —
            # count(DISTINCT x) is 0, not absent
            "n_distinct": m["n_distinct"].fillna(0).astype("int64"),
            "min_value": pd.Series(min_v, dtype=object),
            "max_value": pd.Series(max_v, dtype=object),
        })

    return shuffle_hash_join(scalars, ndist, on="col", how="left",
                             project=fmt)
