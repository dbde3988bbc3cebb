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


def broadcast_join(
    large: "ray.data.Dataset",
    small: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    """Hash-lookup join against a broadcast small side."""
    small_ref = ray.put(small)

    class Merger:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return large.map_batches(Merger, batch_format="pandas", batch_size=8192,
                             concurrency=(1, 4))


def shuffle_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | list[str],
    num_buckets: int = 16,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Partitioned hash join: bucket both sides on the key hash, union with
    a side tag, co-group by bucket, pandas-merge inside each group."""
    keys = [on] if isinstance(on, str) else list(on)

    lschema = left.schema()
    rschema = right.schema()
    lcols = lschema.names
    rcols = rschema.names
    all_cols = lcols + [c for c in rcols if c not in lcols]

    def _dtypes(schema) -> dict:
        import pyarrow as pa
        out = {}
        for n, t in zip(schema.names, schema.types):
            if isinstance(t, pa.DataType):
                out[n] = pa.schema([pa.field(n, t)]).empty_table().to_pandas().dtypes[n]
            else:  # pandas-backed block schema: numpy dtype or python class
                out[n] = np.dtype(t) if not isinstance(t, np.dtype) else t
        return out

    ldtypes, rdtypes = _dtypes(lschema), _dtypes(rschema)

    def bucketed(side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            # vectorized multi-column hash: combine per-column siphashes
            h = np.zeros(len(df), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for k in keys:
                    h = h * np.uint64(1099511628211) ^ pd.util.hash_pandas_object(
                        df[k], index=False).to_numpy().astype(np.uint64)
            df = df.reindex(columns=all_cols)  # align schemas for union
            df["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
            df["__side"] = side
            return df
        return f

    lb = left.map_batches(bucketed("l"), batch_format="pandas")
    rb = right.map_batches(bucketed("r"), batch_format="pandas")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # restore each side's dtypes (the schema-aligned union introduced
        # NaN-typed columns on the side that lacks them)
        l = g[g["__side"] == "l"][lcols].astype(ldtypes)
        r = g[g["__side"] == "r"][rcols].astype(rdtypes)
        return l.merge(r, on=keys, how=how)

    return lb.union(rb).groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


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
