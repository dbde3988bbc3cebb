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
    rows (set membership, not a merge)."""
    lcols = left.schema().names

    def bucketed(side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(df[on], index=False).to_numpy()
            out = df[[on]] if side == "r" else df
            out = out.reindex(columns=[on] + [c for c in lcols if c != on])
            out["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
            out["__side"] = side
            return out
        return f

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rkeys = g.loc[g["__side"] == "r", on].unique()
        l = g[g["__side"] == "l"]
        mask = l[on].isin(rkeys)
        return l[~mask if anti else mask][lcols]

    lb = left.map_batches(bucketed("l"), batch_format="pandas")
    rb = right.select_columns([on]).map_batches(bucketed("r"), batch_format="pandas")
    return lb.union(rb).groupby("__bucket").map_groups(
        filter_bucket, batch_format="pandas")


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
