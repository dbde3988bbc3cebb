"""Phonetic encoding for blocking — vectorized American Soundex.

The classic ER blocking key (Russell 1918; the variant every SQL engine
ships): first letter + the first three consonant-class digits, adjacent
equal classes collapsed, vowels dropped AFTER the collapse. This module
implements the SIMPLIFIED table (H and W class 0, i.e. they separate
runs like vowels do — the MySQL/standard-SQL behaviour) because it is
exactly replayable in DuckDB (translate + indexed list_filter); the
archival variant's H/W transparency is documented out of scope.

The whole batch is encoded with ZERO per-row Python: the cleaned
uppercase names live in one Arrow buffer; a 256-entry LUT maps bytes to
class digits, boundary masks do the run collapse, and two
searchsorted-rank passes pick "drop the first run, keep the first three
non-zero digits per row". Cost is O(total bytes) numpy regardless of
row count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# A  B  C  D  E  F  G  H  I  J  K  L  M  N  O  P  Q  R  S  T  U  V  W  X  Y  Z
_CODES = b"01230120022455012623010202"
_LUT = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(_CODES):
    _LUT[ord("A") + _i] = _c


def soundex_array(arr) -> pa.Array:
    """Soundex of every element of a string Array/ChunkedArray; nulls
    stay null, empty-after-cleaning strings encode to ''."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    clean = pc.replace_substring_regex(pc.utf8_upper(arr), "[^A-Z]", "")
    if isinstance(clean, pa.ChunkedArray):
        clean = clean.combine_chunks()
    n = len(clean)
    if n == 0:
        return pa.array([], pa.string())
    off = np.frombuffer(clean.buffers()[1], np.int32)[
        clean.offset:clean.offset + n + 1].astype(np.int64)
    data = np.frombuffer(clean.buffers()[2], np.uint8)
    base = off[0]
    lens = np.diff(off)
    total = int(off[-1] - base)
    nonempty = lens > 0

    out = np.full((n, 4), ord("0"), dtype=np.uint8)
    if total:
        chars = data[base:off[-1]]
        codes = _LUT[chars]
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        start = np.zeros(total, dtype=bool)
        start[(off[:-1] - base)[nonempty]] = True
        prev = np.empty(total, dtype=np.uint8)
        prev[0] = 255
        prev[1:] = codes[:-1]
        kept = start | (codes != prev)          # collapse adjacent runs
        ki = np.flatnonzero(kept)
        krow = row_of[ki]
        # ordinal of each kept element within its row (rows are sorted)
        first_of_row = np.searchsorted(krow, krow, side="left")
        ordinal = np.arange(len(ki)) - first_of_row
        # drop the first run (it holds the first letter), drop class 0
        tail = ki[(ordinal >= 1) & (codes[ki] != ord("0"))]
        trow = row_of[tail]
        tfirst = np.searchsorted(trow, trow, side="left")
        tord = np.arange(len(tail)) - tfirst
        keep3 = tord < 3
        out[trow[keep3], 1 + tord[keep3]] = codes[tail[keep3]]
        out[nonempty, 0] = data[base + (off[:-1] - base)[nonempty]]

    res_lens = np.where(nonempty, 4, 0).astype(np.int32)
    res_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(res_lens, out=res_off[1:])
    values = out[nonempty].ravel().tobytes()
    mask = None
    if clean.null_count:
        mask = pc.is_null(clean)
    res = pa.StringArray.from_buffers(
        n, pa.py_buffer(res_off.tobytes()), pa.py_buffer(values))
    if mask is not None:
        res = pc.if_else(mask, pa.scalar(None, pa.string()), res)
    return res


def soundex(name: str | None) -> str | None:
    """Scalar convenience wrapper over :func:`soundex_array`."""
    if name is None:
        return None
    return soundex_array(pa.array([name], pa.string()))[0].as_py()


def soundex_sql(expr: str) -> str:
    """The DuckDB expression computing the SAME simplified soundex for
    a SQL oracle: translate → indexed list_filter run-collapse → drop
    first run → strip zeros → pad. Keep in lockstep with
    :func:`soundex_array`."""
    return f"""(
        WITH __s AS (SELECT regexp_replace(upper({expr}),
                                           '[^A-Z]', '', 'g') AS u)
        SELECT CASE WHEN u = '' THEN ''
            ELSE substr(u, 1, 1) || substr(
                coalesce(array_to_string(
                    list_filter(
                        list_filter(
                            string_split(translate(u,
                                'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                '01230120022455012623010202'), ''),
                            (x, i) -> i = 1 OR x != string_split(
                                translate(u,
                                'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                '01230120022455012623010202'), '')[i - 1]
                        )[2:], x -> x != '0'),
                    ''), '') || '000', 1, 3)
        END FROM __s)"""
