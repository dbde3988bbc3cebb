"""Edit-distance similarity join: DP-kernel parity, PassJoin recall,
end-to-end brute-force equality (incl. non-ASCII byte semantics)."""

import random

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from whoiswho_ray.stages.editjoin import (
    _byte_matrix,
    _probe_shifts,
    _seg_bounds,
    edit_distance_join,
    levenshtein_batch,
)


def brute_lev(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp = dp, [i] + [0] * lb
        for j in range(1, lb + 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
    return dp[lb]


def brute_join(strs: dict[int, bytes], k: int) -> set[tuple[int, int, int]]:
    out = set()
    ids = sorted(strs)
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            d = brute_lev(strs[a], strs[b])
            if d <= k:
                out.add((a, b, d))
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(11)
    strs = [bytes(rng.choices(b"abcd", k=rng.randint(0, 14))) for _ in range(120)]
    strs += [b"", b"a", b"ab", "café".encode(), "cafe".encode(), "日本語".encode(),
             "日本誤".encode(), b"exactcopy", b"exactcopy", b"exactcopy"]
    return {i: s for i, s in enumerate(strs)}


class TestLevenshteinKernel:
    def test_parity_vs_brute(self, corpus):
        pairs = [(a, b) for a in list(corpus.values())[:40] for b in list(corpus.values())[:40]]
        va = pa.array([p[0] for p in pairs], pa.binary())
        vb = pa.array([p[1] for p in pairs], pa.binary())
        A, la = _byte_matrix(va)
        B, lb = _byte_matrix(vb)
        got = levenshtein_batch(A, la, B, lb)
        exp = np.array([brute_lev(a, b) for a, b in pairs])
        assert (got == exp).all()

    def test_byte_semantics_match_duckdb(self):
        # DuckDB levenshtein counts byte edits: café→cafe = 2 (é is 2 bytes)
        import duckdb

        cases = [("café", "cafe"), ("日本", "日木"), ("", "abc"), ("kitten", "sitting")]
        va = pa.array([a.encode() for a, _ in cases], pa.binary())
        vb = pa.array([b.encode() for _, b in cases], pa.binary())
        A, la = _byte_matrix(va)
        B, lb = _byte_matrix(vb)
        got = levenshtein_batch(A, la, B, lb)
        con = duckdb.connect()
        exp = [con.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0] for a, b in cases]
        assert got.tolist() == exp

    def test_empty_matrix(self):
        d = levenshtein_batch(np.zeros((0, 0), np.uint8), np.zeros(0, np.int64),
                              np.zeros((0, 0), np.uint8), np.zeros(0, np.int64))
        assert d.size == 0


class TestPartitionScheme:
    def test_seg_bounds_cover(self):
        for l in range(0, 30):
            for k in range(0, 5):
                segs = _seg_bounds(l, k)
                assert len(segs) == k + 1
                assert segs[0][0] == 0
                assert segs[-1][0] + segs[-1][1] == l
                for (p1, w1), (p2, _) in zip(segs, segs[1:]):
                    assert p1 + w1 == p2

    def test_probe_shift_window_exact(self):
        # |d| + |D-d| <= k is the exact alignment feasibility condition
        for k in range(0, 5):
            for D in range(0, k + 1):
                ds = _probe_shifts(D, k)
                assert 0 in ds and D in ds  # aligned starts always valid
                for d in ds:
                    assert abs(d) + abs(D - d) <= k


class TestEditJoinE2E:
    def _run(self, strs: dict[int, bytes], k: int):
        t = pa.table({"doc_id": pa.array(sorted(strs), pa.int64()),
                      "text": pa.array([strs[i] for i in sorted(strs)], pa.binary())})
        ds = rd.from_arrow(t)
        out = edit_distance_join(ds, key_col="doc_id", text_col="text", k=k)
        df = out.to_pandas()
        return set(zip(df["key_a"].astype(int), df["key_b"].astype(int),
                       df["dist"].astype(int)))

    @pytest.mark.parametrize("k", [0, 1, 3])
    def test_brute_parity(self, corpus, k):
        assert self._run(corpus, k) == brute_join(corpus, k)

    def test_duplicate_strings_all_pair(self):
        strs = {i: b"samestring" for i in range(6)}
        got = self._run(strs, 2)
        assert got == {(a, b, 0) for a in range(6) for b in range(a + 1, 6)}

    def test_length_window_edges(self):
        # pairs exactly k apart in length (pure insertions) must be found
        strs = {0: b"abcdefgh", 1: b"abcdefghXYZ", 2: b"abcde", 3: b"zzzzzzzz"}
        got = self._run(strs, 3)
        assert (0, 1, 3) in got and (0, 2, 3) in got
        assert not any(a == 3 or b == 3 for a, b, _ in got)

    def test_grouped_join(self):
        rng = random.Random(5)
        strs = {i: bytes(rng.choices(b"ab", k=rng.randint(0, 8))) for i in range(60)}
        grp = {i: ["de", "fr", "ja"][i % 3] for i in strs}
        t = pa.table({"doc_id": pa.array(sorted(strs), pa.int64()),
                      "text": pa.array([strs[i] for i in sorted(strs)], pa.binary()),
                      "lang": pa.array([grp[i] for i in sorted(strs)])})
        out = edit_distance_join(rd.from_arrow(t), key_col="doc_id",
                                 text_col="text", k=2, group_col="lang")
        df = out.to_pandas()
        got = set(zip(df["key_a"].astype(int), df["key_b"].astype(int),
                      df["dist"].astype(int)))
        exp = {(a, b, d) for (a, b, d) in brute_join(strs, 2) if grp[a] == grp[b]}
        assert got == exp

    def test_edit_dedup_components(self):
        from whoiswho_ray.stages.editjoin import edit_distance_dedup

        # chain a-b-c (each within 1 edit), isolate d, pair e-f
        strs = {10: b"hello", 11: b"hellq", 12: b"hellqx",
                13: b"zzzzzzzzzz", 14: b"world", 15: b"worlds"}
        t = pa.table({"doc_id": pa.array(sorted(strs), pa.int64()),
                      "text": pa.array([strs[i] for i in sorted(strs)], pa.binary())})
        out = edit_distance_dedup(rd.from_arrow(t), key_col="doc_id",
                                  text_col="text", k=1).to_pandas()
        got = dict(zip(out["doc_id"].astype(int), out["dup_group"].astype(int)))
        assert got == {10: 10, 11: 10, 12: 10, 13: 13, 14: 14, 15: 14}

    def test_string_column_and_prefixes(self):
        # string (not binary) input column; shared 20-byte prefix with a
        # 1-byte tail edit — the hot-signature regime
        strs = {i: ("prefixprefixprefixpr" + "abc"[i % 3]).encode() for i in range(9)}
        got = self._run(strs, 1)
        assert got == brute_join(strs, 1)
