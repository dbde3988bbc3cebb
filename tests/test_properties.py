"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from whoiswho_ray.functions.hashing import MinHasher, hamming64, simhash64, stable_hash64
from whoiswho_ray.functions.similarity import (
    intersect_size_sorted,
    jaccard_sorted,
    jaro_winkler,
)
from whoiswho_ray.functions.textnorm import clean_text, normalize_block_key

int_sets = st.lists(st.integers(0, 2**62), max_size=60).map(
    lambda xs: np.unique(np.array(xs, dtype=np.int64))
)
texts = st.text(max_size=50)


class TestSimilarityProperties:
    @settings(max_examples=200, deadline=None)
    @given(int_sets, int_sets)
    def test_jaccard_bounds_and_symmetry(self, a, b):
        j = jaccard_sorted(a, b)
        assert 0.0 <= j <= 1.0
        assert j == jaccard_sorted(b, a)
        if a.size and np.array_equal(a, b):
            assert j == 1.0

    @settings(max_examples=200, deadline=None)
    @given(int_sets, int_sets)
    def test_intersection_matches_python_sets(self, a, b):
        assert intersect_size_sorted(a, b) == len(set(a.tolist()) & set(b.tolist()))

    @settings(max_examples=150, deadline=None)
    @given(texts, texts)
    def test_jw_bounds_symmetry_identity(self, s1, s2):
        v = jaro_winkler(s1, s2)
        assert 0.0 <= v <= 1.0
        assert v == jaro_winkler(s2, s1)
        if s1 and s1 == s2:
            assert v == 1.0


class TestHashingProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.text(max_size=40))
    def test_stable_hash_range(self, s):
        h = stable_hash64(s)
        assert 0 <= h < 2**63
        assert h == stable_hash64(s)

    @settings(max_examples=100, deadline=None)
    @given(int_sets)
    def test_minhash_identical_sets_identical_sigs(self, a):
        mh = MinHasher(32, seed=5)
        assert np.array_equal(mh.signature(a), mh.signature(a[::-1].copy()))

    @settings(max_examples=100, deadline=None)
    @given(int_sets)
    def test_simhash_self_distance_zero(self, a):
        assert hamming64(simhash64(a), simhash64(a)) == 0

    @settings(max_examples=50, deadline=None)
    @given(st.lists(int_sets, min_size=0, max_size=6))
    def test_signatures_flat_matches_per_row_signature(self, rows):
        """The hash-major batched kernel must stay bit-identical to the
        per-row signature (incl. empty rows) — it was rewritten for cache
        residency and this pins the refactor."""
        mh = MinHasher(16, seed=9)
        values = (np.concatenate(rows) if rows else np.empty(0, np.int64)).astype(np.int64)
        offsets = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum([len(r) for r in rows], out=offsets[1:])
        sigs = mh.signatures_flat(values, offsets)
        for i, r in enumerate(rows):
            assert np.array_equal(sigs[i], mh.signature(np.asarray(r, np.int64)))


class TestTextNormProperties:
    @settings(max_examples=150, deadline=None)
    @given(texts)
    def test_clean_text_idempotent(self, s):
        once = clean_text(s)
        assert clean_text(once) == once

    @settings(max_examples=150, deadline=None)
    @given(texts)
    def test_block_key_idempotent_and_alnum(self, s):
        k = normalize_block_key(s)
        # a key is pure alnum (no dot), so re-keying is strictly idempotent
        assert k == normalize_block_key(k)
        assert all(c.isalnum() for c in k)
