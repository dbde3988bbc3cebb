"""Unit tests for the pure function layer (no Ray needed)."""

import duckdb
import numpy as np
import pytest

from whoiswho_ray.functions.hashing import (
    MinHasher,
    hamming64,
    hash_tokens64,
    record_id_of,
    sha256_hex,
    simhash64,
    stable_hash64,
    winnow_fingerprints,
)
from whoiswho_ray.functions.similarity import (
    cosine_sparse,
    intersect_size_sorted,
    jaccard_sorted,
    jaro,
    jaro_winkler,
)
from whoiswho_ray.functions.textnorm import (
    ascii_fold,
    clean_text,
    ctx_tokens,
    normalize_block_key,
    repo_tokens,
    tokenize_identifiers,
    tokenize_text,
)


class TestTextNorm:
    def test_block_key_variants_collapse(self):
        # the cleaning_name analog: surface variants → one key
        variants = ["src/Foo_Bar.v2.PY", "lib/foobar-v2.py", "a/b/FOOBARV2.py", "FooBarV2.py"]
        keys = {normalize_block_key(v) for v in variants}
        assert keys == {"foobarv2"}

    def test_block_key_ascii_fold(self):
        assert normalize_block_key("x/Módulé.py") == "module"

    def test_clean_text(self):
        assert clean_text("  Héllo,   WORLD!! ") == "hello world"

    def test_tokenize_identifiers_splits_camel_and_snake(self):
        toks = tokenize_identifiers("def fooBar(baz_qux): return FooBar")
        assert toks == ["foo", "bar", "baz", "qux"]

    def test_tokenize_identifiers_cap(self):
        content = " ".join(f"tok{i:04d}" for i in range(500))
        assert len(tokenize_identifiers(content, max_tokens=100)) == 100

    def test_tokenize_text_stopwords(self):
        assert tokenize_text("the cat and the hat") == ["cat", "hat"]

    def test_repo_ctx_tokens(self):
        assert repo_tokens("org001/proj-x") == ["org001", "proj", "x"]
        assert ctx_tokens("src/core/mod.py", "py") == ["src", "core", "py"]

    def test_ascii_fold(self):
        assert ascii_fold("ćwiok") == "cwiok"


class TestHashing:
    def test_stable_hash64_deterministic(self):
        assert stable_hash64("abc") == stable_hash64("abc")
        assert 0 <= stable_hash64("abc") < 2**63

    def test_record_id_distinct(self):
        a = record_id_of("r", "p", "c1")
        b = record_id_of("r", "p", "c2")
        assert a != b and len(a) == 40

    def test_sha256(self):
        import hashlib

        assert sha256_hex("x") == hashlib.sha256(b"x").hexdigest()

    def test_minhash_estimates_jaccard(self):
        rng = np.random.RandomState(0)
        x = np.unique(rng.randint(0, 2**62, 1000))
        y = np.unique(np.concatenate([x[:600], rng.randint(0, 2**62, 400)]))
        true_j = jaccard_sorted(np.sort(x), np.sort(y))
        mh = MinHasher(512, seed=3)
        est = float((mh.signature(x) == mh.signature(y)).mean())
        assert abs(est - true_j) < 0.08

    def test_band_keys_deterministic_and_orderfree(self):
        mh = MinHasher(16, seed=1)
        x = np.array([5, 9, 1, 7], dtype=np.int64)
        assert mh.band_keys(np.sort(x), 4, 4) == mh.band_keys(x[::-1], 4, 4)

    def test_simhash_similar_sets_close(self):
        rng = np.random.RandomState(1)
        x = np.unique(rng.randint(0, 2**62, 500))
        y = np.unique(np.concatenate([x[:450], rng.randint(0, 2**62, 50)]))
        z = np.unique(rng.randint(0, 2**62, 500))
        assert hamming64(simhash64(x), simhash64(y)) < hamming64(simhash64(x), simhash64(z))

    def test_winnow_shift_invariant_core(self):
        rng = np.random.RandomState(2)
        doc = rng.randint(0, 2**62, 200)
        fp1 = winnow_fingerprints(doc)
        # a document containing the same long run shares most fingerprints
        doc2 = np.concatenate([rng.randint(0, 2**62, 10), doc])
        fp2 = winnow_fingerprints(doc2)
        shared = np.intersect1d(fp1, fp2).size
        assert shared / fp1.size > 0.8


class TestSimilarity:
    def test_jaccard(self):
        a = hash_tokens64(["a", "b", "c", "d"])
        b = hash_tokens64(["c", "d", "e"])
        assert jaccard_sorted(a, b) == pytest.approx(2 / 5)
        assert jaccard_sorted(a, np.empty(0, np.int64)) == 0.0

    def test_intersect_size(self):
        a = np.array([1, 3, 5, 7], dtype=np.int64)
        b = np.array([3, 4, 7, 9], dtype=np.int64)
        assert intersect_size_sorted(a, b) == 2

    def test_cosine_sparse_identical(self):
        ids = np.array([1, 2, 3], dtype=np.int64)
        w = np.ones(3) / np.sqrt(3)
        assert cosine_sparse(ids, w, ids, w) == pytest.approx(1.0)

    def test_cosine_sparse_disjoint(self):
        a = np.array([1, 2], np.int64)
        b = np.array([3, 4], np.int64)
        w = np.ones(2) / np.sqrt(2)
        assert cosine_sparse(a, w, b, w) == 0.0

    def test_jaro_known_values(self):
        assert jaro("martha", "marhta") == pytest.approx(0.944444, abs=1e-5)
        assert jaro_winkler("martha", "marhta") == pytest.approx(0.961111, abs=1e-5)
        assert jaro_winkler("dwayne", "duane") == pytest.approx(0.84, abs=1e-5)

    def test_jaro_winkler_matches_duckdb(self):
        """Parity with the published JW definition as implemented by DuckDB
        (the reference uses pyjarowinkler, same formula)."""
        con = duckdb.connect()
        rng = np.random.RandomState(7)
        alphabet = list("abcdefg_.0123")
        for _ in range(200):
            s1 = "".join(rng.choice(alphabet, rng.randint(0, 12)))
            s2 = "".join(rng.choice(alphabet, rng.randint(0, 12)))
            theirs = con.execute(
                "select jaro_winkler_similarity(?, ?)", [s1, s2]
            ).fetchone()[0]
            assert jaro_winkler(s1, s2) == pytest.approx(theirs, abs=1e-9), (s1, s2)


class TestKnrm:
    """Kernel pooling (T5, model.py:103-135 analog)."""

    def test_kernel_layout(self):
        from whoiswho_ray.functions.similarity import knrm_mus_sigmas

        mus, sigmas = knrm_mus_sigmas(11, 0.1)
        assert mus.size == sigmas.size == 11
        assert mus[-1] == 1.0 and sigmas[-1] == pytest.approx(1e-3)
        assert np.all(np.diff(mus) > 0)
        assert -1 < mus[0] < mus[-2] < 1

    def test_exact_match_kernel_fires_on_identical(self):
        from whoiswho_ray.functions.similarity import knrm_features

        sims_same = np.array([[1.0, 0.1]])
        sims_diff = np.array([[0.5, 0.1]])
        f_same = knrm_features(sims_same, n_kernels=11)
        f_diff = knrm_features(sims_diff, n_kernels=11)
        # last kernel (exact @ mu=1) much larger when an exact match exists
        assert f_same[-1] > f_diff[-1] + 5

    def test_multi_resolution_separates_distributions(self):
        """Two sim distributions with the SAME mean but different shape
        give different kernel histograms — the signal plain cosine loses."""
        from whoiswho_ray.functions.similarity import knrm_features

        a = np.full((1, 10), 0.5)                       # all moderate
        b = np.array([[1.0] * 5 + [0.0] * 5])           # half exact, half none
        fa = knrm_features(a, n_kernels=11)
        fb = knrm_features(b, n_kernels=11)
        assert not np.allclose(fa, fb)
        assert fb[-1] > fa[-1]  # b has exact matches

    def test_empty_matrix(self):
        from whoiswho_ray.functions.similarity import knrm_features

        assert np.array_equal(knrm_features(np.zeros((0, 0)), 11), np.zeros(11))

    def test_profile_features_sparse(self):
        from whoiswho_ray.functions.similarity import knrm_profile_features

        rec = (np.array([1, 2, 3]), np.array([0.6, 0.6, 0.5]))
        members = [
            (np.array([1, 2, 3]), np.array([0.6, 0.6, 0.5])),   # identical
            (np.array([9, 10]), np.array([0.7, 0.7])),          # disjoint
        ]
        f = knrm_profile_features(rec[0], rec[1],
                                  [m[0] for m in members], [m[1] for m in members])
        assert f.size == 21
        assert np.isfinite(f).all()
