"""Normalize / idf / pairs / scoring stage tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.functions.hashing import sha256_hex, stable_hash64
from whoiswho_ray.stages.idf import build_idf
from whoiswho_ray.stages.normalize import normalize_batch, normalize_records
from whoiswho_ray.stages.pairs import candidate_index_pairs, make_pairs
from whoiswho_ray.stages.scoring import score_pair_arrays


def _records_batch():
    return pa.table(
        {
            "repo": ["org/alpha", "org/alpha", "other/beta"],
            "path": ["src/Mod_A.py", "lib/moda.py", "x/ModA.py"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["py", "py", "py"],
            "content": ["foo bar baz", "foo bar qux", "zap zip zup"],
        }
    )


class TestNormalize:
    def test_batch_output(self):
        out = normalize_batch(_records_batch(), SNDConfig())
        df = out.to_pandas()
        assert df["block_key"].tolist() == ["moda", "moda", "moda"]
        assert df["content_sha256"].iloc[0] == sha256_hex("foo bar baz")
        assert df["record_id"].is_unique
        toks0 = set(df["tok_ids"].iloc[0])
        assert stable_hash64("foo") in toks0 and stable_hash64("baz") in toks0

    def test_dataset_roundtrip(self):
        ds = rd.from_arrow(_records_batch())
        out = normalize_records(ds).to_pandas()
        assert len(out) == 3
        assert "content" not in out.columns  # content dropped after normalize


class TestIdf:
    def test_df_counts_and_pruning(self):
        tbl = _records_batch()
        norm = normalize_records(rd.from_arrow(tbl), SNDConfig(min_df=2))
        idf = build_idf(norm, SNDConfig(min_df=2))
        assert idf.n_records == 3
        # only foo, bar appear in >= 2 records
        assert idf.ids.size == 2
        kept = {stable_hash64("foo"), stable_hash64("bar")}
        assert set(idf.ids.tolist()) == kept
        assert np.all(np.diff(idf.ids) > 0)
        # df=2 of 3 records → idf = log1p(3/2)
        assert idf.idf[0] == pytest.approx(np.log1p(1.5), rel=1e-6)

    def test_lookup(self):
        tbl = _records_batch()
        cfg = SNDConfig(min_df=2)
        idf = build_idf(normalize_records(rd.from_arrow(tbl), cfg), cfg)
        q = np.sort(np.array([stable_hash64("foo"), stable_hash64("nope")], dtype=np.int64))
        ids, w = idf.lookup(q)
        assert ids.tolist() == [stable_hash64("foo")]
        assert w.size == 1


class TestPairs:
    def test_allpairs_small_block(self):
        cfg = SNDConfig(max_allpairs_block=10)
        rids = np.array([f"r{i}" for i in range(5)])
        toks = [np.arange(3, dtype=np.int64)] * 5
        repos = [np.array([1], dtype=np.int64)] * 5
        pairs, trunc = candidate_index_pairs(rids, toks, repos, cfg)
        assert len(pairs) == 10 and trunc == 0

    def test_salted_hot_block_connects_similar(self):
        """Records with near-identical token sets must share a sub-bucket
        even when the block exceeds the all-pairs cap."""
        cfg = SNDConfig(max_allpairs_block=10, lsh_bands=8, lsh_rows=2)
        rng = np.random.RandomState(0)
        n = 40
        base = np.unique(rng.randint(0, 2**62, 30))
        toks, rids, repos = [], [], []
        for i in range(n):
            # 20 clones of entity A, 20 of entity B
            pool = base if i < 20 else np.unique(rng.randint(0, 2**62, 30))
            drop = rng.choice(pool.size, 3, replace=False)
            toks.append(np.sort(np.delete(pool, drop)))
            rids.append(f"r{i:02d}")
            repos.append(np.array([1 if i < 20 else 2], dtype=np.int64))
        pairs, _ = candidate_index_pairs(np.array(rids), toks, repos, cfg)
        # entity A's records form ONE connected set through emitted pairs —
        # the transitive-closure pass recovers what salting didn't score
        from whoiswho_ray.stages.cluster import UnionFind

        uf = UnionFind(n)
        for i, j in pairs:
            uf.union(i, j)
        roots_a = {uf.find(i) for i in range(20)}
        assert len(roots_a) == 1

    def test_salting_determinism_and_order_invariance(self):
        cfg = SNDConfig(max_allpairs_block=5)
        rng = np.random.RandomState(1)
        n = 30
        toks = [np.unique(rng.randint(0, 2**62, 20)) for _ in range(n)]
        repos = [np.array([i % 3], dtype=np.int64) for i in range(n)]
        rids = np.array([f"r{i:02d}" for i in range(n)])
        p1, _ = candidate_index_pairs(rids, toks, repos, cfg)
        perm = rng.permutation(n)
        p2, _ = candidate_index_pairs(
            rids[perm], [toks[i] for i in perm], [repos[i] for i in perm], cfg
        )
        set1 = {tuple(sorted((rids[i], rids[j]))) for i, j in p1}
        set2 = {tuple(sorted((rids[perm][i], rids[perm][j]))) for i, j in p2}
        assert set1 == set2

    def test_make_pairs_payload(self):
        cfg = SNDConfig()
        g = pd.DataFrame(
            {
                "block_key": ["bk"] * 3,
                "record_id": ["r1", "r2", "r3"],
                "name": ["a.py", "b.py", "c.py"],
                "tok_ids": [np.array([1, 2], np.int64)] * 3,
                "repo_ids": [np.array([9], np.int64)] * 3,
                "ctx_ids": [np.array([8], np.int64)] * 3,
                "tfv_ids": [np.array([1], np.int64)] * 3,
                "tfv_w": [np.array([1.0], np.float32)] * 3,
            }
        )
        out = make_pairs(g, cfg)
        assert len(out) == 3
        assert set(out.columns) >= {"block_key", "id_a", "id_b", "tok_a", "tok_b"}


class TestScoring:
    def test_score_pair_known_values(self):
        cfg = SNDConfig(w_tokens=1.0, w_repo=1.0, w_ctx=0.0, w_tfidf=0.0, w_name=0.0)
        a = np.array([1, 2, 3, 4], np.int64)
        b = np.array([3, 4, 5], np.int64)
        same = np.array([7], np.int64)
        e = np.empty(0, np.int64)
        ew = np.empty(0, np.float32)
        j, t, c, cos, jw, score = score_pair_arrays(
            a, b, same, same, e, e, e, ew, e, ew, "x.py", "x.py", cfg
        )
        assert j == pytest.approx(2 / 5)
        assert t == pytest.approx(1.0)
        assert score == pytest.approx(2 / 5 + 1.0)
