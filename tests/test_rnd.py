"""RND assignment pipeline: profiles, argmax-with-NIL, accuracy gate."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.evaluation import assignment_metrics
from whoiswho_ray.functions.hashing import record_id_of
from whoiswho_ray.pipelines.rnd import NIL, run_rnd


@pytest.fixture(scope="module")
def rnd_setup(small_fixture):
    spec, tabs = small_fixture
    rec = tabs["records"].to_pandas()
    tru = tabs["ground_truth"].to_pandas()
    rec["record_id"] = [record_id_of(r, p, c)
                        for r, p, c in zip(rec["repo"], rec["path"], rec["commit"])]
    rec = rec.merge(tru[["record_id", "entity_id"]], on="record_id")
    # hold out every 5th record per entity as "new"; keep the rest as known
    rec["rank_in_entity"] = rec.groupby("entity_id").cumcount()
    is_new = rec["rank_in_entity"] % 5 == 4
    known = rec[~is_new]
    new = rec[is_new]
    cfg = SNDConfig()
    known_ds = rd.from_pandas(known[["repo", "path", "commit", "lang", "content"]])
    new_ds = rd.from_pandas(new[["repo", "path", "commit", "lang", "content"]])
    assigned = run_rnd(known_ds, new_ds, cfg).to_pandas()
    return known, new, tru, assigned


class TestRND:
    def test_every_new_record_assigned_once(self, rnd_setup):
        known, new, tru, assigned = rnd_setup
        assert len(assigned) == len(new)
        assert assigned["record_id"].is_unique

    def test_assignment_accuracy_gate(self, rnd_setup):
        known, new, tru, assigned = rnd_setup
        # cluster_truth: which entity each predicted cluster mostly holds
        from whoiswho_ray.pipelines.snd import run_snd

        known_ds = rd.from_pandas(known[["repo", "path", "commit", "lang", "content"]])
        clusters = run_snd(known_ds).to_pandas()
        cluster_truth = clusters.merge(
            tru[["record_id", "entity_id"]], on="record_id")
        m = assignment_metrics(assigned, new[["record_id", "entity_id"]], cluster_truth)
        assert m["accuracy"] >= 0.97, m
        assert m["weighted_f1"] >= 0.97, m

    def test_learned_assignment_accuracy(self, rnd_setup):
        """The KNRM-feature ensemble path (fit on known records, assign
        held-out ones) must reach the same accuracy gate as the
        fixed-weight centroid path — the reference's feature→GBDT→assign
        lifecycle end to end."""
        from whoiswho_ray.pipelines.rnd import run_rnd_learned
        from whoiswho_ray.pipelines.snd import run_snd

        known, new, tru, _ = rnd_setup
        cols = ["repo", "path", "commit", "lang", "content"]
        known_ds = rd.from_pandas(known[cols])
        new_ds = rd.from_pandas(new[cols])
        assigned = run_rnd_learned(known_ds, new_ds).to_pandas()
        assert len(assigned) == len(new)
        assert assigned["record_id"].is_unique
        clusters = run_snd(rd.from_pandas(known[cols])).to_pandas()
        cluster_truth = clusters.merge(
            tru[["record_id", "entity_id"]], on="record_id")
        m = assignment_metrics(assigned, new[["record_id", "entity_id"]],
                               cluster_truth)
        assert m["accuracy"] >= 0.9, m

    def test_nil_for_foreign_block(self):
        """Records whose block has no profiles must come back NIL."""
        cfg = SNDConfig()
        known = pd.DataFrame({
            "repo": ["o/a"] * 4,
            "path": [f"src/known.py"] * 4,
            "commit": [f"c{i}" for i in range(4)],
            "lang": ["py"] * 4,
            "content": ["alpha beta gamma delta"] * 4,
        })
        new = pd.DataFrame({
            "repo": ["o/b"],
            "path": ["src/unseen_thing.py"],
            "commit": ["z1"],
            "lang": ["py"],
            "content": ["epsilon zeta eta theta"],
        })
        out = run_rnd(rd.from_pandas(known), rd.from_pandas(new), cfg).to_pandas()
        assert out["assigned_cluster"].tolist() == [NIL]


class TestKnrmFeatures:
    def test_member_retention_and_knrm_separation(self, ray_cluster=None):
        """Profiles keep capped member vectors; KNRM features distinguish
        'one member matches exactly' from 'uniformly similar to the
        centroid' — the multi-resolution signal the centroid cosine loses."""
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from whoiswho_ray.pipelines.rnd import build_profiles, rnd_knrm_features

        # two profiles in one block: P1 has heterogeneous members (one of
        # them IDENTICAL to the query record), P2's members are all
        # moderately similar to the query
        def vec_row(rid, bk, ids, w):
            return {"record_id": rid, "block_key": bk, "name": rid,
                    "tok_ids": np.asarray(ids, np.int64),
                    "repo_ids": np.empty(0, np.int64),
                    "ctx_ids": np.empty(0, np.int64),
                    "tfv_ids": np.asarray(ids, np.int64),
                    "tfv_w": np.asarray(w, np.float32)}

        # unit-norm sparse vectors (cosine_sparse assumes normalized input)
        q_ids, q_w = [1, 2], [0.6, 0.8]
        members = [
            ("m1", q_ids, q_w),                # identical to query (cos=1)
            ("m2", [7, 8], [0.6, 0.8]),        # disjoint (cos=0)
            ("m3", [1, 9], [0.6, 0.8]),        # partial (cos=0.36)
            ("m4", [2, 9], [0.8, 0.6]),        # partial (cos=0.64)
        ]
        rows = [vec_row(r, "bk", i, w) for r, i, w in members]
        vec = rd.from_pandas(pd.DataFrame(rows))
        clusters = rd.from_pandas(pd.DataFrame({
            "record_id": ["m1", "m2", "m3", "m4"],
            "cluster_id": ["P1", "P1", "P2", "P2"],
        }))
        profs = build_profiles(vec, clusters, keep_members=8)
        pdf = profs.to_pandas()
        assert "member_tfv_ids" in pdf.columns
        assert sorted(len(m) for m in pdf["member_tfv_ids"]) == [2, 2]

        newrec = rd.from_pandas(pd.DataFrame([vec_row("q0", "bk", q_ids, q_w)]))
        feats = rnd_knrm_features(newrec, profs).to_pandas()
        assert len(feats) == 2
        f = feats.set_index("candidate_cluster")["knrm"]
        # exact-match kernel (last) fires for P1 (contains the identical
        # member), not for P2
        assert f["P1"][-1] > f["P2"][-1] + 1.0


class TestGraphFeatures:
    """Ego-graph feature family (graph_features.py:62-120 analog):
    second-hop common-neighbor structure that direct similarity misses."""

    @staticmethod
    def _vec_row(rid, bk, ids, w):
        return {"record_id": rid, "block_key": bk, "name": rid,
                "tok_ids": np.asarray(ids, np.int64),
                "repo_ids": np.empty(0, np.int64),
                "ctx_ids": np.empty(0, np.int64),
                "tfv_ids": np.asarray(ids, np.int64),
                "tfv_w": np.asarray(w, np.float32)}

    def test_common_neighbor_counts(self, ray_session):
        from whoiswho_ray.pipelines.rnd import build_profiles, rnd_knrm_features

        # q links ONLY m_a (in P2); m_a links P1's member m1.
        # -> g_deg(q,P2)=1, g_deg(q,P1)=0, g_cn(q,P1)=1 (via m_a), g_cn(q,P2)=0
        rows = [
            self._vec_row("m1", "bk", [10, 11], [0.6, 0.8]),   # P1
            self._vec_row("m2", "bk", [20, 21], [0.6, 0.8]),   # P1
            self._vec_row("ma", "bk", [1, 10, 11], [0.5774] * 3),  # P2: links q (1) and m1
            self._vec_row("mb", "bk", [30, 31], [0.6, 0.8]),   # P2
        ]
        vec = rd.from_pandas(pd.DataFrame(rows))
        clusters = rd.from_pandas(pd.DataFrame({
            "record_id": ["m1", "m2", "ma", "mb"],
            "cluster_id": ["P1", "P1", "P2", "P2"],
        }))
        profs = build_profiles(vec, clusters, keep_members=8)
        q = rd.from_pandas(pd.DataFrame(
            [self._vec_row("q0", "bk", [1, 2], [0.9, 0.436])]))
        feats = rnd_knrm_features(q, profs, with_graph=True,
                                  graph_tau=0.4).to_pandas()
        f = feats.set_index("candidate_cluster")
        # cos(q, ma) = 0.9*0.5774 = 0.52 >= 0.4; cos(ma, m1) = 2*0.5774*0.7 dot...
        assert f.loc["P2", "g_deg"] == 1.0
        assert f.loc["P1", "g_deg"] == 0.0
        assert f.loc["P1", "g_cn"] == 1.0
        assert f.loc["P2", "g_cn"] == 0.0

    def test_knrm_values_match_per_pair_reference(self, ray_session):
        """The vectorized gather path must produce the same kernel values
        as a direct per-(record, member) cosine + pooling computation
        (VERDICT r2 #7)."""
        from whoiswho_ray.functions.similarity import knrm_mus_sigmas
        from whoiswho_ray.pipelines.rnd import build_profiles, rnd_knrm_features

        rng = np.random.RandomState(5)
        members, clusters_rows = [], []
        for p in range(3):
            for m in range(4):
                ids = np.sort(rng.choice(100, 6, replace=False)).astype(np.int64)
                w = rng.rand(6); w = w / np.linalg.norm(w)
                members.append(self._vec_row(f"m{p}_{m}", "bk", ids, w))
                clusters_rows.append({"record_id": f"m{p}_{m}",
                                      "cluster_id": f"P{p}"})
        vec = rd.from_pandas(pd.DataFrame(members))
        profs = build_profiles(vec, rd.from_pandas(pd.DataFrame(clusters_rows)),
                               keep_members=8)
        q_ids = np.sort(rng.choice(100, 6, replace=False)).astype(np.int64)
        q_w = rng.rand(6); q_w = q_w / np.linalg.norm(q_w)
        q = rd.from_pandas(pd.DataFrame([self._vec_row("q0", "bk", q_ids, q_w)]))
        got = rnd_knrm_features(q, profs).to_pandas().set_index("candidate_cluster")

        # reference computation: per-member cosine, per-kernel pooled log
        mus, sigmas = knrm_mus_sigmas(21, 0.1)
        by_p = {}
        q_w32 = q_w.astype(np.float32).astype(np.float64)  # pipeline stores float32
        for row, crow in zip(members, clusters_rows):
            inter, qi, mi = np.intersect1d(q_ids, row["tfv_ids"],
                                           return_indices=True)
            cos = float(np.sum(q_w32[qi] * row["tfv_w"].astype(np.float64)[mi]))
            by_p.setdefault(crow["cluster_id"], []).append(cos)
        for p, sims in by_p.items():
            sims = np.asarray(sims)
            pooled = np.exp(-((sims[:, None] - mus[None, :]) ** 2)
                            / (2.0 * sigmas[None, :] ** 2)).sum(axis=0)
            want = np.log(np.maximum(pooled, 1e-10))
            np.testing.assert_allclose(np.asarray(got.loc[p, "knrm"]), want,
                                       rtol=0, atol=1e-12)

    def test_learned_with_graph_meets_gate(self, rnd_setup):
        from whoiswho_ray.pipelines.rnd import run_rnd_learned
        from whoiswho_ray.pipelines.snd import run_snd

        known, new, tru, _ = rnd_setup
        cols = ["repo", "path", "commit", "lang", "content"]
        assigned = run_rnd_learned(rd.from_pandas(known[cols]),
                                   rd.from_pandas(new[cols]),
                                   with_graph=True).to_pandas()
        clusters = run_snd(rd.from_pandas(known[cols])).to_pandas()
        cluster_truth = clusters.merge(tru[["record_id", "entity_id"]],
                                       on="record_id")
        m = assignment_metrics(assigned, new[["record_id", "entity_id"]],
                               cluster_truth)
        assert m["accuracy"] >= 0.9, m


class TestEnsembleSampling:
    def test_max_train_records_bounds_collect(self, rnd_setup):
        """fit_rnd_ensemble with a forced-low cap trains on a deterministic
        hash sample and reports it (VERDICT r2 #8)."""
        from whoiswho_ray.pipelines.rnd import (build_profiles,
                                                fit_rnd_ensemble)
        from whoiswho_ray.pipelines.snd import run_snd, snd_cluster
        from whoiswho_ray.stages.idf import build_idf
        from whoiswho_ray.stages.normalize import normalize_records
        from whoiswho_ray.stages.scoring import vectorize

        known, new, tru, _ = rnd_setup
        cols = ["repo", "path", "commit", "lang", "content"]
        known_ds = rd.from_pandas(known[cols])
        norm = normalize_records(known_ds).materialize()
        idf = build_idf(norm)
        vec = vectorize(norm, idf).materialize()
        clusters = snd_cluster(norm, vec).materialize()
        profiles = build_profiles(vec, clusters, keep_members=8).materialize()
        cap = 20
        model, diag = fit_rnd_ensemble(vec, profiles, clusters,
                                       max_train_records=cap)
        assert diag["n_train_records"] == cap
        # deterministic: same cap -> same sample -> same model predictions
        model2, diag2 = fit_rnd_ensemble(vec, profiles, clusters,
                                         max_train_records=cap)
        assert diag2["n_train_records"] == cap
