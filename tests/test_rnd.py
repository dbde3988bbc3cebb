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
