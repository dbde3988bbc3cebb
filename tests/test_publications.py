"""SND on the reference's NATIVE publication shape (pid, authors list<struct>)."""

import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.evaluation import pairwise_f1_frames
from whoiswho_ray.sources.publications import (
    PUBLICATION_SCHEMA,
    clamp_year,
    cluster_publications,
    make_mini_publications,
    normalized_from_publications,
)


@pytest.fixture(scope="module")
def mini_pubs():
    return make_mini_publications(seed=42)


class TestPublications:
    def test_schema_roundtrip(self, mini_pubs):
        pubs, truth = mini_pubs
        assert pubs.schema.equals(PUBLICATION_SCHEMA)
        ds = rd.from_arrow(pubs)
        assert ds.count() == pubs.num_rows

    def test_year_clamp_rule(self):
        # data_process.py:330-337 semantics
        assert clamp_year(2005) == 2005
        assert clamp_year(1499) == 0
        assert clamp_year(2024) == 0
        assert clamp_year("") == 0
        assert clamp_year(None) == 0

    def test_author_slot_explosion(self, mini_pubs):
        pubs, truth = mini_pubs
        norm = normalized_from_publications(rd.from_arrow(pubs)).to_pandas()
        # one record per author slot, keyed pid-idx
        n_slots = sum(len(a) for a in pubs.column("authors").to_pylist())
        assert len(norm) == n_slots
        assert norm["record_id"].is_unique
        assert norm["record_id"].str.match(r"p\d{5}-\d+").all()

    def test_variant_surface_forms_co_block(self, mini_pubs):
        """'John Smith' / 'J. Smith' / 'Smith, John' land in ONE block
        (name_block_key) — the r1 recall hole where abbreviated forms were
        never compared."""
        pubs, truth = mini_pubs
        norm = normalized_from_publications(rd.from_arrow(pubs)).to_pandas()
        smith = norm[norm["block_key"] == "smith.j"]
        assert smith["name"].nunique() >= 2  # several surfaces, same block
        # and no other block contains a smith-surface record
        assert set(norm[norm["name"].str.contains("smith")]["block_key"]) == {"smith.j"}

    def test_cluster_publications_f1(self, mini_pubs):
        """The reference's own task on its own data shape: cluster each
        ambiguous name's papers into per-person groups, F1 ≥ 0.99."""
        pubs, truth = mini_pubs
        clusters = cluster_publications(rd.from_arrow(pubs)).to_pandas()
        truth_df = truth.to_pandas()
        # evaluate only the ambiguous-name slots (coauthor slots are
        # unlabeled singletons, exactly like the reference evaluates only
        # the name under disambiguation)
        pred = clusters[clusters["record_id"].isin(set(truth_df["record_id"]))]
        ev = pairwise_f1_frames(pred, truth_df)
        mean_f1 = ev.loc[ev["block_key"] == "__mean__", "f1"].iloc[0]
        assert mean_f1 >= 0.99, ev.to_string()
