"""Fixture generator: determinism, shape, separability."""

import numpy as np

from whoiswho_ray.fixtures import FixtureSpec, gen_block, generate_tables


def test_deterministic():
    spec = FixtureSpec(n_blocks=3, seed=7)
    a = generate_tables(spec)
    b = generate_tables(spec)
    for k in a:
        assert a[k].equals(b[k])


def test_block_purity_is_order_free():
    spec = FixtureSpec(n_blocks=5, seed=11)
    # generating block 3 alone gives the same bytes as inside the loop
    alone = gen_block(spec, 3)
    spec2 = FixtureSpec(n_blocks=5, seed=11)
    again = gen_block(spec2, 3)
    assert alone == again


def test_schema_and_keys(small_fixture):
    spec, tabs = small_fixture
    rec = tabs["records"]
    assert rec.column_names == ["repo", "path", "commit", "lang", "content"]
    tru = tabs["ground_truth"].to_pandas()
    assert set(tru.columns) == {"block_key", "entity_id", "record_id"}
    assert tru["record_id"].is_unique
    # hot block exists: block 0 has far more records than the median block
    sizes = tru.groupby("block_key").size()
    assert sizes.max() > 3 * sizes.median()


def test_labeled_pairs_consistent(small_fixture):
    spec, tabs = small_fixture
    tru = tabs["ground_truth"].to_pandas().set_index("record_id")
    prs = tabs["labeled_pairs"].to_pandas()
    assert (prs["record_id_a"] < prs["record_id_b"]).all()
    ent_a = prs["record_id_a"].map(tru["entity_id"])
    ent_b = prs["record_id_b"].map(tru["entity_id"])
    assert ((ent_a == ent_b) == prs["same_entity"]).all()
    # both sides share the block key
    bk_a = prs["record_id_a"].map(tru["block_key"])
    assert (bk_a == prs["block_key"]).all()
