"""Relational (graph-view) pair features — operator A6.

Covers the neighborhood kernels, the veto semantics of the score blend
(a spurious direct edge between two cliques is demoted below both
thresholds while in-clique edges are boosted), and the block-level
integer-feature kernel the exact oracle checks.
"""

import dataclasses

import numpy as np
import pyarrow as pa

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.stages.cluster import cluster_edge_arrays
from whoiswho_ray.stages.relational import (
    make_relational_rows,
    neighbor_overlap,
    relational_adjust,
    strong_adjacency,
)


def test_neighbor_overlap_triangle_plus_isolate():
    # strong graph: triangle 0-1-2, node 3 isolated; candidates = all pairs
    ii, jj = np.triu_indices(4, 1)
    strong = np.array([True, True, False, True, False, False])
    nbr, off, deg = strong_adjacency(4, ii.astype(np.int64), jj.astype(np.int64), strong)
    assert deg.tolist() == [2, 2, 2, 0]
    cn, _ = neighbor_overlap(ii.size, ii, jj, nbr, off, deg)
    # (0,1): {2}; (0,2): {1}; (1,2): {0}; pairs with 3: none
    assert cn.tolist() == [1, 1, 0, 1, 0, 0]


def test_adamic_adar_weighting():
    ii, jj = np.triu_indices(3, 1)
    strong = np.array([True, True, False])  # path 1-0-2: 0 is the hub
    nbr, off, deg = strong_adjacency(3, ii.astype(np.int64), jj.astype(np.int64), strong)
    w = 1.0 / np.sqrt(np.log(np.maximum(deg, 2)))
    cn, aa = neighbor_overlap(ii.size, ii, jj, nbr, off, deg, w)
    # only pair (1,2) shares neighbor 0 (deg 2): aa = 1/log(2)
    assert cn.tolist() == [0, 0, 1]
    assert np.allclose(aa, [0, 0, 1.0 / np.log(2)])


def test_relational_veto_breaks_false_bridge():
    # two 4-cliques X={0..3}, Y={4..7}; a spurious direct bridge (3,4)
    # clears tau_edge on content alone. The graph view must veto it while
    # keeping (and boosting) the in-clique edges.
    n = 8
    ii, jj = np.triu_indices(n, 1)
    ii = ii.astype(np.int64)
    jj = jj.astype(np.int64)
    score = np.zeros(ii.size)
    for k, (a, b) in enumerate(zip(ii, jj)):
        same = (a < 4 and b < 4) or (a >= 4 and b >= 4)
        if same:
            score[k] = 2.0
        if (a, b) == (3, 4):
            score[k] = 1.6
    cfg = SNDConfig()
    base = cluster_edge_arrays(n, ii, jj, score.copy(), cfg)
    assert len(set(base.tolist())) == 1  # one false bridge merges everything

    cfg2 = dataclasses.replace(cfg, w_rel=1.0)
    feats = relational_adjust(n, ii, jj, {"score": score.copy()}, cfg2)
    # bridge: no common neighbors, 6 distinct ones -> rel=0 -> -0.5
    bridge = [k for k, (a, b) in enumerate(zip(ii, jj)) if (a, b) == (3, 4)][0]
    assert feats["rel"][bridge] == 0.0
    assert feats["score"][bridge] == 1.1  # below tau_attach too
    adj = cluster_edge_arrays(n, ii, jj, feats["score"], cfg2)
    assert len(set(adj.tolist())) == 2
    assert len(set(adj[:4].tolist())) == 1 and len(set(adj[4:].tolist())) == 1


def test_isolated_pair_stays_neutral():
    # a lone strong 2-clique has no neighborhood evidence either way:
    # rel = 0.5 exactly, so the blend must not move its score
    ii = np.array([0], dtype=np.int64)
    jj = np.array([1], dtype=np.int64)
    cfg = dataclasses.replace(SNDConfig(), w_rel=2.0)
    feats = relational_adjust(2, ii, jj, {"score": np.array([1.8])}, cfg)
    assert feats["rel"][0] == 0.5
    assert feats["score"][0] == 1.8


def _mini_group() -> pa.Table:
    def toks(*vals):
        return list(vals)

    empty = pa.array([[], [], []], pa.list_(pa.int64()))
    return pa.table({
        "block_key": pa.array(["b"] * 3, pa.string()),
        "record_id": pa.array(["r1", "r2", "r3"], pa.string()),
        "name": pa.array(["a.txt", "a.txt", "a.txt"], pa.string()),
        "tok_ids": pa.array([toks(1, 2, 3), toks(1, 2, 3), toks(9, 10, 11)],
                            pa.list_(pa.int64())),
        "repo_ids": empty,
        "ctx_ids": empty,
        "tfv_ids": empty,
        "tfv_w": pa.array([[], [], []], pa.list_(pa.float32())),
    })


def test_make_relational_rows_integers():
    out = make_relational_rows(_mini_group(), SNDConfig())
    df = out.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # only (r1, r2) is strong (token jaccard 1 -> score >= tau_edge)
    assert df["s"].tolist() == [1, 0, 0]
    assert df["cn"].tolist() == [0, 0, 0]
    assert df["deg_a"].tolist() == [1, 1, 1]
    assert df["deg_b"].tolist() == [1, 0, 0]


def test_make_relational_rows_ignores_w_rel():
    # the reported graph must always come from DIRECT scores, even when
    # the caller's config has the blend enabled
    cfg = dataclasses.replace(SNDConfig(), w_rel=5.0)
    a = make_relational_rows(_mini_group(), cfg).to_pandas()
    b = make_relational_rows(_mini_group(), SNDConfig()).to_pandas()
    assert a.equals(b)
