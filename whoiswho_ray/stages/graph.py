"""Iterative graph analytics — distributed PageRank.

The iterative-shuffle workload class (beyond the one-shot transitive
closure in ``cluster.connected_components``): each Lloyd-style round
moves edge contributions through one co-group join and one bucketed
reduce. The canonical random-surfer formulation (Page et al. 1999) with
dangling-mass redistribution:

    r_{t+1}(v) = (1−d)/N + d·( Σ_{u→v} r_t(u)/outdeg(u) + dangling_t/N )
    dangling_t = Σ_{u: outdeg(u)=0} r_t(u)

Scale shape, per iteration (the graph never concentrates anywhere):

* the static ``1/outdeg`` weight attaches to the EDGE table once up
  front (one bucketed co-group), so iterations never re-join degrees;
* contributions = (rank state) ⋈ (weighted edges) on the source node —
  one hash-bucketed co-group, one vectorized merge + per-destination
  pre-aggregation inside each bucket task;
* the new state = one bucketed reduce over [contributions ∪ per-node
  teleport skeleton], which also re-attaches the static ``has_out``
  flag (carried as tagged rows through the same shuffle — no extra
  join);
* the dangling mass is the only driver-side value — one float per
  iteration from a map-side partial sum.

Float determinism follows the engine's usual regime: per-edge terms are
identical IEEE ops; only sum order differs across engines (~1e-16
relative), which the oracle absorbs by comparing ranks rounded to 9
decimals (margin ≥ 1e-7 to the grid verified on the driver corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd


def _bucketed(ds: "rd.Dataset", col: str):
    from whoiswho_ray.stages.cluster import _bucket_by, _cc_num_buckets

    return _bucket_by(ds, col, _cc_num_buckets())


def attach_out_weights(edges: "rd.Dataset", src_col: str, dst_col: str) -> "rd.Dataset":
    """edges → (src, dst, inv) with inv = 1/outdeg(src): one grouped
    count over src (bucketed final) + one bucketed co-group attach."""
    from whoiswho_ray.stages.agg import grouped_agg

    deg = grouped_agg(edges, src_col, {"m": (None, "count")}, final="shuffle")

    def tag_e(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[src_col], "dst": df[dst_col],
                             "m": np.zeros(len(df), np.int64),
                             "__side": ["e"] * len(df)})

    def tag_d(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[src_col], "dst": [""] * len(df),
                             "m": df["m"].astype(np.int64),
                             "__side": ["d"] * len(df)})

    both = edges.map_batches(tag_e, batch_format="pandas").union(
        deg.map_batches(tag_d, batch_format="pandas"))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        df = g.drop(columns="__bucket")
        e = df[df["__side"] == "e"]
        d = df[df["__side"] == "d"][["node", "m"]]
        if not len(e):
            return pd.DataFrame({"src": pd.Series([], dtype=object),
                                 "dst": pd.Series([], dtype=object),
                                 "inv": pd.Series([], dtype=np.float64)})
        out = e[["node", "dst"]].merge(d, on="node")
        return pd.DataFrame({"src": out["node"], "dst": out["dst"],
                             "inv": 1.0 / out["m"].to_numpy(np.float64)})

    return _bucketed(both, "node").groupby("__bucket").map_groups(
        attach, batch_format="pandas")


def pagerank(
    edges: "rd.Dataset",
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "rd.Dataset":
    """(src, dst) edge table → (node, rank) after ``iters`` power
    iterations from the uniform start. Multi-edges contribute once each
    (pass a distinct edge table for simple-graph semantics)."""
    from whoiswho_ray.stages.agg import distinct

    d = float(damping)
    nodes = distinct(
        edges.map_batches(lambda df: pd.DataFrame(
            {"node": pd.concat([df[src_col], df[dst_col]])}),
            batch_format="pandas"),
        ["node"], final="shuffle").materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_pandas(pd.DataFrame(
            {"node": pd.Series([], dtype=object),
             "rank": pd.Series([], dtype=np.float64)}))

    ew = attach_out_weights(edges, src_col, dst_col).materialize()
    r0 = 1.0 / n

    # has_out is static: stamp it once via a bucketed co-group of the
    # node table with the distinct source set (both stay distributed)
    srcs = distinct(ew.map_batches(
        lambda df: pd.DataFrame({"node": df["src"]}), batch_format="pandas"),
        ["node"], final="shuffle")

    def tag_n(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "__side": ["n"] * len(df)})

    def tag_s(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "__side": ["s"] * len(df)})

    def init_state(g: pd.DataFrame, _r0=r0) -> pd.DataFrame:
        df = g.drop(columns="__bucket")
        is_src = set(df.loc[df["__side"] == "s", "node"])
        nn = df[df["__side"] == "n"]
        return pd.DataFrame({
            "node": nn["node"],
            "r": np.full(len(nn), _r0),
            "has_out": nn["node"].isin(is_src).to_numpy(),
        })

    tagged_init = nodes.map_batches(tag_n, batch_format="pandas").union(
        srcs.map_batches(tag_s, batch_format="pandas"))
    state = _bucketed(tagged_init, "node").groupby("__bucket").map_groups(
        init_state, batch_format="pandas").materialize()

    for _ in range(iters):
        dang = state.map_batches(
            lambda df: pd.DataFrame({"s": [df.loc[~df["has_out"], "r"].sum()]}),
            batch_format="pandas").sum("s") or 0.0
        base = (1.0 - d) / n + d * float(dang) / n

        def tag_state(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"],
                                 "dst": [""] * len(df),
                                 "val": df["r"].to_numpy(np.float64),
                                 "__side": ["r"] * len(df)})

        def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df["src"], "dst": df["dst"],
                                 "val": df["inv"].to_numpy(np.float64),
                                 "__side": ["e"] * len(df)})

        both = state.map_batches(tag_state, batch_format="pandas").union(
            ew.map_batches(tag_edges, batch_format="pandas"))

        def contribute(g: pd.DataFrame, _d=d) -> pd.DataFrame:
            df = g.drop(columns="__bucket")
            r = df[df["__side"] == "r"][["node", "val"]].rename(columns={"val": "r"})
            e = df[df["__side"] == "e"]
            if not len(e) or not len(r):
                return pd.DataFrame({"node": pd.Series([], dtype=object),
                                     "c": pd.Series([], dtype=np.float64)})
            m = e.merge(r, on="node")
            m["c"] = _d * m["r"].to_numpy() * m["val"].to_numpy()
            out = m.groupby("dst", sort=False)["c"].sum().reset_index()
            return out.rename(columns={"dst": "node"})

        contrib = _bucketed(both, "node").groupby("__bucket").map_groups(
            contribute, batch_format="pandas")

        def skeleton(df: pd.DataFrame, _base=base) -> pd.DataFrame:
            return pd.DataFrame({"node": df["node"],
                                 "c": np.full(len(df), _base),
                                 "flag": df["has_out"].astype(np.int64) + 1})

        def tag_c(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["flag"] = np.zeros(len(df), np.int64)
            return out

        merged = contrib.map_batches(tag_c, batch_format="pandas").union(
            state.map_batches(skeleton, batch_format="pandas"))

        def reduce_node(g: pd.DataFrame) -> pd.DataFrame:
            df = g.drop(columns="__bucket")
            agg = df.groupby("node", sort=True).agg(
                r=("c", "sum"), flag=("flag", "max")).reset_index()
            return pd.DataFrame({"node": agg["node"], "r": agg["r"],
                                 "has_out": agg["flag"].to_numpy() == 2})

        state = _bucketed(merged, "node").groupby("__bucket").map_groups(
            reduce_node, batch_format="pandas").materialize()

    return state.map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "rank": df["r"]}),
        batch_format="pandas")
