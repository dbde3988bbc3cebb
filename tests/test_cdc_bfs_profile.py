"""Round-5 batch: CDC changelog apply, multi-source BFS, interval merge,
transition counts, column profiling — DuckDB parity + brute-force parity
incl. NULL keys, tombstone shadowing, disconnected graphs, nested/touching
intervals, and all-null profile columns."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.cdc import apply_changelog
from whoiswho_ray.stages.graph import bfs_distances
from whoiswho_ray.stages.profile import profile_columns
from whoiswho_ray.stages.windows import merge_intervals, transition_counts


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), na_position="last",
                          ignore_index=True)


def _assert_frames(a: pd.DataFrame, b: pd.DataFrame):
    a, b = _sorted(a), _sorted(b)
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        av, bv = a[c].to_numpy(object), b[c].to_numpy(object)
        same = (av == bv) | (pd.isna(av.astype(object)) & pd.isna(bv.astype(object)))
        assert same.all(), (c, np.flatnonzero(~same)[:5], a[c][~same][:3], b[c][~same][:3])


class TestApplyChangelog:
    def _brute(self, df, tombstones=("D",)):
        df = df.sort_values(["k", "o1", "o2"], kind="stable")
        last = df[~df["k"].duplicated(keep="last")]
        return last[~last["op"].isin(tombstones)].reset_index(drop=True)

    def test_random_parity(self):
        rng = np.random.default_rng(5)
        n = 4000
        df = pd.DataFrame({
            "k": rng.integers(0, 300, n),
            "o1": rng.integers(0, 50, n),
            "o2": np.arange(n, dtype=np.int64),  # unique tie-break
            "op": rng.choice(["U", "U", "U", "D"], n),
            "pay": rng.integers(-100, 100, n),
        })
        out = apply_changelog(rd.from_pandas(df), "k", ["o1", "o2"], "op",
                              tombstones=("D",), payload_cols=["pay"]
                              ).to_pandas()
        _assert_frames(out, self._brute(df))

    def test_tombstone_shadows_earlier_upserts(self):
        # a delete as the LAST op removes the key even though upserts exist
        df = pd.DataFrame({"k": [1, 1, 2, 2], "o1": [0, 1, 0, 1],
                           "o2": [0, 1, 2, 3],
                           "op": ["U", "D", "D", "U"],
                           "pay": [10, 20, 30, 40]})
        out = apply_changelog(rd.from_pandas(df), "k", ["o1", "o2"], "op",
                              tombstones=("D",), payload_cols=["pay"]
                              ).to_pandas()
        assert out["k"].tolist() == [2]
        assert out["pay"].tolist() == [40]

    def test_null_keys_compact_together(self):
        df = pd.DataFrame({"k": [np.nan, np.nan, 3.0], "o1": [0, 1, 0],
                           "o2": [0, 1, 2], "op": ["U", "U", "U"],
                           "pay": [1, 2, 3]})
        out = apply_changelog(rd.from_pandas(df), "k", ["o1", "o2"], "op",
                              payload_cols=["pay"]).to_pandas()
        assert len(out) == 2  # one NULL-key snapshot row + key 3
        assert set(out["pay"]) == {2, 3}


class TestBfsDistances:
    def _brute(self, edges, sources, max_hops):
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
        dist = {s: 0 for s in sources}
        frontier = set(sources)
        for h in range(1, max_hops + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = h
                        nxt.add(v)
            frontier = nxt
        return pd.DataFrame({"node": list(dist), "dist": list(dist.values())})

    def test_random_undirected_parity(self):
        rng = np.random.default_rng(7)
        m = 400
        a = rng.integers(0, 120, m)
        b = rng.integers(0, 120, m)
        keep = a != b
        pairs = {(f"n{u}", f"n{v}") for u, v in zip(a[keep], b[keep])}
        sym = sorted(pairs | {(v, u) for u, v in pairs})
        edges = pd.DataFrame(sym, columns=["src", "dst"])
        sources = [f"n{i}" for i in range(0, 120, 13)]
        out = bfs_distances(rd.from_pandas(edges),
                            rd.from_pandas(pd.DataFrame({"node": sources})),
                            max_hops=4).to_pandas()
        _assert_frames(out, self._brute(sym, sources, 4))

    def test_disconnected_and_early_stop(self):
        # two components; sources only in one — the other stays absent,
        # and the frontier drains before max_hops (early-break path)
        edges = pd.DataFrame({"src": ["a", "b", "x", "y"],
                              "dst": ["b", "a", "y", "x"]})
        out = bfs_distances(rd.from_pandas(edges),
                            rd.from_pandas(pd.DataFrame({"node": ["a"]})),
                            max_hops=10).to_pandas()
        assert dict(zip(out["node"], out["dist"])) == {"a": 0, "b": 1}

    def test_directed_distances(self):
        # chain a->b->c: directed, so nothing reaches a
        edges = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
        out = bfs_distances(rd.from_pandas(edges),
                            rd.from_pandas(pd.DataFrame({"node": ["a"]})),
                            max_hops=5).to_pandas()
        assert dict(zip(out["node"], out["dist"])) == {"a": 0, "b": 1, "c": 2}


class TestMergeIntervals:
    def _oracle(self, df):
        con = duckdb.connect()
        con.register("iv", df)
        return con.sql("""
            WITH w AS (
                SELECT *, max(e) OVER (PARTITION BY k ORDER BY s, e
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS pmax
                FROM iv),
            isl AS (
                SELECT *, sum(CASE WHEN pmax IS NULL OR s > pmax
                                   THEN 1 ELSE 0 END)
                          OVER (PARTITION BY k ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) AS gid
                FROM w)
            SELECT k, min(s) AS island_start, max(e) AS island_end,
                   count(*) AS n_intervals
            FROM isl GROUP BY k, gid
        """).df()

    def test_random_int_intervals(self):
        rng = np.random.default_rng(11)
        n = 3000
        s = rng.integers(0, 500, n)
        df = pd.DataFrame({"k": rng.integers(0, 40, n),
                           "s": s, "e": s + rng.integers(1, 30, n)})
        out = merge_intervals(rd.from_pandas(df), "k", "s", "e").to_pandas()
        _assert_frames(out, self._oracle(df))

    def test_nested_touching_point(self):
        # nested [0,10]⊃[2,3], touching [10,12] (merges: s == pmax),
        # gap to [13,13] point interval
        df = pd.DataFrame({"k": [1, 1, 1, 1],
                           "s": [0, 2, 10, 13], "e": [10, 3, 12, 13]})
        out = merge_intervals(rd.from_pandas(df), "k", "s", "e").to_pandas()
        out = out.sort_values("island_start", ignore_index=True)
        assert out["island_start"].tolist() == [0, 13]
        assert out["island_end"].tolist() == [12, 13]
        assert out["n_intervals"].tolist() == [3, 1]

    def test_timestamps(self):
        ts = pd.to_datetime("2024-01-01") + pd.to_timedelta([0, 5, 60], "m")
        df = pd.DataFrame({"k": [1, 1, 1], "s": ts,
                           "e": ts + pd.to_timedelta([6, 2, 1], "m")})
        out = merge_intervals(rd.from_pandas(df), "k", "s", "e").to_pandas()
        assert len(out) == 2
        assert out["n_intervals"].sum() == 3


class TestTransitionCounts:
    def test_duckdb_parity(self):
        rng = np.random.default_rng(13)
        n = 5000
        df = pd.DataFrame({
            "k": rng.integers(0, 80, n),
            "o": np.arange(n, dtype=np.int64),
            "st": rng.choice(["a", "b", "c", "d"], n),
        })
        out = transition_counts(rd.from_pandas(df), "k", ["o"], "st"
                                ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        orc = con.sql("""
            WITH seq AS (
                SELECT st AS prev_state,
                       lead(st) OVER (PARTITION BY k ORDER BY o) AS next_state
                FROM t),
            cnt AS (SELECT prev_state, next_state, count(*) AS n
                    FROM seq WHERE next_state IS NOT NULL GROUP BY 1, 2)
            SELECT prev_state, next_state, n,
                   CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_state) AS p
            FROM cnt
        """).df()
        _assert_frames(out, orc)

    def test_singleton_keys_emit_nothing(self):
        df = pd.DataFrame({"k": [1, 2, 3], "o": [0, 1, 2],
                           "st": ["a", "b", "c"]})
        out = transition_counts(rd.from_pandas(df), "k", ["o"], "st"
                                ).to_pandas()
        assert len(out) == 0

    def test_probabilities_sum_to_one_per_prev(self):
        df = pd.DataFrame({"k": [1] * 6, "o": range(6),
                           "st": ["a", "b", "a", "c", "a", "b"]})
        out = transition_counts(rd.from_pandas(df), "k", ["o"], "st"
                                ).to_pandas()
        sums = out.groupby("prev_state")["p"].sum()
        assert np.allclose(sums.to_numpy(), 1.0)


class TestProfileColumns:
    def test_duckdb_parity_with_nulls(self):
        rng = np.random.default_rng(17)
        n = 4000
        i = rng.integers(-50, 5000, n).astype(object)
        i[rng.random(n) < 0.1] = None
        s = rng.choice(["x", "yy", "zzz", "w"], n).astype(object)
        s[rng.random(n) < 0.05] = None
        df = pd.DataFrame({"a": pd.array([None if v is None else int(v) for v in i],
                                         dtype="Int64"),
                           "b": s})
        out = profile_columns(rd.from_pandas(df), ["a", "b"]).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        orc = con.sql("""
            SELECT 'a' AS col, count(*) AS n_rows,
                   count(*) - count(a) AS n_null,
                   count(DISTINCT a) AS n_distinct,
                   CAST(min(a) AS VARCHAR) AS min_value,
                   CAST(max(a) AS VARCHAR) AS max_value FROM t
            UNION ALL
            SELECT 'b', count(*), count(*) - count(b),
                   count(DISTINCT b),
                   CAST(min(b) AS VARCHAR), CAST(max(b) AS VARCHAR) FROM t
        """).df()
        _assert_frames(out, orc)

    def test_all_null_column(self):
        df = pd.DataFrame({"a": pd.array([None, None], dtype="Int64"),
                           "b": ["p", "q"]})
        out = profile_columns(rd.from_pandas(df), ["a", "b"]).to_pandas()
        row = out[out["col"] == "a"].iloc[0]
        assert row["n_null"] == 2 and row["n_distinct"] == 0
        assert pd.isna(row["min_value"]) and pd.isna(row["max_value"])


class TestKcore:
    def _brute(self, sym_pairs, k):
        adj = {}
        for u, v in sym_pairs:
            adj.setdefault(u, set()).add(v)
        nodes = set(adj)
        while True:
            drop = {u for u in nodes if len(adj[u] & nodes) < k}
            if not drop:
                break
            nodes -= drop
        return pd.DataFrame(
            {"node": sorted(nodes),
             "core_deg": [len(adj[u] & nodes) for u in sorted(nodes)]})

    def _run(self, sym_pairs, k):
        from whoiswho_ray.stages.graph import kcore
        edges = pd.DataFrame(sorted(sym_pairs), columns=["src", "dst"])
        return kcore(rd.from_pandas(edges), k=k).to_pandas()

    def test_random_parity(self):
        rng = np.random.default_rng(29)
        a = rng.integers(0, 90, 500)
        b = rng.integers(0, 90, 500)
        keep = a != b
        pairs = {(f"n{u}", f"n{v}") for u, v in zip(a[keep], b[keep])}
        sym = pairs | {(v, u) for u, v in pairs}
        out = self._run(sym, 4)
        _assert_frames(out, self._brute(sym, 4))

    def test_path_graph_multi_round_peel(self):
        # path a0-a1-...-a9 with k=2 peels 2 ends per round — 5 rounds
        # to an empty core (the long-peel regime the unrolled oracle's
        # margin guards against)
        pairs = {(f"a{i}", f"a{i+1}") for i in range(9)}
        sym = pairs | {(v, u) for u, v in pairs}
        out = self._run(sym, 2)
        assert len(out) == 0

    def test_core_with_tail(self):
        # K4 clique + a pendant chain: the 3-core is exactly the clique
        clique = {(f"c{i}", f"c{j}") for i in range(4) for j in range(4)
                  if i != j}
        tail = {("c0", "t1"), ("t1", "c0"), ("t1", "t2"), ("t2", "t1")}
        out = self._run(clique | tail, 3)
        assert sorted(out["node"]) == ["c0", "c1", "c2", "c3"]
        assert set(out["core_deg"]) == {3}


class TestDocKeywords:
    def _check(self, docs: pd.DataFrame, k: int):
        import duckdb

        from whoiswho_ray.stages.text_analysis import doc_keywords
        out = doc_keywords(rd.from_pandas(docs), k=k).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        orc = con.sql(f"""
            WITH tok AS (
                SELECT doc_id, t.token
                FROM documents,
                     unnest(regexp_split_to_array(lower(text),
                                                  '[^a-z0-9]+')) AS t(token)
                WHERE t.token <> ''),
            pairs AS (SELECT doc_id, token, count(*) AS tf
                      FROM tok GROUP BY 1, 2),
            dfc AS (SELECT token, count(*) AS df FROM pairs GROUP BY 1),
            scored AS (SELECT p.doc_id, p.token, p.tf, d.df,
                              CAST(p.tf AS DOUBLE) / d.df AS score
                       FROM pairs p JOIN dfc d USING (token)),
            ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, token) AS rank
                       FROM scored)
            SELECT doc_id, rank, token, tf, df, score
            FROM ranked WHERE rank <= {k}
        """).df()
        _assert_frames(out, orc)

    def test_random_corpus_parity(self):
        rng = np.random.default_rng(31)
        vocab = [f"w{i}" for i in range(30)]
        docs = pd.DataFrame({
            "doc_id": np.arange(120, dtype=np.int64),
            "text": [" ".join(rng.choice(vocab, rng.integers(1, 40)))
                     for _ in range(120)],
        })
        self._check(docs, 3)

    def test_short_docs_and_ties(self):
        # doc 1 has 2 distinct tokens (< k); docs 2/3 make 'b' and 'c'
        # equal-df so doc 1's tie breaks on token order
        docs = pd.DataFrame({
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": ["b c", "b x x", "c y y"],
        })
        self._check(docs, 3)
        from whoiswho_ray.stages.text_analysis import doc_keywords
        out = doc_keywords(rd.from_pandas(docs), k=3).to_pandas()
        d1 = out[out["doc_id"] == 1].sort_values("rank")
        assert d1["token"].tolist() == ["b", "c"]  # tie -> token asc


class TestHits:
    def _brute(self, edges_df, iters=3):
        nodes = np.array(sorted(set(edges_df["src"]) | set(edges_df["dst"])),
                         dtype=object)
        pos = {v: i for i, v in enumerate(nodes)}
        si = edges_df["src"].map(pos).to_numpy()
        di = edges_df["dst"].map(pos).to_numpy()
        n = len(nodes)
        h = np.ones(n)
        for _ in range(iters):
            a = np.zeros(n)
            np.add.at(a, di, h[si])
            a = a / np.sqrt((a * a).sum())
            h = np.zeros(n)
            np.add.at(h, si, a[di])
            h = h / np.sqrt((h * h).sum())
        return pd.DataFrame({"node": nodes, "hub": h, "auth": a})

    def test_random_directed_parity(self):
        from whoiswho_ray.stages.graph import hits
        rng = np.random.default_rng(37)
        m = 300
        edges = pd.DataFrame({
            "src": [f"u{i}" for i in rng.integers(0, 50, m)],
            "dst": [f"v{i}" for i in rng.integers(0, 40, m)],
        }).drop_duplicates(ignore_index=True)
        out = hits(rd.from_pandas(edges), iters=3).to_pandas()
        exp = self._brute(edges)
        out = out.sort_values("node", ignore_index=True)
        assert out["node"].tolist() == exp["node"].tolist()
        # same math, only sum order differs
        assert np.allclose(out["hub"], exp["hub"], rtol=1e-12, atol=1e-14)
        assert np.allclose(out["auth"], exp["auth"], rtol=1e-12, atol=1e-14)

    def test_star_graph_semantics(self):
        # u points at 3 sinks: u is the only hub, sinks share authority
        from whoiswho_ray.stages.graph import hits
        edges = pd.DataFrame({"src": ["u", "u", "u"],
                              "dst": ["a", "b", "c"]})
        out = hits(rd.from_pandas(edges), iters=2).to_pandas(
        ).set_index("node")
        assert out.loc["u", "hub"] == 1.0
        assert np.isclose(out.loc["a", "auth"], 1 / np.sqrt(3))
        assert out.loc["a", "hub"] == 0.0 and out.loc["u", "auth"] == 0.0


class TestFdViolations:
    def test_holds_and_violations(self):
        from whoiswho_ray.stages.profile import fd_violations
        df = pd.DataFrame({
            "k": [1, 1, 2, 2, 3],
            "v": ["a", "a", "b", "c", "d"],   # k=2 violates k->v
        })
        out = fd_violations(rd.from_pandas(df), "k", "v")
        assert out.iloc[0]["n_groups"] == 3
        assert out.iloc[0]["n_violations"] == 1
        assert not out.iloc[0]["holds"]
        out2 = fd_violations(rd.from_pandas(df), "v", "k")
        assert out2.iloc[0]["holds"]  # v->k holds (a,b,c,d map uniquely)

    def test_null_dep_counts_as_value(self):
        from whoiswho_ray.stages.profile import fd_violations
        df = pd.DataFrame({"k": [1, 1, 2], "v": ["a", None, "b"]})
        out = fd_violations(rd.from_pandas(df), "k", "v")
        # k=1 carries {a, NULL} — two distinct dependents, a violation
        assert out.iloc[0]["n_violations"] == 1


class TestGoldenRecords:
    def test_duckdb_parity_all_rules(self):
        from whoiswho_ray.stages.fusion import golden_records
        rng = np.random.default_rng(41)
        n = 3000
        df = pd.DataFrame({
            "c": rng.integers(0, 80, n),
            "id": np.arange(n, dtype=np.int64),
            "lab": rng.choice(["x", "y", "zz"], n),
            "name": rng.choice(["al", "bob", "carol", "dan"], n),
            "sz": rng.integers(0, 1000, n),
        })
        out = golden_records(
            rd.from_pandas(df), "c",
            {"id": "min", "lab": "mode", "name": "longest", "sz": "max"}
        ).to_pandas()
        con = duckdb.connect()
        con.register("d", df)
        orc = con.sql("""
            WITH mn AS (SELECT c, min(id) AS id, max(sz) AS sz
                        FROM d GROUP BY 1),
            lm AS (SELECT c, lab, count(*) AS n FROM d GROUP BY 1, 2),
            lw AS (SELECT c, lab FROM (
                     SELECT c, lab, row_number() OVER (PARTITION BY c
                         ORDER BY n DESC, lab) AS rn FROM lm) WHERE rn = 1),
            sw AS (SELECT c, name FROM (
                     SELECT c, name, row_number() OVER (PARTITION BY c
                         ORDER BY length(name) DESC, name) AS rn
                     FROM (SELECT DISTINCT c, name FROM d)) WHERE rn = 1)
            SELECT mn.c, mn.id, lw.lab, sw.name, mn.sz
            FROM mn JOIN lw USING (c) JOIN sw USING (c)
        """).df()
        _assert_frames(out, orc)

    def test_null_handling(self):
        from whoiswho_ray.stages.fusion import golden_records
        df = pd.DataFrame({
            "c": [1, 1, 1, 2, 2],
            "v": ["a", "a", None, None, None],     # mode skips NULLs
            "s": [None, "xy", "z", None, None],    # longest skips NULLs
            "m": pd.array([3, None, 1, None, None], dtype="Int64"),
        })
        out = golden_records(rd.from_pandas(df), "c",
                             {"v": "mode", "s": "longest", "m": "min"}
                             ).to_pandas().set_index("c")
        assert out.loc[1, "v"] == "a" and out.loc[1, "s"] == "xy"
        assert out.loc[1, "m"] == 1
        # all-null fields survive as NULL
        assert pd.isna(out.loc[2, "v"]) and pd.isna(out.loc[2, "s"])
        assert pd.isna(out.loc[2, "m"])

    def test_mode_tie_breaks_smallest(self):
        from whoiswho_ray.stages.fusion import golden_records
        df = pd.DataFrame({"c": [1, 1, 1, 1], "v": ["b", "b", "a", "a"]})
        out = golden_records(rd.from_pandas(df), "c", {"v": "mode"}
                             ).to_pandas()
        assert out["v"].tolist() == ["a"]

    def test_unknown_rule_raises(self):
        from whoiswho_ray.stages.fusion import golden_records
        import pytest
        with pytest.raises(ValueError):
            golden_records(rd.from_pandas(pd.DataFrame({"c": [1], "v": [1]})),
                           "c", {"v": "newest"})


class TestNullKeyAndEmptyEdgeRegressions:
    def test_kcore_hub_outlives_its_edges(self):
        # star: hub deg 3 survives round 1 at k=2, all spokes die — the
        # edge set empties while a survivor remains; the 2-core is empty
        from whoiswho_ray.stages.graph import kcore
        pairs = {("h", "a"), ("h", "b"), ("h", "c")}
        sym = pairs | {(v, u) for u, v in pairs}
        edges = pd.DataFrame(sorted(sym), columns=["src", "dst"])
        out = kcore(rd.from_pandas(edges), k=2).to_pandas()
        assert len(out) == 0

    def test_transitions_null_keys_group_together(self):
        # SQL PARTITION BY groups NULLs: two NULL-key rows form a pair
        df = pd.DataFrame({"k": [np.nan, np.nan, 1.0],
                           "o": [0, 1, 2],
                           "st": ["a", "b", "c"]})
        out = transition_counts(rd.from_pandas(df), "k", ["o"], "st"
                                ).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["prev_state"] == "a"
        assert out.iloc[0]["next_state"] == "b"

    def test_merge_intervals_null_key_islands_split(self):
        # NULL-key intervals partition together but gaps still split
        df = pd.DataFrame({"k": [np.nan, np.nan, np.nan],
                           "s": [0, 5, 100], "e": [10, 7, 110]})
        out = merge_intervals(rd.from_pandas(df), "k", "s", "e").to_pandas()
        assert len(out) == 2
        assert sorted(out["n_intervals"]) == [1, 2]


class TestScd2Build:
    """SCD Type-2 build: run-collapse + validity ranges vs a DuckDB
    window-function replay and hand fixtures."""

    def _run(self, df, sentinel=-1, ties=("tid",)):
        from whoiswho_ray.stages.cdc import scd2_build
        out = scd2_build(rd.from_pandas(df).repartition(5), key="k",
                         order_col="o", payload_cols=["state"],
                         tiebreak_cols=list(ties),
                         current_sentinel=sentinel)
        return out.to_pandas()

    def test_duckdb_parity_random(self):
        rng = np.random.default_rng(17)
        n = 4000
        df = pd.DataFrame({
            "k": rng.integers(0, 60, n),
            "o": rng.integers(0, 10**6, n).astype(np.int64),
            "tid": np.arange(n, dtype=np.int64),
            "state": rng.choice(["a", "b", "c"], n),
        })
        got = self._run(df)
        want = duckdb.connect().execute("""
            WITH o AS (
                SELECT k, o AS ts, tid, state,
                       lag(state) OVER w AS prev, row_number() OVER w AS rn
                FROM df WINDOW w AS (PARTITION BY k ORDER BY o, tid)
            ), v AS (
                SELECT k, ts, tid, state FROM o
                WHERE rn = 1 OR prev IS DISTINCT FROM state
            )
            SELECT k, ts AS valid_from,
                   coalesce(lead(ts) OVER w2, -1) AS valid_to,
                   CAST(CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0
                        END AS BIGINT) AS is_current,
                   state
            FROM v WINDOW w2 AS (PARTITION BY k ORDER BY ts, tid)
        """).df()
        _assert_frames(got, want)

    def test_run_collapse_and_current(self):
        df = pd.DataFrame({
            "k": ["u", "u", "u", "u", "v"],
            "o": np.array([1, 2, 3, 4, 9], dtype=np.int64),
            "tid": np.arange(5, dtype=np.int64),
            "state": ["a", "a", "b", "b", "a"],
        })
        got = self._run(df).sort_values(["k", "valid_from"],
                                        ignore_index=True)
        # u: [1,3) a, [3,-1) b current; v: [9,-1) a current
        assert got["valid_from"].tolist() == [1, 3, 9]
        assert got["valid_to"].tolist() == [3, -1, -1]
        assert got["is_current"].tolist() == [0, 1, 1]
        assert got["state"].tolist() == ["a", "b", "a"]

    def test_null_payload_is_stable(self):
        # NULL -> NULL is NOT a change; NULL -> 'a' and 'a' -> NULL are.
        df = pd.DataFrame({
            "k": ["u"] * 4,
            "o": np.array([1, 2, 3, 4], dtype=np.int64),
            "tid": np.arange(4, dtype=np.int64),
            "state": [None, None, "a", None],
        })
        got = self._run(df).sort_values("valid_from", ignore_index=True)
        assert got["valid_from"].tolist() == [1, 3, 4]
        assert got["is_current"].tolist() == [0, 0, 1]

    def test_empty_and_partition_invariance(self):
        from whoiswho_ray.stages.cdc import scd2_build
        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "k": rng.integers(0, 9, 300),
            "o": rng.permutation(300).astype(np.int64),
            "tid": np.arange(300, dtype=np.int64),
            "state": rng.choice(["x", "y"], 300),
        })
        a = self._run(df)
        b = scd2_build(rd.from_pandas(df).repartition(31), key="k",
                       order_col="o", payload_cols=["state"],
                       tiebreak_cols=["tid"],
                       current_sentinel=-1).to_pandas()
        _assert_frames(a, b)


class TestKeySkew:
    def test_matches_duckdb(self):
        from whoiswho_ray.stages.profile import key_skew
        rng = np.random.default_rng(2)
        # zipf-ish: key 0 is hot
        keys = np.concatenate([np.zeros(500, np.int64),
                               rng.integers(1, 40, 1500)])
        df = pd.DataFrame({"k": keys})
        got = key_skew(rd.from_pandas(df).repartition(9), "k", top_n=5)
        want = duckdb.connect().execute("""
            WITH c AS (SELECT k, count(*) AS n FROM df GROUP BY 1),
            t AS (SELECT CAST(sum(n) AS BIGINT) tot, count(*) nk FROM c),
            r AS (SELECT k, n,
                         row_number() OVER (ORDER BY n DESC, k) rnk,
                         sum(n) OVER (ORDER BY n DESC, k
                                      ROWS UNBOUNDED PRECEDING) cum
                  FROM c)
            SELECT r.k, CAST(r.n AS BIGINT) n, CAST(r.rnk AS BIGINT) rank,
                   CAST(r.n AS DOUBLE)/t.tot AS share,
                   CAST(r.cum AS DOUBLE)/t.tot AS cum_share,
                   t.tot AS total_rows, CAST(t.nk AS BIGINT) AS n_keys
            FROM r, t WHERE rnk <= 5 ORDER BY rank
        """).df()
        _assert_frames(got, want)
        assert got["rank"].tolist() == [1, 2, 3, 4, 5]
        assert got.iloc[0]["k"] == 0 and got.iloc[0]["n"] == 500

    def test_fewer_keys_than_topn_and_empty(self):
        from whoiswho_ray.stages.profile import key_skew
        df = pd.DataFrame({"k": ["a", "a", "b"]})
        got = key_skew(rd.from_pandas(df), "k", top_n=10)
        assert len(got) == 2
        assert got["cum_share"].iloc[-1] == 1.0
        assert (got["total_rows"] == 3).all() and (got["n_keys"] == 2).all()
        empty = key_skew(rd.from_pandas(pd.DataFrame({"k": []})), "k")
        assert len(empty) == 0 and "cum_share" in empty.columns


class TestDebounce:
    def _run(self, df, gap):
        from whoiswho_ray.stages.windows import debounce
        out = debounce(rd.from_pandas(df).repartition(4), ["k"], "o",
                       min_gap=gap, tiebreak_cols=["tid"])
        return out.to_pandas().sort_values(["k", "o", "tid"],
                                           ignore_index=True)

    def test_matches_duckdb_lag(self):
        rng = np.random.default_rng(8)
        df = pd.DataFrame({
            "k": rng.integers(0, 25, 2000),
            "o": rng.integers(0, 500, 2000).astype(np.int64),
            "tid": np.arange(2000, dtype=np.int64),
        })
        got = self._run(df, gap=10)
        want = duckdb.connect().execute("""
            WITH x AS (SELECT k, o, tid,
                              lag(o) OVER (PARTITION BY k
                                           ORDER BY o, tid) AS prev
                       FROM df)
            SELECT k, o, tid FROM x WHERE prev IS NULL OR o - prev > 10
            ORDER BY k, o, tid
        """).df()
        _assert_frames(got, want)

    def test_semantics_non_greedy(self):
        # t=0,5,9 gap=6: 5 dropped (<=6 from 0); 9 dropped too — the lag
        # references the raw previous row (5), NOT the last kept row.
        df = pd.DataFrame({"k": ["u"] * 3,
                           "o": np.array([0, 5, 9], dtype=np.int64),
                           "tid": np.arange(3, dtype=np.int64)})
        got = self._run(df, gap=6)
        assert got["o"].tolist() == [0]

    def test_ties_keep_first_only(self):
        df = pd.DataFrame({"k": ["u", "u", "v"],
                           "o": np.array([3, 3, 3], dtype=np.int64),
                           "tid": np.array([2, 1, 9], dtype=np.int64)})
        got = self._run(df, gap=0)
        assert list(zip(got["k"], got["tid"])) == [("u", 1), ("v", 9)]
