"""Meta-blocking (stages/blocking.py meta_blocking) and duplicated-span
detection (stages/text_analysis.py dup_span_stats / ngram_explode) vs
brute force and DuckDB replays."""
import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.stages.blocking import meta_blocking
from whoiswho_ray.stages.text_analysis import dup_span_stats, ngram_explode


def _brute_grams(texts, n):
    """(row, gram) occurrences with the corpus tokenizer."""
    import re
    out = []
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z0-9]+", (t or "").lower()) if x]
        for j in range(len(toks) - n + 1):
            out.append((i, " ".join(toks[j:j + n])))
    return out


@pytest.fixture()
def doc_df():
    rng = np.random.default_rng(7)
    vocab = ["red", "blue", "fast", "key", "sort", "join", "row", "x9"]
    texts = []
    for i in range(120):
        toks = list(rng.choice(vocab, rng.integers(3, 30)))
        texts.append(" ".join(toks))
    # planted near-duplicate pair sharing a long run
    texts[5] = "alpha beta gamma delta epsilon zeta eta theta iota"
    texts[17] = "PRE alpha beta gamma delta epsilon zeta eta theta iota POST"
    texts[30] = ""          # empty doc
    texts[31] = "one two"   # too short for 5-grams
    return pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                         "text": texts})


class TestNgramExplode:
    def test_matches_brute(self, ray_session, doc_df):
        out = ngram_explode(rd.from_pandas(doc_df).repartition(4),
                            n=5).to_pandas()
        got = sorted(map(tuple, out[["doc_id", "gram"]].itertuples(index=False)))
        exp = sorted(_brute_grams(doc_df["text"], 5))
        assert got == exp

    def test_boundary_and_case(self, ray_session):
        df = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["A-b c!d e", "x y"]})
        out = ngram_explode(rd.from_pandas(df), n=2).to_pandas()
        got = set(map(tuple, out[["doc_id", "gram"]].itertuples(index=False)))
        assert got == {(0, "a b"), (0, "b c"), (0, "c d"), (0, "d e"),
                       (1, "x y")}

    def test_null_and_short(self, ray_session):
        df = pd.DataFrame({"doc_id": [0, 1, 2],
                           "text": [None, "", "just four little words"]})
        out = ngram_explode(rd.from_pandas(df), n=5).to_pandas()
        assert len(out) == 0


class TestDupSpans:
    def test_vs_duckdb(self, ray_session, doc_df):
        out = dup_span_stats(rd.from_pandas(doc_df).repartition(4),
                             n=5).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", doc_df)
        orc = con.sql("""
            WITH ts AS (SELECT doc_id, list_filter(string_split_regex(
                            lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
                        FROM documents),
            g AS (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS gram
                  FROM ts, unnest(range(1, len(t)-3)) AS u(i)),
            dup AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g)
                    GROUP BY gram HAVING count(*) >= 2)
            SELECT doc_id, count(*) AS n_spans,
                   count(*) FILTER (WHERE gram IN (SELECT gram FROM dup))
                       AS n_dup
            FROM g GROUP BY doc_id ORDER BY doc_id""").df()
        pd.testing.assert_frame_equal(
            out[["doc_id", "n_spans", "n_dup"]],
            orc.astype({"n_spans": "int64", "n_dup": "int64"}))

    def test_planted_pair_flagged(self, ray_session, doc_df):
        out = dup_span_stats(rd.from_pandas(doc_df), n=5).to_pandas()
        d5 = out[out["doc_id"] == 5].iloc[0]
        # doc 5's 9 tokens are fully contained in doc 17: every span dup
        assert d5["n_spans"] == 5 and d5["n_dup"] == 5
        d17 = out[out["doc_id"] == 17].iloc[0]
        assert d17["n_dup"] == 5 and d17["n_spans"] == 7


def _brute_meta(memb: pd.DataFrame, cap: int, prune: str):
    m = memb.drop_duplicates()
    sizes = m.groupby("key")["id"].nunique()
    ok = sizes[(sizes >= 2) & (sizes <= cap)].index
    mm = m[m["key"].isin(ok)]
    edges = {}
    for _, g in mm.groupby("key"):
        ids = sorted(g["id"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                edges[(ids[i], ids[j])] = edges.get((ids[i], ids[j]), 0) + 1
    if not edges:
        return set()
    if prune == "wep":
        n, s = len(edges), sum(edges.values())
        return {(a, b, c) for (a, b), c in edges.items() if c * n > s}
    node = {}
    for (a, b), c in edges.items():
        for x in (a, b):
            sn, ss = node.get(x, (0, 0))
            node[x] = (sn + 1, ss + c)
    keep = set()
    for (a, b), c in edges.items():
        na, sa = node[a]
        nb, sb = node[b]
        if c * na >= sa or c * nb >= sb:
            keep.add((a, b, c))
    return keep


class TestMetaBlocking:
    @pytest.fixture()
    def memb(self):
        rng = np.random.default_rng(3)
        rows = []
        for rid in range(60):
            for k in rng.choice(40, rng.integers(1, 6), replace=False):
                rows.append((np.int64(rid), f"k{k}"))
        rows += [(np.int64(0), "k0")] * 3        # duplicate memberships
        rows += [(np.int64(i), "hot") for i in range(50)]  # oversized block
        return pd.DataFrame(rows, columns=["id", "key"])

    @pytest.mark.parametrize("prune", ["wep", "wnp"])
    def test_vs_brute(self, ray_session, memb, prune):
        out = meta_blocking(rd.from_pandas(memb).repartition(4),
                            "id", "key", max_block_size=16,
                            prune=prune).to_pandas()
        got = set(map(tuple, out[["id_a", "id_b", "cbs"]]
                      .astype("int64").itertuples(index=False)))
        assert got == _brute_meta(memb, 16, prune)

    def test_oversized_block_purged(self, ray_session, memb):
        out = meta_blocking(rd.from_pandas(memb), "id", "key",
                            max_block_size=16, prune="wnp").to_pandas()
        # the 50-member "hot" block alone would connect ids 40..49, which
        # have at most 5 random keys each; check no edge exists that ONLY
        # the hot block explains
        exp = _brute_meta(memb, 16, "wnp")
        ids_in = {(a, b) for a, b, _ in exp}
        got = set(map(tuple, out[["id_a", "id_b"]].itertuples(index=False)))
        assert got == ids_in

    def test_empty_input(self, ray_session):
        memb = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                             "key": pd.Series([], dtype="string")})
        out = meta_blocking(rd.from_pandas(memb), "id", "key").to_pandas()
        assert len(out) == 0

    def test_uniform_weights(self, ray_session):
        # all CBS equal: WEP (strict >) drops everything, WNP (>=) keeps all
        memb = pd.DataFrame({"id": [1, 2, 3, 4],
                             "key": ["a", "a", "b", "b"]})
        wep = meta_blocking(rd.from_pandas(memb), "id", "key",
                            prune="wep").to_pandas()
        wnp = meta_blocking(rd.from_pandas(memb), "id", "key",
                            prune="wnp").to_pandas()
        assert len(wep) == 0 and len(wnp) == 2
