"""token_cooccurrence: DuckDB parity on synthetic corpora incl. repeated
tokens (distinct-per-doc semantics), vocabulary cut ties, and empty docs."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.text_analysis import token_cooccurrence


def _oracle(df: pd.DataFrame, vocab_k: int, k: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.sql(f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS token
            FROM documents),
        nz AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        vocab AS (
            SELECT token FROM (
                SELECT token, count(*) AS cnt FROM nz GROUP BY token
                ORDER BY cnt DESC, token ASC LIMIT {vocab_k})),
        vt AS (SELECT DISTINCT n.doc_id, n.token
               FROM nz n JOIN vocab v USING (token))
        SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS cnt
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2 ORDER BY cnt DESC, tok_a ASC, tok_b ASC LIMIT {k}
    """).df()


def _check(df: pd.DataFrame, vocab_k: int = 16, k: int = 40):
    out = token_cooccurrence(rd.from_pandas(df), "text",
                             vocab_k=vocab_k, k=k)
    orc = _oracle(df, vocab_k, k)
    orc["cnt"] = orc["cnt"].astype(np.int64)
    pd.testing.assert_frame_equal(out, orc)


class TestTokenCooccurrence:
    def test_random_corpus(self):
        rng = np.random.RandomState(2)
        words = [f"w{i}" for i in range(30)]
        docs = [" ".join(rng.choice(words, rng.randint(1, 12)))
                for _ in range(400)]
        _check(pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs}))

    def test_repeats_count_once_per_doc(self):
        df = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["cat dog cat dog cat", "cat dog"]})
        out = token_cooccurrence(rd.from_pandas(df), "text", vocab_k=4, k=10)
        assert len(out) == 1
        assert (out.iloc[0]["tok_a"], out.iloc[0]["tok_b"],
                out.iloc[0]["cnt"]) == ("cat", "dog", 2)

    def test_vocab_cut_and_empty_docs(self):
        rng = np.random.RandomState(8)
        words = [f"t{i}" for i in range(25)]
        docs = [" ".join(rng.choice(words, rng.randint(0, 8)))
                for _ in range(300)]
        docs += ["", "   ", "!!!"]
        df = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})
        _check(df, vocab_k=7, k=15)

    def test_punctuation_and_case(self):
        df = pd.DataFrame({"doc_id": [0, 1, 2],
                           "text": ["Foo, BAR! foo", "bar;foo", "BAZ bar"]})
        _check(df, vocab_k=3, k=10)
