"""Vectorized simplified American Soundex: classic fixtures, DuckDB
expression parity fuzz (the oracle replay must stay in lockstep), nulls
and empties, and a blocking-recall property."""

import random
import string

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from whoiswho_ray.functions.phonetic import (
    soundex,
    soundex_array,
    soundex_sql,
)


class TestSoundex:
    def test_classic_values(self):
        # simplified table (H/W are class 0, i.e. run separators)
        assert soundex("Robert") == "R163"
        assert soundex("Rupert") == "R163"
        assert soundex("Tymczak") == "T522"
        assert soundex("Pfister") == "P236"
        assert soundex("Honeyman") == "H555"
        assert soundex("Tupper") == "T160"   # adjacent PP collapses
        assert soundex("Lee") == "L000"      # pads with zeros
        assert soundex("Ashcraft") == "A226"  # simplified: H separates

    def test_edges(self):
        assert soundex("") == ""
        assert soundex("123") == ""          # nothing survives cleaning
        assert soundex(None) is None
        assert soundex("van der Berg") == "V536"  # spaces stripped
        assert soundex("ñoño") == "O000"     # non-ASCII stripped

    def test_duckdb_expression_parity_fuzz(self):
        rng = random.Random(99)
        names = [
            "".join(rng.choices(string.ascii_letters + " -'é", k=rng.randint(0, 18)))
            for _ in range(3000)
        ] + ["", None, "A", "Wu", "HHHH", "aaaa", "bcdbcd"]
        got = soundex_array(pa.array(names, pa.string())).to_pylist()
        df = pd.DataFrame({"nm": names})
        want = duckdb.connect().execute(
            f"SELECT {soundex_sql('nm')} AS sx FROM df").df()["sx"]
        want = [None if pd.isna(w) else w for w in want]
        assert got == want

    def test_blocking_recall_property(self):
        # phonetic blocking must put single-typo vowel variants of the
        # same surname into one block (the reason ER uses it)
        variants = ["Smith", "Smyth", "Smithe", "Smythe"]
        codes = {soundex(v) for v in variants}
        assert len(codes) == 1
        # and separate clearly different names
        assert soundex("Smith") != soundex("Jones")

    def test_chunked_and_empty_array(self):
        ch = pa.chunked_array([["Robert"], ["Lee", None]])
        assert soundex_array(ch).to_pylist() == ["R163", "L000", None]
        assert soundex_array(pa.array([], pa.string())).to_pylist() == []


class TestFingerprintKey:
    def test_permutations_and_case_collide(self, ray_session):
        import ray.data as rd
        from whoiswho_ray.functions.textnorm import add_fingerprint_key
        df = pd.DataFrame({"t": ["Green Tomato", "tomato GREEN",
                                 "tomato, green, tomato", "red onion"]})
        out = add_fingerprint_key(rd.from_pandas(df), "t").to_pandas()
        fps = out["fp"].tolist()
        assert fps[0] == fps[1] == fps[2] == "green tomato"
        assert fps[3] == "onion red"

    def test_duckdb_lockstep_fuzz(self, ray_session):
        import ray.data as rd
        from whoiswho_ray.functions.textnorm import (
            add_fingerprint_key, fingerprint_key_sql)
        rng = random.Random(7)
        words = ["alpha", "Beta", "GAMMA", "d-e", "12x", "", "  "]
        texts = [" ".join(rng.choices(words, k=rng.randint(1, 6)))
                 for _ in range(500)]
        df = pd.DataFrame({"t": texts})
        got = add_fingerprint_key(rd.from_pandas(df).repartition(4),
                                  "t").to_pandas()
        want = duckdb.connect().execute(
            f"SELECT t, {fingerprint_key_sql('t')} AS fp FROM df").df()
        g = got.sort_values(["t", "fp"], ignore_index=True)
        w = want.sort_values(["t", "fp"], ignore_index=True)
        assert g["fp"].tolist() == w["fp"].tolist()
