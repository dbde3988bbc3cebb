"""ER evaluation operators: blocking_quality count identities and
run_snd_pr_curve sweep invariants (+ grid margin guard) at sf0.001."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.evaluation import blocking_quality


class TestBlockingQuality:
    def _manual(self, df: pd.DataFrame) -> dict:
        n = len(df)
        nb = df.groupby("b").size().to_numpy()
        ng = df.groupby("t").size().to_numpy()
        nc = df.groupby(["t", "b"]).size().to_numpy()
        c2 = lambda a: int((a * (a - 1) // 2).sum())
        return {"n_records": n, "total_pairs": n * (n - 1) // 2,
                "candidate_pairs": c2(nb), "truth_pairs": c2(ng),
                "covered_pairs": c2(nc)}

    def test_synthetic_counts(self):
        rng = np.random.RandomState(4)
        n = 3000
        df = pd.DataFrame({
            "b": rng.randint(0, 25, n).astype(str),
            "t": rng.randint(0, 400, n).astype(str),
        })
        out = blocking_quality(rd.from_pandas(df), "b", "t").iloc[0]
        exp = self._manual(df)
        for k, v in exp.items():
            assert out[k] == v, k
        assert out["pair_completeness"] == exp["covered_pairs"] / exp["truth_pairs"]
        assert out["reduction_ratio"] == 1.0 - exp["candidate_pairs"] / exp["total_pairs"]

    def test_perfect_blocking(self):
        # truth key == block key: every true pair is covered
        df = pd.DataFrame({"b": ["x"] * 4 + ["y"] * 3,
                           "t": ["x"] * 4 + ["y"] * 3})
        out = blocking_quality(rd.from_pandas(df), "b", "t").iloc[0]
        assert out["pair_completeness"] == 1.0
        assert out["covered_pairs"] == out["truth_pairs"] == 6 + 3

    def test_no_duplicates(self):
        df = pd.DataFrame({"b": ["x", "x", "y"], "t": ["1", "2", "3"]})
        out = blocking_quality(rd.from_pandas(df), "b", "t").iloc[0]
        assert out["truth_pairs"] == 0 and out["pair_completeness"] == 0.0


class TestSndPrCurve:
    def _curve(self):
        import __ray_entry__ as e

        return e.queries()["snd_pr_curve"]("/root/testdata/sf0.001")

    def test_sweep_invariants(self):
        from whoiswho_ray.config import SNDConfig

        out = self._curve().sort_values("tau_cents", ignore_index=True)
        tp, fp = out["tp"].to_numpy(), out["fp"].to_numpy()
        # counts shrink monotonically as the threshold rises
        assert (np.diff(tp) <= 0).all() and (np.diff(fp) <= 0).all()
        assert (out["fn"] >= 0).all()
        # at the default operating threshold every predicted pair is a
        # strong edge, and strong edges define the truth components —
        # precision is exactly 1
        tau_edge_cents = int(round(SNDConfig().tau_edge * 100))
        at_op = out[out["tau_cents"] == tau_edge_cents]
        assert len(at_op) == 1
        assert at_op["precision"].iloc[0] == 1.0
        assert at_op["fp"].iloc[0] == 0
        # recall < 1 is allowed (transitive-only truth pairs), but tp>0
        assert at_op["tp"].iloc[0] > 0

    def test_grid_margin(self):
        # no candidate-pair score may sit within 1e-9 of a grid tau, or
        # the float >= compare could flip between engines
        import __ray_entry__ as e
        from whoiswho_ray.pipelines.snd import DEFAULT_PR_TAUS

        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        sql = e.oracle_sql()["snd_pr_curve"]
        scored_prefix = sql.split("strong AS")[0] + (
            "sel AS (SELECT score FROM scored) SELECT min(abs(score - t.tau)) "
            "FROM sel, (VALUES " + ", ".join(f"({t!r})" for t in DEFAULT_PR_TAUS)
            + ") t(tau)")
        m = con.execute(scored_prefix).fetchone()[0]
        assert m is not None and m > 1e-9


class TestMutualBestMatch:
    """Reciprocal-best-match 1:1 filter vs brute double-argmax."""

    @staticmethod
    def _brute(df: pd.DataFrame):
        best_l, best_r = {}, {}
        # per-left best: max score, tie -> smallest partner
        for r in df.sort_values(["a", "score", "b"],
                                ascending=[True, False, True]
                                ).drop_duplicates("a").itertuples():
            best_l[r.a] = r.b
        for r in df.sort_values(["b", "score", "a"],
                                ascending=[True, False, True]
                                ).drop_duplicates("b").itertuples():
            best_r[r.b] = r.a
        return {(a, b) for a, b in best_l.items() if best_r.get(b) == a}

    def test_random_parity(self, ray_session):
        from whoiswho_ray.stages.joins import mutual_best_match
        rng = np.random.RandomState(13)
        df = pd.DataFrame({
            "a": rng.randint(0, 30, 400),
            "b": rng.randint(100, 140, 400),
            "score": rng.randint(1, 50, 400).astype(np.int64),
        }).drop_duplicates(["a", "b"])
        out = mutual_best_match(
            rd.from_pandas(df).repartition(7), "a", "b", "score"
        ).to_pandas()
        got = set(zip(out["a"], out["b"]))
        assert got == self._brute(df)
        # 1:1 property: no entity appears twice
        assert out["a"].is_unique and out["b"].is_unique

    def test_tie_pins_smallest_partner(self, ray_session):
        from whoiswho_ray.stages.joins import mutual_best_match
        df = pd.DataFrame({"a": [1, 1, 2], "b": [7, 5, 5],
                           "score": np.array([3, 3, 1], dtype=np.int64)})
        out = mutual_best_match(rd.from_pandas(df), "a", "b", "score"
                                ).to_pandas()
        # a=1 ties between b=7 and b=5 -> picks 5; b=5's best is a=1
        assert set(zip(out["a"], out["b"])) == {(1, 5)}
