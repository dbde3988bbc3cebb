"""Count-min sketch (exact counter table, approximate point queries) and
GROUP BY ROLLUP (distributive hierarchy aggregate)."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.stages.agg import rollup
from whoiswho_ray.stages.sketch import cms_query, count_min


class TestCountMin:
    D, W = 4, 512

    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.RandomState(5)
        vocab = [f"tok{i}" for i in range(300)]
        # zipf-ish: heavy hitters + long tail
        probs = 1.0 / np.arange(1, len(vocab) + 1)
        probs /= probs.sum()
        docs = [" ".join(rng.choice(vocab, size=30, p=probs))
                for _ in range(400)]
        return pd.DataFrame({"text": docs + ["", None, "  ?? !! "]})

    def _true_counts(self, corpus) -> dict[str, int]:
        counts: dict[str, int] = {}
        for txt in corpus["text"]:
            for tk in re.split("[^a-z0-9]+", (txt or "").lower()):
                if tk:
                    counts[tk] = counts.get(tk, 0) + 1
        return counts

    def test_matches_reference_and_sharding_invariant(self, corpus):
        a = count_min(rd.from_pandas(corpus).repartition(3),
                      d=self.D, w=self.W)
        b = count_min(rd.from_pandas(corpus).repartition(11),
                      d=self.D, w=self.W)
        pd.testing.assert_frame_equal(a, b)

        # driver-side replay of the counter definition
        dense = np.zeros(self.D * self.W, dtype=np.int64)
        for tk, c in self._true_counts(corpus).items():
            for r in range(self.D):
                col = int.from_bytes(
                    hashlib.md5(f"{r}|{tk}".encode()).digest()[:8],
                    "big") % self.W
                dense[r * self.W + col] += c
        hit = np.flatnonzero(dense)
        np.testing.assert_array_equal(a["cell"].to_numpy(), hit)
        np.testing.assert_array_equal(a["cnt"].to_numpy(), dense[hit])

    def test_point_queries_never_underestimate(self, corpus):
        cms = count_min(rd.from_pandas(corpus), d=self.D, w=self.W)
        truth = self._true_counts(corpus)
        tokens = list(truth)
        est = cms_query(cms, tokens, d=self.D, w=self.W)
        true = np.array([truth[t] for t in tokens], dtype=np.int64)
        assert (est >= true).all()
        # CM guarantee: overestimate <= e/w * N (whp); check the mean is
        # well inside it and heavy hitters are nearly exact
        n_total = true.sum()
        assert (est - true).mean() <= np.e / self.W * n_total
        top = np.argsort(true)[-5:]
        assert ((est[top] - true[top]) / true[top] < 0.15).all()

    def test_empty_corpus(self):
        out = count_min(rd.from_pandas(pd.DataFrame({"text": ["", None]})))
        assert len(out) == 0
        assert list(out.columns) == ["cell", "cnt"]
        assert (cms_query(out, ["anything"]) == 0).all()


class TestRollup:
    @pytest.fixture(scope="class")
    def sales(self):
        rng = np.random.RandomState(9)
        return pd.DataFrame({
            "region": rng.choice(["east", "west"], 500),
            "cat": rng.choice(["a", "b", "c"], 500),
            "units": rng.randint(1, 50, 500).astype(np.int64),
        })

    def test_matches_pandas_reference(self, sales):
        out = rollup(rd.from_pandas(sales).repartition(7),
                     ["region", "cat"],
                     {"units": ("units", "sum"), "n": (None, "count"),
                      "hi": ("units", "max")})
        # level 2: finest
        fin = out[out["level"] == 2].set_index(["region", "cat"])
        exp = sales.groupby(["region", "cat"]).agg(
            units=("units", "sum"), n=("units", "size"),
            hi=("units", "max"))
        for (r, c), row in exp.iterrows():
            got = fin.loc[(r, c)]
            assert got["units"] == row["units"]
            assert got["n"] == row["n"]
            assert got["hi"] == row["hi"]
        # level 1: per region, cat rolled up
        lvl1 = out[out["level"] == 1]
        assert set(lvl1["cat"]) == {"ALL"}
        for r, row in sales.groupby("region")["units"].agg(
                ["sum", "size", "max"]).iterrows():
            got = lvl1[lvl1["region"] == r].iloc[0]
            assert got["units"] == row["sum"]
            assert got["n"] == row["size"]
            assert got["hi"] == row["max"]
        # level 0: grand total
        tot = out[out["level"] == 0].iloc[0]
        assert (tot["region"], tot["cat"]) == ("ALL", "ALL")
        assert tot["units"] == sales["units"].sum()
        assert tot["n"] == len(sales)
        assert tot["hi"] == sales["units"].max()
        assert len(out) == len(exp) + sales["region"].nunique() + 1

    def test_mean_rejected_and_empty_keys(self, sales):
        ds = rd.from_pandas(sales)
        with pytest.raises(ValueError, match="distributive"):
            rollup(ds, ["region"], {"m": ("units", "mean")})
        with pytest.raises(ValueError, match="at least one key"):
            rollup(ds, [], {"units": ("units", "sum")})


class TestFunnel:
    def _reference(self, df, steps):
        rows = []
        for u, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"], kind="stable")
            cur = None
            matched = []
            for step in steps:
                sub = g[g["event_type"] == step]
                if cur is not None:
                    after = (sub["ts"] > cur[0]) | (
                        (sub["ts"] == cur[0]) & (sub["event_id"] > cur[1]))
                    sub = sub[after]
                if sub.empty:
                    break
                r = sub.iloc[0]
                cur = (r["ts"], r["event_id"])
                matched.append(r)
            if matched:
                rows.append({
                    "user_id": u,
                    "stages": len(matched),
                    "first_us": matched[0]["ts"].value // 1000,
                    "last_us": matched[-1]["ts"].value // 1000,
                })
        return (pd.DataFrame(rows).sort_values("user_id")
                .reset_index(drop=True))

    def test_matches_greedy_reference(self):
        from whoiswho_ray.stages.windows import funnel

        rng = np.random.RandomState(13)
        n = 3000
        df = pd.DataFrame({
            "user_id": rng.randint(0, 60, n),
            "event_id": np.arange(n, dtype=np.int64),
            # coarse second resolution -> plenty of exact-ts ties
            "ts": pd.Timestamp("2024-03-01")
            + pd.to_timedelta(rng.randint(0, 500, n), unit="s"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error"], n),
        })
        steps = ["view", "click", "purchase"]
        out = (funnel(rd.from_pandas(df).repartition(5), steps)
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        exp = self._reference(df, steps)
        pd.testing.assert_frame_equal(
            out.astype({"stages": np.int64}), exp.astype(
                {"stages": np.int64, "first_us": np.int64,
                 "last_us": np.int64}))

    def test_no_step1_users_and_empty_steps(self):
        from whoiswho_ray.stages.windows import funnel

        df = pd.DataFrame({
            "user_id": [1, 1], "event_id": [0, 1],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "event_type": ["click", "purchase"],
        })
        out = funnel(rd.from_pandas(df), ["view", "click"]).to_pandas()
        assert len(out) == 0
        with pytest.raises(ValueError, match="at least one step"):
            funnel(rd.from_pandas(df), [])


class TestSaltedJoin:
    @pytest.fixture(scope="class")
    def skewed(self):
        rng = np.random.RandomState(21)
        # one key owns half the left side
        keys = np.where(rng.rand(4000) < 0.5, 7,
                        rng.randint(0, 200, 4000)).astype(np.int64)
        left = pd.DataFrame({"k": keys, "x": rng.randn(4000)})
        right = pd.DataFrame({"k": np.arange(150, dtype=np.int64),
                              "y": np.arange(150, dtype=np.int64) * 10})
        return left, right

    def test_salted_equals_unsalted(self, skewed):
        from whoiswho_ray.stages.joins import shuffle_hash_join

        left, right = skewed
        for how in ("inner", "left"):
            exp = (shuffle_hash_join(rd.from_pandas(left).repartition(6),
                                     rd.from_pandas(right), on="k", how=how)
                   .to_pandas().sort_values(["k", "x"])
                   .reset_index(drop=True))
            got = (shuffle_hash_join(rd.from_pandas(left).repartition(6),
                                     rd.from_pandas(right), on="k", how=how,
                                     salt=4, hot_keys=[7])
                   .to_pandas().sort_values(["k", "x"])
                   .reset_index(drop=True))
            assert "__salt" not in got.columns
            pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)

    def test_auto_detection_finds_hot_key(self, skewed):
        from whoiswho_ray.stages.joins import detect_hot_keys, \
            shuffle_hash_join

        left, right = skewed
        hot = detect_hot_keys(rd.from_pandas(left).repartition(6), "k",
                              min_frac=0.1)
        assert hot == [7]
        # and auto-detected salting round-trips
        got = (shuffle_hash_join(rd.from_pandas(left).repartition(6),
                                 rd.from_pandas(right), on="k", salt=4)
               .to_pandas())
        assert len(got) == (left["k"] < 150).sum()

    def test_salt_guards(self, skewed):
        from whoiswho_ray.stages.joins import shuffle_hash_join

        left, right = skewed
        l2 = rd.from_pandas(left.assign(k2=left["k"]))
        r2 = rd.from_pandas(right.assign(k2=right["k"]))
        with pytest.raises(ValueError, match="single join key"):
            shuffle_hash_join(l2, r2, on=["k", "k2"], salt=4)
        with pytest.raises(ValueError, match="inner/left"):
            shuffle_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                              on="k", how="right", salt=4)
        # no hot keys -> plain join path, still correct
        got = shuffle_hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k",
            salt=4, hot_keys=[]).to_pandas()
        assert len(got) == (left["k"] < 150).sum()


class TestTextSimilarityJoin:
    def _brute(self, left, right, tau):
        import re as _re

        def toks(s):
            return set(t for t in _re.split(r"[^a-z0-9]+", (s or "").lower())
                       if t)
        rows = []
        for _, a in left.iterrows():
            ta = toks(a["text"])
            for _, b in right.iterrows():
                tb = toks(b["text"])
                u = len(ta | tb)
                j = len(ta & tb) / u if u else 0.0
                if j >= tau:
                    rows.append((a["doc_id"], b["doc_id"], j))
        return (pd.DataFrame(rows, columns=["key_l", "key_r", "jacc"])
                .sort_values(["key_l", "key_r"]).reset_index(drop=True))

    @pytest.fixture(scope="class")
    def corpora(self):
        rng = np.random.RandomState(17)
        vocab = [f"w{i}" for i in range(60)]
        def mk(n, start):
            return pd.DataFrame({
                "doc_id": np.arange(start, start + n, dtype=np.int64),
                "text": [" ".join(rng.choice(vocab, size=8))
                         for _ in range(n)] + [],
            })
        left, right = mk(80, 0), mk(70, 1000)
        # plant exact and near matches + degenerate docs
        right.loc[0, "text"] = left.loc[0, "text"]
        right.loc[1, "text"] = left.loc[1, "text"] + " extraword"
        left.loc[2, "text"] = ""
        right.loc[2, "text"] = None
        return left, right

    def test_matches_bruteforce(self, corpora):
        from whoiswho_ray.stages.dedup import text_similarity_join

        left, right = corpora
        tau = 0.5
        out = (text_similarity_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(3), threshold=tau)
            .to_pandas().sort_values(["key_l", "key_r"])
            .reset_index(drop=True))
        exp = self._brute(left, right, tau)
        assert len(exp) >= 2  # planted matches present
        pd.testing.assert_frame_equal(out, exp)
        assert out["key_l"].dtype == np.int64  # native key types survive

    @pytest.mark.parametrize("tau", [0.3, 0.6, 0.8, 0.95])
    def test_prefix_filter_exact_on_template_corpus(self, tau):
        """The df-ordered prefix filter (exact path) must keep recall
        EXACT at every threshold — verified against brute force on the
        regime it targets: a template-homogeneous corpus where most
        tokens are shared boilerplate and only a few vary."""
        from whoiswho_ray.stages.dedup import text_similarity_join

        rng = np.random.RandomState(31)
        template = "alpha beta gamma delta epsilon zeta eta theta"
        rare = [f"r{i}" for i in range(12)]

        def mk(n, start):
            return pd.DataFrame({
                "doc_id": np.arange(start, start + n, dtype=np.int64),
                "text": [template + " " + " ".join(
                    rng.choice(rare, size=rng.randint(0, 4), replace=False))
                    for _ in range(n)],
            })
        left, right = mk(40, 0), mk(40, 500)
        out = (text_similarity_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(4), threshold=tau)
            .to_pandas().sort_values(["key_l", "key_r"])
            .reset_index(drop=True))
        exp = self._brute(left, right, tau)
        assert len(exp) > 0
        pd.testing.assert_frame_equal(out, exp)

    def test_max_df_drops_hot_only_candidates(self):
        from whoiswho_ray.stages.dedup import text_similarity_join

        # "common" is in every doc; pair (1, 10) shares ONLY the hot token
        left = pd.DataFrame({"doc_id": [1, 2],
                             "text": ["common aa bb", "common cc dd"]})
        right = pd.DataFrame({"doc_id": [10, 11],
                              "text": ["common xx yy", "common cc dd"]})
        full = text_similarity_join(
            rd.from_pandas(left), rd.from_pandas(right),
            threshold=0.15).to_pandas()
        capped = text_similarity_join(
            rd.from_pandas(left), rd.from_pandas(right),
            threshold=0.15, max_df=3).to_pandas()
        assert (1, 10) in set(zip(full["key_l"], full["key_r"]))
        got = set(zip(capped["key_l"], capped["key_r"]))
        # pairs sharing a sub-cap token survive with their FULL jaccard
        assert (2, 11) in got and (1, 10) not in got
        j = capped.set_index(["key_l", "key_r"]).loc[(2, 11), "jacc"]
        assert j == 1.0  # jaccard still counts the hot token


class TestGroupedHll:
    def test_single_group_matches_ungrouped(self):
        from whoiswho_ray.stages.sketch import (hll_estimate, hll_registers,
                                                hll_registers_grouped)

        rng = np.random.RandomState(23)
        df = pd.DataFrame({"g": "only", "v": rng.randint(0, 5000, 20000)})
        ds = rd.from_pandas(df).repartition(5)
        grouped = hll_registers_grouped(ds, "g", "v")
        flat = (hll_registers(ds, "v")
                .sort_values("register").reset_index(drop=True))
        got = (grouped[["register", "max_rank"]]
               .sort_values("register").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, flat)

    def test_per_group_estimates(self):
        from whoiswho_ray.stages.sketch import (hll_estimate,
                                                hll_registers_grouped)

        rng = np.random.RandomState(29)
        frames = []
        truth = {"a": 300, "b": 3000, "c": 30}
        for g, n in truth.items():
            frames.append(pd.DataFrame({
                "g": g, "v": rng.choice(n * 10, size=n, replace=False)}))
        df = pd.concat(frames, ignore_index=True).sample(
            frac=1.0, random_state=1)
        regs = hll_registers_grouped(rd.from_pandas(df).repartition(7),
                                     "g", "v")
        for g, n in truth.items():
            sub = regs[regs["g"] == g].rename(columns={})
            est = hll_estimate(sub[["register", "max_rank"]])
            assert abs(est - n) / n < 0.1, (g, est, n)


class TestPivot:
    def test_matches_pandas_pivot_table(self):
        from whoiswho_ray.stages.agg import pivot

        rng = np.random.RandomState(31)
        df = pd.DataFrame({
            "pri": rng.choice(["hi", "lo", "mid"], 400),
            "status": rng.choice(["F", "O"], 400),
            "cents": rng.randint(0, 1000, 400).astype(np.int64),
        })
        # remove one combination to exercise the fill
        df = df[~((df["pri"] == "hi") & (df["status"] == "F"))]
        out = pivot(rd.from_pandas(df).repartition(4), "pri", "status",
                    "cents", op="sum")
        exp = (df.pivot_table(index="pri", columns="status",
                              values="cents", aggfunc="sum", fill_value=0)
               .astype(np.int64).reset_index()
               .sort_values("pri", ignore_index=True))
        exp.columns = [str(c) for c in exp.columns]
        exp.columns.name = None
        out.columns.name = None
        pd.testing.assert_frame_equal(out, exp[out.columns.tolist()])
        assert out.loc[out["pri"] == "hi", "F"].iloc[0] == 0

    def test_mean_rejected(self):
        from whoiswho_ray.stages.agg import pivot

        ds = rd.from_pandas(pd.DataFrame({"a": ["x"], "b": ["y"],
                                          "v": [1.0]}))
        with pytest.raises(ValueError, match="distributive"):
            pivot(ds, "a", "b", "v", op="mean")


class TestRollupFloatSums:
    def test_float_sums_not_truncated(self):
        from whoiswho_ray.stages.agg import rollup

        df = pd.DataFrame({"g": ["a", "a", "b"],
                           "v": [0.25, 0.5, 1.75]})
        out = rollup(rd.from_pandas(df), ["g"],
                     {"total": ("v", "sum"), "n": (None, "count")})
        tot = out[out["level"] == 0].iloc[0]
        assert tot["total"] == pytest.approx(2.5)
        assert out["total"].dtype.kind == "f"
        assert out["n"].dtype == np.int64


class TestCorrelation:
    def test_matches_numpy_and_sharding_invariant(self):
        from whoiswho_ray.stages.agg import correlation

        rng = np.random.RandomState(37)
        x = rng.randint(0, 100, 5000).astype(np.int64)
        y = (3 * x + rng.randint(0, 200, 5000)).astype(np.int64)
        df = pd.DataFrame({"x": x, "y": y})
        a = correlation(rd.from_pandas(df).repartition(3), "x", "y")
        b = correlation(rd.from_pandas(df).repartition(13), "x", "y")
        assert a["corr"].iloc[0] == b["corr"].iloc[0]  # bit-identical
        assert a["n"].iloc[0] == 5000
        assert abs(a["corr"].iloc[0] - np.corrcoef(x, y)[0, 1]) < 1e-12

    def test_zero_variance_is_nan(self):
        from whoiswho_ray.stages.agg import correlation

        df = pd.DataFrame({"x": [1, 1, 1], "y": [2, 3, 4]})
        out = correlation(rd.from_pandas(df), "x", "y")
        assert np.isnan(out["corr"].iloc[0])
