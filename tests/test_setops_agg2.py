"""Round-4 third-batch operators: SQL set operations (INTERSECT/EXCEPT),
per-group mode, grouped string_agg, equi-width histogram, and NTILE.

Reference parity notes: these generalize the reference's id-set bookkeeping
(e.g. whoiswho/dataset splits that subtract assigned pid sets from candidate
pools) into first-class distributed relational operators.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.stages.agg import (
    cube,
    dense_rank_grouped,
    grouping_sets,
    histogram,
    melt,
    mode_per_group,
    ntile,
    string_agg_grouped,
)
from whoiswho_ray.stages.joins import set_op


def _pdset(df):
    return set(map(tuple, df.itertuples(index=False)))


class TestSetOp:
    def test_intersect_matches_pandas(self):
        rng = np.random.RandomState(3)
        l = pd.DataFrame({"k": rng.randint(0, 50, 300)})
        r = pd.DataFrame({"k": rng.randint(25, 75, 300)})
        out = set_op(rd.from_pandas(l).repartition(7),
                     rd.from_pandas(r).repartition(5), "k").to_pandas()
        exp = set(l["k"]) & set(r["k"])
        assert set(out["k"]) == exp
        assert len(out) == len(exp)  # distinct semantics

    def test_except_matches_pandas(self):
        l = pd.DataFrame({"k": np.arange(40, dtype=np.int64) % 20})
        r = pd.DataFrame({"k": np.arange(5, 15, dtype=np.int64)})
        out = set_op(rd.from_pandas(l).repartition(4),
                     rd.from_pandas(r), "k", op="except").to_pandas()
        assert set(out["k"]) == set(range(5)) | set(range(15, 20))

    def test_multi_column_tuple_semantics(self):
        l = pd.DataFrame({"a": [1, 1, 2, 2], "b": ["x", "y", "x", "y"]})
        r = pd.DataFrame({"a": [1, 2], "b": ["y", "x"]})
        out = set_op(rd.from_pandas(l), rd.from_pandas(r),
                     ["a", "b"]).to_pandas()
        assert _pdset(out) == {(1, "y"), (2, "x")}

    def test_empty_filtered_side(self):
        # Regression: a side whose upstream filter leaves EVERY block empty
        # used to crash schema introspection (Dataset.schema() -> None).
        l = rd.from_pandas(pd.DataFrame({"k": np.arange(10, dtype=np.int64)}))
        r = rd.from_pandas(pd.DataFrame({"k": np.arange(10, dtype=np.int64)}))
        r = r.filter(expr="k > 1000")
        out = set_op(l, r, "k", op="except").to_pandas()
        assert set(out["k"]) == set(range(10))

    def test_bad_op_raises(self):
        l = rd.from_pandas(pd.DataFrame({"k": [1]}))
        with pytest.raises(ValueError):
            set_op(l, l, "k", op="union")


class TestBandJoin:
    def _brute(self, l, r, delta):
        rows = [(a.kl, b.kr, a.x, b.y)
                for a in l.itertuples() for b in r.itertuples()
                if abs(a.x - b.y) <= delta]
        return sorted(rows)

    def test_matches_bruteforce_incl_negatives(self):
        from whoiswho_ray.stages.joins import band_join

        rng = np.random.RandomState(13)
        l = pd.DataFrame({"kl": np.arange(120, dtype=np.int64),
                          "x": rng.randint(-500, 500, 120).astype(np.int64)})
        r = pd.DataFrame({"kr": np.arange(1000, 1090, dtype=np.int64),
                          "y": rng.randint(-500, 500, 90).astype(np.int64)})
        out = band_join(rd.from_pandas(l).repartition(5),
                        rd.from_pandas(r).repartition(3),
                        key_l="kl", key_r="kr", x_l="x", x_r="y",
                        delta=7).to_pandas()
        got = sorted(map(tuple, out[["kl", "kr", "x", "y"]]
                         .itertuples(index=False)))
        exp = self._brute(l, r, 7)
        assert got == exp and len(exp) > 0
        # each qualifying pair appears EXACTLY once (no replica dupes)
        assert len(got) == len(set((a, b) for a, b, _, _ in got))

    def test_delta_zero_is_equality_join(self):
        from whoiswho_ray.stages.joins import band_join

        l = pd.DataFrame({"kl": np.array([1, 2], np.int64),
                          "x": np.array([10, 20], np.int64)})
        r = pd.DataFrame({"kr": np.array([8, 9], np.int64),
                          "y": np.array([10, 21], np.int64)})
        out = band_join(rd.from_pandas(l), rd.from_pandas(r),
                        "kl", "kr", "x", "y", delta=0).to_pandas()
        assert list(map(tuple, out.itertuples(index=False))) == [(1, 8, 10, 10)]

    def test_self_join_suffixes_colliding_names(self):
        from whoiswho_ray.stages.joins import band_join

        df = pd.DataFrame({"k": np.array([1, 2, 3], np.int64),
                           "c": np.array([100, 105, 300], np.int64)})
        ds = rd.from_pandas(df)
        out = band_join(ds, ds, "k", "k", "c", "c", delta=10).to_pandas()
        assert set(out.columns) == {"k_l", "k_r", "c_l", "c_r"}
        cut = out[out["k_l"] < out["k_r"]]
        assert set(map(tuple, cut[["k_l", "k_r"]].itertuples(index=False))) \
            == {(1, 2)}

    def test_rejects_negative_delta(self):
        from whoiswho_ray.stages.joins import band_join

        ds = rd.from_pandas(pd.DataFrame({"k": [1], "x": [1]}))
        with pytest.raises(ValueError):
            band_join(ds, ds, "k", "k", "x", "x", delta=-1)


class TestIntervalJoin:
    def _brute(self, iv, pt):
        return sorted((a.ki, b.kp, b.x)
                      for a in iv.itertuples() for b in pt.itertuples()
                      if a.lo <= b.x <= a.hi)

    @pytest.mark.parametrize("step", [1, 3, 10, 100])
    def test_matches_bruteforce_variable_widths(self, step):
        from whoiswho_ray.stages.joins import interval_join

        rng = np.random.RandomState(21)
        lo = rng.randint(-200, 200, 60).astype(np.int64)
        iv = pd.DataFrame({"ki": np.arange(60, dtype=np.int64),
                           "lo": lo,
                           "hi": lo + rng.randint(0, 25, 60)})
        pt = pd.DataFrame({"kp": np.arange(500, 590, dtype=np.int64),
                           "x": rng.randint(-220, 220, 90).astype(np.int64)})
        out = interval_join(rd.from_pandas(iv).repartition(4),
                            rd.from_pandas(pt).repartition(3),
                            "ki", "lo", "hi", "kp", "x",
                            step=step).to_pandas()
        got = sorted(map(tuple, out[["ki", "kp", "x"]]
                         .itertuples(index=False)))
        exp = self._brute(iv, pt)
        assert got == exp and len(exp) > 0
        # each qualifying pair appears exactly once despite replication
        assert len(got) == len(set((a, b) for a, b, _ in got))

    def test_inverted_and_point_intervals(self):
        from whoiswho_ray.stages.joins import interval_join

        iv = pd.DataFrame({"ki": np.array([1, 2], np.int64),
                           "lo": np.array([5, 9], np.int64),
                           "hi": np.array([5, 3], np.int64)})  # 2 inverted
        pt = pd.DataFrame({"kp": np.array([7], np.int64),
                           "x": np.array([5], np.int64)})
        out = interval_join(rd.from_pandas(iv), rd.from_pandas(pt),
                            "ki", "lo", "hi", "kp", "x", step=4).to_pandas()
        assert list(map(tuple, out.itertuples(index=False))) == [(1, 7, 5)]

    def test_rejects_bad_step(self):
        from whoiswho_ray.stages.joins import interval_join

        ds = rd.from_pandas(pd.DataFrame({"k": [1], "a": [1], "b": [2]}))
        with pytest.raises(ValueError):
            interval_join(ds, ds, "k", "a", "b", "k", "a", step=0)


class TestModePerGroup:
    def test_mode_with_tie_break(self):
        df = pd.DataFrame({
            "g": [1, 1, 1, 2, 2, 2, 2, 3],
            "v": ["b", "a", "b", "z", "y", "z", "y", "q"],
        })
        out = mode_per_group(rd.from_pandas(df).repartition(3), "g", "v",
                             out="m").to_pandas().sort_values("g")
        # g=2 ties (z:2, y:2) -> lexicographically smallest wins
        assert list(out["m"]) == ["b", "y", "q"]

    def test_counts_merge_across_batches(self):
        # Per-batch partials must SUM before the argmax: value 7 is the
        # global mode but never the within-batch mode.
        g = np.zeros(90, dtype=np.int64)
        v = np.array(([1] * 4 + [2] * 4 + [7] * 6 + [3] * 4 + [4] * 12) * 3)
        df = pd.DataFrame({"g": g, "v": v[:90]})
        out = mode_per_group(rd.from_pandas(df).repartition(9), "g", "v")
        res = out.to_pandas()
        exp = df.groupby("g")["v"].agg(
            lambda s: s.value_counts().sort_index().idxmax())
        assert res["mode_val"].iloc[0] == exp.iloc[0]


class TestArgExtremeGrouped:
    def test_max_with_tie_break_across_batches(self):
        from whoiswho_ray.stages.agg import arg_extreme_grouped

        # g=1's max (9.0) appears twice in DIFFERENT partitions —
        # the smallest id must win globally, not per batch
        df = pd.DataFrame({
            "g": [1, 1, 1, 2, 2],
            "v": [9.0, 3.0, 9.0, 5.0, 5.0],
            "id": np.array([40, 10, 20, 8, 7], np.int64),
        })
        out = (arg_extreme_grouped(rd.from_pandas(df).repartition(5),
                                   "g", "v", ["id"])
               .to_pandas().sort_values("g"))
        assert list(out["id"]) == [20, 7]
        assert list(out["v"]) == [9.0, 5.0]

    def test_min_mode(self):
        from whoiswho_ray.stages.agg import arg_extreme_grouped

        df = pd.DataFrame({"g": [1, 1], "v": [2.0, -4.0],
                           "id": np.array([1, 2], np.int64)})
        out = arg_extreme_grouped(rd.from_pandas(df), "g", "v", ["id"],
                                  mode="min").to_pandas()
        assert list(out["id"]) == [2]

    def test_bad_mode(self):
        from whoiswho_ray.stages.agg import arg_extreme_grouped

        ds = rd.from_pandas(pd.DataFrame({"g": [1], "v": [1.0], "id": [1]}))
        with pytest.raises(ValueError):
            arg_extreme_grouped(ds, "g", "v", ["id"], mode="median")


class TestStringAggGrouped:
    def test_ordered_join_distinct_and_nulls(self):
        df = pd.DataFrame({
            "g": ["a", "a", "a", "b", "b"],
            "v": ["z", "x", "z", None, "k"],
        })
        out = string_agg_grouped(rd.from_pandas(df).repartition(2), "g", "v",
                                 sep=",", distinct=True,
                                 out="s").to_pandas().sort_values("g")
        assert list(out["s"]) == ["x,z", "k"]

    def test_non_distinct_keeps_duplicates(self):
        df = pd.DataFrame({"g": [1, 1, 1], "v": ["b", "a", "b"]})
        out = string_agg_grouped(rd.from_pandas(df), "g", "v").to_pandas()
        assert out["agg_list"].iloc[0] == "a,b,b"


class TestHistogram:
    def test_boundaries_exact(self):
        # lo=0 hi=10 nbins=5: edges at 0,2,4,6,8,10; -1 below, 5 at/above.
        vals = np.array([-3, 0, 1, 2, 9, 10, 11], dtype=np.int64)
        out = histogram(rd.from_pandas(pd.DataFrame({"x": vals})),
                        "x", lo=0, hi=10, nbins=5)
        got = dict(zip(out["bucket"], out["n"]))
        assert got == {-1: 1, 0: 2, 1: 1, 4: 1, 5: 2}

    def test_partition_invariant(self):
        rng = np.random.RandomState(11)
        df = pd.DataFrame({"x": rng.randint(-5, 60, 5000)})
        a = histogram(rd.from_pandas(df).repartition(2), "x", 1, 51, 10)
        b = histogram(rd.from_pandas(df).repartition(23), "x", 1, 51, 10)
        pd.testing.assert_frame_equal(a, b)
        assert a["n"].sum() == 5000

    def test_bad_args(self):
        ds = rd.from_pandas(pd.DataFrame({"x": [1]}))
        with pytest.raises(ValueError):
            histogram(ds, "x", 5, 5, 3)


class TestCube:
    def test_all_grouping_sets(self):
        df = pd.DataFrame({
            "a": ["x", "x", "y"], "b": ["p", "q", "p"],
            "v": np.array([1, 2, 4], dtype=np.int64),
        })
        out = cube(rd.from_pandas(df).repartition(2), ["a", "b"],
                   {"s": ("v", "sum"), "n": (None, "count")})
        assert len(out) == 3 + 2 + 2 + 1  # finest + by-a + by-b + total
        grand = out[out["grouping"] == 3]
        assert (grand["s"].iloc[0], grand["n"].iloc[0]) == (7, 3)
        by_b = out[(out["grouping"] == 2) & (out["b"] == "p")]
        assert by_b["s"].iloc[0] == 5 and by_b["a"].iloc[0] == "ALL"
        # GROUPING_ID bit order: first key is the most significant bit
        by_a = out[(out["grouping"] == 1) & (out["a"] == "x")]
        assert by_a["s"].iloc[0] == 3 and by_a["b"].iloc[0] == "ALL"

    def test_rejects_non_distributive(self):
        ds = rd.from_pandas(pd.DataFrame({"a": ["x"], "v": [1]}))
        with pytest.raises(ValueError):
            cube(ds, ["a"], {"m": ("v", "mean")})


class TestGroupingSets:
    def test_explicit_sets_match_duckdb(self):
        import duckdb
        rng = np.random.RandomState(7)
        df = pd.DataFrame({
            "a": rng.choice(["x", "y", "z"], 500),
            "b": rng.choice(["p", "q"], 500),
            "v": rng.randint(0, 100, 500).astype(np.int64),
        })
        out = grouping_sets(
            rd.from_pandas(df).repartition(7), ["a", "b"],
            [["a", "b"], ["b"], []],
            {"s": ("v", "sum"), "n": (None, "count")})
        want = duckdb.connect().execute("""
            SELECT coalesce(a, 'ALL') AS a, coalesce(b, 'ALL') AS b,
                   CAST(grouping(a, b) AS BIGINT) AS grouping,
                   CAST(sum(v) AS BIGINT) AS s, count(*) AS n
            FROM df GROUP BY GROUPING SETS ((a, b), (b), ())
            ORDER BY grouping, a, b
        """).df()
        pd.testing.assert_frame_equal(
            out.sort_values(["grouping", "a", "b"], ignore_index=True),
            want.sort_values(["grouping", "a", "b"], ignore_index=True))

    def test_non_prefix_set_and_bitmask(self):
        df = pd.DataFrame({
            "a": ["x", "x", "y"], "b": ["p", "q", "p"],
            "v": np.array([1, 2, 4], dtype=np.int64),
        })
        out = grouping_sets(rd.from_pandas(df), ["a", "b"],
                            [["b"], []], {"s": ("v", "sum")})
        assert len(out) == 2 + 1
        by_b = out[(out["grouping"] == 2) & (out["b"] == "p")]
        assert by_b["s"].iloc[0] == 5 and by_b["a"].iloc[0] == "ALL"
        assert out[out["grouping"] == 3]["s"].iloc[0] == 7

    def test_rejects_bad_sets(self):
        ds = rd.from_pandas(pd.DataFrame({"a": ["x"], "v": [1]}))
        with pytest.raises(ValueError):
            grouping_sets(ds, ["a"], [["zzz"]], {"s": ("v", "sum")})
        with pytest.raises(ValueError):
            grouping_sets(ds, ["a"], [["a"], ["a"]], {"s": ("v", "sum")})
        with pytest.raises(ValueError):
            grouping_sets(ds, ["a"], [], {"s": ("v", "sum")})
        with pytest.raises(ValueError):
            grouping_sets(ds, ["a"], [["a"]], {"m": ("v", "mean")})


class TestMelt:
    def test_round_trips_values(self):
        df = pd.DataFrame({"id": np.arange(5, dtype=np.int64),
                           "p": np.arange(5) * 1.5,
                           "q": np.arange(5) * -2.0})
        out = melt(rd.from_pandas(df).repartition(2), ["id"], ["p", "q"],
                   var_name="var", value_name="val").to_pandas()
        assert len(out) == 10
        wide = out.pivot(index="id", columns="var", values="val")
        np.testing.assert_array_equal(wide["p"].to_numpy(),
                                      df["p"].to_numpy())
        np.testing.assert_array_equal(wide["q"].to_numpy(),
                                      df["q"].to_numpy())

    def test_needs_value_cols(self):
        ds = rd.from_pandas(pd.DataFrame({"id": [1]}))
        with pytest.raises(ValueError):
            melt(ds, ["id"], [])


class TestGroupedRunningSum:
    def test_matches_pandas_cumsum_with_negatives(self):
        from whoiswho_ray.stages.windows import grouped_running_sum

        rng = np.random.RandomState(14)
        df = pd.DataFrame({
            "g": rng.randint(0, 5, 300),
            "o": np.arange(300, dtype=np.int64),
            # negatives exercise the non-monotone-cumsum offset path
            "v": rng.randint(-50, 50, 300).astype(np.int64),
        })
        out = (grouped_running_sum(rd.from_pandas(df).repartition(7),
                                   "g", "v", ["o"])
               .to_pandas().sort_values("o").reset_index(drop=True))
        exp = df.sort_values("o").groupby("g")["v"].cumsum().to_numpy()
        np.testing.assert_array_equal(out["running_sum"].to_numpy(), exp)

    def test_first_row_per_key_is_own_value(self):
        from whoiswho_ray.stages.windows import grouped_running_sum

        df = pd.DataFrame({"g": ["a", "b"], "o": np.array([0, 1], np.int64),
                           "v": np.array([-7, 9], np.int64)})
        out = grouped_running_sum(rd.from_pandas(df), "g", "v",
                                  ["o"]).to_pandas().sort_values("o")
        assert list(out["running_sum"]) == [-7, 9]


class TestGroupedQuantilesCont:
    def test_matches_numpy_per_group(self):
        from whoiswho_ray.stages.agg import grouped_quantiles_cont

        rng = np.random.RandomState(12)
        df = pd.DataFrame({"g": rng.randint(0, 4, 500),
                           "v": rng.rand(500) * 10})
        out = grouped_quantiles_cont(
            rd.from_pandas(df).repartition(6), "g", "v",
            [0.25, 0.5, 0.9]).to_pandas()
        for (g, q), sub in out.groupby(["g", "q"]):
            exp = np.quantile(df[df["g"] == g]["v"].to_numpy(), q)
            assert abs(sub["value"].iloc[0] - exp) < 1e-12

    def test_single_value_group(self):
        from whoiswho_ray.stages.agg import grouped_quantiles_cont

        df = pd.DataFrame({"g": ["a"], "v": [3.5]})
        out = grouped_quantiles_cont(rd.from_pandas(df), "g", "v",
                                     [0.1, 0.9]).to_pandas()
        assert list(out["value"]) == [3.5, 3.5]


class TestZscoreGrouped:
    def test_matches_pandas_population_std(self):
        from whoiswho_ray.stages.agg import zscore_grouped

        rng = np.random.RandomState(9)
        df = pd.DataFrame({"g": rng.randint(0, 5, 400),
                           "x": rng.randint(0, 60, 400).astype(np.int64),
                           "rid": np.arange(400, dtype=np.int64)})
        out = (zscore_grouped(rd.from_pandas(df).repartition(6), "g", "x")
               .to_pandas().sort_values("rid").reset_index(drop=True))
        mu = df.groupby("g")["x"].transform("mean")
        sd = df.groupby("g")["x"].transform(lambda s: s.std(ddof=0))
        exp = ((df["x"] - mu) / sd).to_numpy()
        np.testing.assert_allclose(out["z"].to_numpy(), exp, rtol=1e-10)

    def test_zero_variance_group_is_nan(self):
        from whoiswho_ray.stages.agg import zscore_grouped

        df = pd.DataFrame({"g": [1, 1], "x": np.array([4, 4], np.int64)})
        out = zscore_grouped(rd.from_pandas(df), "g", "x").to_pandas()
        assert out["z"].isna().all()


class TestQuantilesCont:
    def test_matches_numpy_linear(self):
        from whoiswho_ray.stages.agg import exact_quantiles_cont

        rng = np.random.RandomState(8)
        v = rng.rand(1001) * 100
        df = pd.DataFrame({"v": v})
        qs = [0.0, 0.25, 0.5, 0.77, 1.0]
        out = exact_quantiles_cont(rd.from_pandas(df).repartition(9),
                                   "v", qs)
        exp = np.quantile(v, qs)  # numpy default = linear interpolation
        np.testing.assert_allclose(out["value"].to_numpy(), exp, rtol=1e-12)

    def test_nulls_excluded_and_single_row(self):
        from whoiswho_ray.stages.agg import exact_quantiles_cont

        df = pd.DataFrame({"v": [np.nan, 5.0, np.nan]})
        out = exact_quantiles_cont(rd.from_pandas(df), "v", [0.3, 0.9])
        assert list(out["value"]) == [5.0, 5.0]


class TestGroupedCorrelation:
    def test_matches_numpy_per_group(self):
        from whoiswho_ray.stages.agg import grouped_correlation

        rng = np.random.RandomState(5)
        df = pd.DataFrame({
            "g": rng.randint(0, 4, 600),
            "x": rng.randint(0, 100, 600).astype(np.int64),
        })
        df["y"] = (df["x"] * 3 + rng.randint(0, 50, 600)).astype(np.int64)
        out = grouped_correlation(rd.from_pandas(df).repartition(7),
                                  "g", "x", "y").set_index("g")
        for g, sub in df.groupby("g"):
            exp = np.corrcoef(sub["x"], sub["y"])[0, 1]
            assert abs(out.loc[g, "corr"] - exp) < 1e-12
            assert out.loc[g, "n"] == len(sub)

    def test_bit_identical_across_shardings(self):
        from whoiswho_ray.stages.agg import grouped_correlation

        rng = np.random.RandomState(6)
        df = pd.DataFrame({"g": rng.randint(0, 3, 500),
                           "x": rng.randint(0, 40, 500).astype(np.int64),
                           "y": rng.randint(0, 40, 500).astype(np.int64)})
        a = grouped_correlation(rd.from_pandas(df).repartition(2), "g", "x", "y")
        b = grouped_correlation(rd.from_pandas(df).repartition(19), "g", "x", "y")
        pd.testing.assert_frame_equal(a, b)  # exact — integer partials

    def test_zero_variance_is_nan(self):
        from whoiswho_ray.stages.agg import grouped_correlation

        df = pd.DataFrame({"g": [1, 1, 1], "x": [7, 7, 7],
                           "y": [1, 2, 3]})
        out = grouped_correlation(rd.from_pandas(df), "g", "x", "y")
        assert np.isnan(out["corr"].iloc[0])


class TestUnnest:
    def test_jagged_lists_with_positions(self):
        import pyarrow as pa

        from whoiswho_ray.stages.agg import unnest

        t = pa.table({
            "id": pa.array([10, 11, 12], pa.int64()),
            "xs": pa.array([[1.5, 2.5], [], [7.0, 8.0, 9.0]],
                           pa.list_(pa.float64())),
        })
        out = unnest(rd.from_arrow(t), ["id"], "xs").to_pandas()
        assert list(out["id"]) == [10, 10, 12, 12, 12]
        assert list(out["pos"]) == [0, 1, 0, 1, 2]
        assert list(out["val"]) == [1.5, 2.5, 7.0, 8.0, 9.0]

    def test_null_list_rejected(self):
        import pyarrow as pa

        from whoiswho_ray.stages.agg import unnest

        t = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "xs": pa.array([[1.0], None], pa.list_(pa.float64()))})
        with pytest.raises(Exception, match="NULL lists"):
            unnest(rd.from_arrow(t), ["id"], "xs").materialize()


class TestDenseRank:
    def test_ties_share_rank_no_gaps(self):
        df = pd.DataFrame({
            "g": [1, 1, 1, 1, 2, 2],
            "id": np.arange(6, dtype=np.int64),
            "v": [10.0, 10.0, 30.0, 20.0, 5.0, 5.0],
        })
        out = dense_rank_grouped(rd.from_pandas(df).repartition(3),
                                 "g", "v").to_pandas()
        got = out.set_index("id")["dense_rank"]
        exp = df.set_index("id").groupby("g")["v"].rank(method="dense")
        np.testing.assert_array_equal(
            got.sort_index().to_numpy(),
            exp.sort_index().to_numpy().astype(np.int64))

    def test_adjacent_keys_same_value(self):
        # equal order values across DIFFERENT keys must both restart at 1
        df = pd.DataFrame({"g": ["a", "b"], "id": [0, 1], "v": [7.0, 7.0]})
        out = dense_rank_grouped(rd.from_pandas(df), "g", "v").to_pandas()
        assert set(out["dense_rank"]) == {1}


class TestNtile:
    @pytest.mark.parametrize("n,total", [(7, 100), (4, 8), (3, 10), (5, 3)])
    def test_matches_sql_fill_rule(self, n, total):
        rng = np.random.RandomState(n)
        df = pd.DataFrame({"id": np.arange(total, dtype=np.int64),
                           "v": rng.permutation(total).astype(np.int64)})
        out = ntile(rd.from_pandas(df).repartition(3), ["v", "id"], n,
                    tile_col="t").to_pandas().sort_values("v")
        # SQL NTILE: first total%n tiles get total//n+1 rows, rest total//n
        q, rem = divmod(total, n)
        exp = np.concatenate(
            [np.full(q + 1 if i < rem else q, i + 1, np.int64)
             for i in range(n)])[:total]
        np.testing.assert_array_equal(out["t"].to_numpy(), exp)
        # ranks follow the sort order, so tiles are monotone in v
        assert (np.diff(out["t"].to_numpy()) >= 0).all()


class TestIntervalOverlapJoin:
    def _brute(self, l, r):
        return sorted((a.kl, b.kr)
                      for a in l.itertuples() for b in r.itertuples()
                      if a.lo <= b.hi2 and b.lo2 <= a.hi)

    @pytest.mark.parametrize("step", [1, 3, 10, 100])
    def test_matches_bruteforce(self, step):
        from whoiswho_ray.stages.joins import interval_overlap_join

        rng = np.random.RandomState(33)
        lo = rng.randint(-200, 200, 50).astype(np.int64)
        l = pd.DataFrame({"kl": np.arange(50, dtype=np.int64),
                          "lo": lo,
                          "hi": lo + rng.randint(0, 30, 50)})
        lo2 = rng.randint(-220, 220, 70).astype(np.int64)
        r = pd.DataFrame({"kr": np.arange(900, 970, dtype=np.int64),
                          "lo2": lo2,
                          "hi2": lo2 + rng.randint(0, 12, 70)})
        out = interval_overlap_join(
            rd.from_pandas(l).repartition(4),
            rd.from_pandas(r).repartition(3),
            "kl", "lo", "hi", "kr", "lo2", "hi2", step=step).to_pandas()
        got = sorted(map(tuple, out[["kl", "kr"]].itertuples(index=False)))
        exp = self._brute(l, r)
        assert got == exp and len(exp) > 0
        assert len(got) == len(set(got))  # exactly-once despite 2x replication
        # bounds columns ride through correctly
        row = out.iloc[0]
        assert row["lo"] <= row["hi2"] and row["lo2"] <= row["hi"]

    def test_nested_point_touching_and_tied_starts(self):
        from whoiswho_ray.stages.joins import interval_overlap_join

        l = pd.DataFrame({"kl": np.array([1, 2, 3, 4], np.int64),
                          "lo": np.array([0, 10, 20, 30], np.int64),
                          "hi": np.array([100, 12, 20, 25], np.int64)})
        #      1 spans everything; 3 is a point; 4 is inverted (dropped)
        r = pd.DataFrame({"kr": np.array([7, 8, 9], np.int64),
                          "lo2": np.array([10, 20, 101], np.int64),
                          "hi2": np.array([11, 20, 150], np.int64)})
        #      7 nested in 1 + tied start with 2; 8 point==point 3
        out = interval_overlap_join(
            rd.from_pandas(l), rd.from_pandas(r),
            "kl", "lo", "hi", "kr", "lo2", "hi2", step=8).to_pandas()
        got = sorted(map(tuple, out[["kl", "kr"]].itertuples(index=False)))
        assert got == [(1, 7), (1, 8), (2, 7), (3, 8)]

    def test_self_join_suffixes(self):
        from whoiswho_ray.stages.joins import interval_overlap_join

        df = pd.DataFrame({"k": np.array([1, 2], np.int64),
                           "a": np.array([0, 5], np.int64),
                           "b": np.array([6, 9], np.int64)})
        ds = rd.from_pandas(df)
        out = interval_overlap_join(ds, ds, "k", "a", "b",
                                    "k", "a", "b", step=4).to_pandas()
        assert set(out.columns) == {"k_l", "k_r", "a_l", "b_l", "a_r", "b_r"}
        got = set(map(tuple, out[["k_l", "k_r"]].itertuples(index=False)))
        assert got == {(1, 1), (1, 2), (2, 1), (2, 2)}

    def test_rejects_bad_step(self):
        from whoiswho_ray.stages.joins import interval_overlap_join

        ds = rd.from_pandas(pd.DataFrame({"k": [1], "a": [1], "b": [2]}))
        with pytest.raises(ValueError):
            interval_overlap_join(ds, ds, "k", "a", "b", "k", "a", "b",
                                  step=0)
