"""Split/sampling operators (O1/O5/O6/O7)."""

import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.splits import (
    cap_per_group,
    kfold_by_weight,
    kfold_by_weight_ds,
    sample_negatives,
    temporal_split,
)


def test_temporal_split_cut_point():
    df = pd.DataFrame({
        "k": ["a"] * 5, "id": range(5),
        "ts": pd.to_datetime(["2020-01-0%d" % (i + 1) for i in range(5)]),
    })
    out = temporal_split(rd.from_pandas(df), "k", "ts", order_cols=["ts", "id"]).to_pandas()
    out = out.sort_values("id")
    # int(5*0.8)=4 → only the last row held out
    assert out["is_unassigned"].tolist() == [False, False, False, False, True]


def test_cap_per_group():
    df = pd.DataFrame({"k": ["a"] * 4 + ["b"], "id": [3, 1, 2, 4, 9],
                       "ts": [3, 1, 2, 4, 9]})
    out = cap_per_group(rd.from_pandas(df), "k", 2, ["ts"]).to_pandas()
    assert sorted(out[out["k"] == "a"]["id"]) == [1, 2]
    assert out[out["k"] == "b"]["id"].tolist() == [9]


def test_kfold_round_robin_balances_weight():
    w = pd.DataFrame({"k": list("abcdefghij"), "w": [10, 9, 8, 7, 6, 5, 4, 3, 2, 1]})
    out = kfold_by_weight(w, "k", "w", k=5)
    assert sorted(out["fold"].value_counts()) == [2, 2, 2, 2, 2]
    # heaviest keys land in distinct folds
    heavy = out[out["k"].isin(list("abcde"))]["fold"]
    assert sorted(heavy) == [0, 1, 2, 3, 4]


def test_kfold_distributed_equals_driver():
    rng = np.random.default_rng(3)
    w = pd.DataFrame({"k": [f"k{i:04d}" for i in range(500)],
                      "w": rng.integers(1, 50, 500)})
    driver = kfold_by_weight(w, "k", "w", k=7).sort_values("k").reset_index(drop=True)
    dist = kfold_by_weight_ds(rd.from_pandas(w), "k", "w", k=7).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(driver.astype({"fold": "int64"}),
                                  dist[["k", "fold"]])


def test_sample_negatives_deterministic_and_excludes_self():
    df = pd.DataFrame({"g": ["x"] * 6, "id": [f"r{i}" for i in range(6)]})
    a = sample_negatives(rd.from_pandas(df), "g", "id", n_neg=3, seed=7).to_pandas()
    b = sample_negatives(rd.from_pandas(df.iloc[::-1]), "g", "id", n_neg=3, seed=7).to_pandas()
    assert (a["pos_key"] != a["neg_key"]).all()
    key = ["pos_key", "neg_key"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key],
        b.sort_values(key).reset_index(drop=True)[key],
    )


class TestWeightedSample:
    """A-Res weighted reservoir sampling (splits.weighted_sample)."""

    def test_deterministic_and_sharding_invariant(self, ray_session):
        import ray.data as rd

        from whoiswho_ray.stages.splits import weighted_sample

        df = pd.DataFrame({"k": [f"d{i}" for i in range(500)],
                           "w": np.linspace(1, 50, 500)})
        a = weighted_sample(rd.from_pandas(df), "k", "w", k=40)
        b = weighted_sample(rd.from_pandas(df).repartition(7), "k", "w", k=40)
        assert a["k"].tolist() == b["k"].tolist()
        assert len(a) == 40

    def test_weight_bias(self, ray_session):
        """Across many seeds, heavy rows are sampled far more often than
        light ones (the A-Res inclusion-probability property)."""
        import ray.data as rd

        from whoiswho_ray.stages.splits import weighted_sample

        df = pd.DataFrame({"k": [f"d{i}" for i in range(200)],
                           "w": [100.0] * 20 + [1.0] * 180})
        ds = rd.from_pandas(df)
        heavy = 0
        total = 0
        for seed in range(8):
            out = weighted_sample(ds, "k", "w", k=20, seed=seed)
            heavy += out["w"].ge(100).sum()
            total += len(out)
        assert heavy / total > 0.6, heavy / total  # uniform would be 0.1

    def test_k_exceeds_population_and_bad_weights(self, ray_session):
        import ray.data as rd

        from whoiswho_ray.stages.splits import weighted_sample

        df = pd.DataFrame({"k": ["a", "b", "c"], "w": [1.0, 0.0, -2.0]})
        out = weighted_sample(rd.from_pandas(df), "k", "w", k=10)
        # zero/negative weights draw -inf keys and sort last, but are
        # still returned when k exceeds the positive-weight population
        assert out["k"].tolist()[0] == "a"
        assert len(out) == 3
