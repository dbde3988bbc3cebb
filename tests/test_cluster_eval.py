"""Clustering-validity metrics (evaluation.py: bcubed_report,
pair_comparison_summary, bcubed_scores) vs brute force."""
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whoiswho_ray.evaluation import (
    bcubed_report,
    bcubed_scores,
    pair_comparison_summary,
)


def _brute_bcubed(df):
    """Per-record B-cubed means, straight from the definition."""
    p, r = [], []
    for _, row in df.iterrows():
        c = df[df["pred"] == row["pred"]]
        t = df[df["true"] == row["true"]]
        both = len(df[(df["pred"] == row["pred"]) & (df["true"] == row["true"])])
        p.append(both / len(c))
        r.append(both / len(t))
    return float(np.mean(p)), float(np.mean(r))


def _brute_ari(df):
    pairs = [(i, j) for i in range(len(df)) for j in range(i + 1, len(df))]
    pr = df["pred"].to_numpy()
    tr = df["true"].to_numpy()
    idx = sum(1 for i, j in pairs if pr[i] == pr[j] and tr[i] == tr[j])
    a = sum(1 for i, j in pairs if pr[i] == pr[j])
    b = sum(1 for i, j in pairs if tr[i] == tr[j])
    total = len(pairs)
    exp = a * b / total
    mx = (a + b) / 2
    return idx, a, b, (idx - exp) / (mx - exp) if mx != exp else 0.0


@pytest.fixture()
def labels():
    rng = np.random.default_rng(3)
    n = 400
    true = rng.integers(0, 25, n)
    pred = true.copy()
    flip = rng.random(n) < 0.3  # corrupt 30% of assignments
    pred[flip] = rng.integers(0, 12, int(flip.sum()))
    return pd.DataFrame({"pred": [f"c{v}" for v in pred],
                         "true": [f"e{v}" for v in true]})


def test_bcubed_report_matches_brute(ray_session, labels):
    out = bcubed_report(rd.from_pandas(labels).repartition(4),
                        "pred", "true").to_pandas()
    assert len(out) == labels["pred"].nunique()
    for _, row in out.iterrows():
        g = labels[labels["pred"] == row["pred"]]
        cnt = g["true"].value_counts()
        assert row["n_rows"] == len(g)
        assert row["n_entities"] == len(cnt)
        assert row["max_overlap"] == cnt.max()
        pn = int((cnt.to_numpy() ** 2).sum())
        assert row["purity_num"] == pn
        assert row["bcubed_precision"] == pn / (len(g) * len(g))


def test_pair_summary_matches_brute(ray_session, labels):
    out = pair_comparison_summary(rd.from_pandas(labels).repartition(4),
                                  "pred", "true")
    idx, a, b, ari = _brute_ari(labels)
    row = out.iloc[0]
    assert row["pair_index"] == idx
    assert row["pred_pairs"] == a
    assert row["true_pairs"] == b
    assert row["pair_precision"] == pytest.approx(idx / a)
    assert row["pair_recall"] == pytest.approx(idx / b)
    assert row["pair_f1"] == pytest.approx(2 * idx / (a + b))
    assert row["ari"] == pytest.approx(ari, abs=1e-12)
    assert row["n_records"] == len(labels)


def test_bcubed_scores_match_brute(ray_session, labels):
    got = bcubed_scores(rd.from_pandas(labels).repartition(4),
                        "pred", "true")
    p, r = _brute_bcubed(labels)
    assert got["bcubed_precision"] == pytest.approx(p, abs=1e-12)
    assert got["bcubed_recall"] == pytest.approx(r, abs=1e-12)
    f1 = 2 * p * r / (p + r)
    assert got["bcubed_f1"] == pytest.approx(f1, abs=1e-12)


def test_perfect_clustering_is_one(ray_session):
    df = pd.DataFrame({"pred": ["a", "a", "b", "b", "c"],
                       "true": ["x", "x", "y", "y", "z"]})
    out = pair_comparison_summary(rd.from_pandas(df), "pred", "true")
    assert out.iloc[0]["ari"] == 1.0
    assert out.iloc[0]["pair_f1"] == 1.0
    got = bcubed_scores(rd.from_pandas(df), "pred", "true")
    assert got["bcubed_f1"] == 1.0


def test_all_singletons_pred(ray_session):
    df = pd.DataFrame({"pred": [f"p{i}" for i in range(6)],
                       "true": ["x"] * 3 + ["y"] * 3})
    out = pair_comparison_summary(rd.from_pandas(df), "pred", "true")
    row = out.iloc[0]
    assert row["pred_pairs"] == 0 and row["pair_index"] == 0
    assert row["pair_precision"] == 0.0 and row["pair_f1"] == 0.0
    assert row["ari"] <= 0.0  # worse than / equal to chance
