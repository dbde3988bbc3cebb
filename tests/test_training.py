"""Learned pairwise scorer: fit on labeled pairs, cluster with the learned
config, hit the same F1 gate."""

import numpy as np
import pytest

import ray.data as rd

from whoiswho_ray.config import SNDConfig
from whoiswho_ray.evaluation import pairwise_f1_frames
from whoiswho_ray.pipelines.snd import run_snd
from whoiswho_ray.training import fit_logistic, fit_snd_config


def test_fit_logistic_separates_linear_data():
    rng = np.random.RandomState(0)
    X = rng.randn(2000, 3)
    true_w = np.array([2.0, -1.0, 0.5])
    y = (X @ true_w + 0.3 * rng.randn(2000)) > 0
    w, b = fit_logistic(X, y)
    acc = (((X @ w + b) > 0) == y).mean()
    assert acc > 0.95
    # deterministic
    w2, b2 = fit_logistic(X, y)
    assert np.allclose(w, w2) and b == b2


def test_learned_config_reaches_f1_gate(small_fixture):
    spec, tabs = small_fixture
    records = rd.from_arrow(tabs["records"])
    pairs = tabs["labeled_pairs"].to_pandas()
    cfg, diag = fit_snd_config(records, pairs)
    assert diag["auc"] >= 0.99, diag
    # positive evidence features must carry positive learned weight
    assert cfg.w_tokens > 0 and cfg.w_tfidf > 0
    pred = run_snd(records, cfg).to_pandas()
    ev = pairwise_f1_frames(pred, tabs["ground_truth"].to_pandas())
    mean_f1 = ev.loc[ev["block_key"] == "__mean__", "f1"].iloc[0]
    assert mean_f1 >= 0.99, (diag, ev.tail(3))


def test_learned_config_recovers_hard_ambiguity():
    """Under heavy cross-entity token sharing the fixed default weights
    drop below the gate (~0.97); fitting on labeled pairs recovers it —
    the reason the trainer surface exists (the reference's T6 role)."""
    from whoiswho_ray.fixtures import FixtureSpec, generate_tables

    tabs = generate_tables(FixtureSpec(n_blocks=6, hot_factor=2, seed=11, ambiguity=0.3))
    records = rd.from_arrow(tabs["records"])
    cfg, diag = fit_snd_config(records, tabs["labeled_pairs"].to_pandas())
    pred = run_snd(records, cfg).to_pandas()
    ev = pairwise_f1_frames(pred, tabs["ground_truth"].to_pandas())
    mean_f1 = ev.loc[ev["block_key"] == "__mean__", "f1"].iloc[0]
    assert mean_f1 >= 0.99, (diag, ev.tail(3))
