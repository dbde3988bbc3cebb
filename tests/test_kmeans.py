"""Distributed Lloyd's k-means (stages/kmeans.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from whoiswho_ray.stages.kmeans import (
    kmeans_assign,
    kmeans_fit,
    kmeans_init,
    run_kmeans,
)


def _blobs(n_per: int = 60, k: int = 5, d: int = 16, seed: int = 7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, d) * 10.0
    X = np.concatenate([centers[c] + rng.randn(n_per, d) * 0.3 for c in range(k)])
    labels = np.repeat(np.arange(k), n_per)
    df = pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
        "label": labels,
    })
    return df, centers


def _reference_fit(df: pd.DataFrame, k: int, iters: int) -> np.ndarray:
    """Driver-side numpy replay of the documented semantics."""
    import hashlib

    X = np.asarray([np.asarray(v, np.float64) for v in df["embedding"]])
    h = [hashlib.md5(str(v).encode()).hexdigest() for v in df["vec_id"]]
    order = np.argsort(h)[:k]
    cents = X[order].copy()
    for _ in range(iters):
        dist = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(dist, axis=1)
        for c in range(k):
            m = X[a == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


class TestKmeans:
    def test_recovers_planted_blobs(self, ray_session):
        import hashlib

        df, centers = _blobs()
        # vanilla k-means is init-sensitive: place the 5 smallest-md5 rows
        # (the deterministic seeds) one per blob so every blob gets a seed
        # — the test exercises the distributed machinery, not seed luck
        h = np.argsort([hashlib.md5(str(v).encode()).hexdigest()
                        for v in df["vec_id"]])[:5]
        for c, i in enumerate(h):
            df.at[i, "embedding"] = centers[c].astype(np.float32)
            df.at[i, "label"] = c
        out = run_kmeans(rd.from_pandas(df), k=5, iters=4,
                         keep=["vec_id", "label"]).to_pandas()
        # every true blob maps to exactly one predicted cluster and
        # vice versa (blobs are far apart relative to their spread)
        tab = out.groupby("label")["cluster"].nunique()
        assert (tab == 1).all(), tab
        assert out["cluster"].nunique() == 5

    def test_matches_driver_reference(self, ray_session):
        df, _ = _blobs(n_per=40, k=4, d=8, seed=3)
        cents = kmeans_fit(rd.from_pandas(df), k=4, iters=3)
        ref = _reference_fit(df, k=4, iters=3)
        np.testing.assert_allclose(cents, ref, rtol=1e-12)

    def test_init_is_order_invariant(self, ray_session):
        df, _ = _blobs(n_per=30, k=3, d=8, seed=11)
        a = kmeans_init(rd.from_pandas(df), k=6)
        shuffled = df.sample(frac=1.0, random_state=0).reset_index(drop=True)
        b = kmeans_init(rd.from_pandas(shuffled), k=6)
        np.testing.assert_array_equal(a, b)

    def test_init_never_global_sorts(self, ray_session, monkeypatch):
        """Seed selection is a per-batch partial top-k + driver merge —
        no whole-dataset sort().limit(k) shuffle (VERDICT r3 #3), with
        seeds identical to the documented smallest-md5 rule."""
        import hashlib

        def boom(self, *a, **k):
            raise AssertionError("global sort in kmeans_init")

        monkeypatch.setattr(rd.Dataset, "sort", boom)
        df, _ = _blobs(n_per=30, k=3, d=8, seed=11)
        got = kmeans_init(rd.from_pandas(df), k=6)
        h = np.argsort([hashlib.md5(str(v).encode()).hexdigest()
                        for v in df["vec_id"]], kind="stable")[:6]
        expect = np.asarray([np.asarray(v, np.float64)
                             for v in df["embedding"].iloc[h]])
        np.testing.assert_array_equal(got, expect)

    def test_empty_batch_guards(self, ray_session):
        """Empty blocks pass through partials and assign without crashing
        (ADVICE r3: X[:, None, :] raised IndexError on a 0-row batch)."""
        from whoiswho_ray.stages.kmeans import _partial_stats

        cents = np.zeros((3, 4))
        out = _partial_stats(pd.DataFrame({"embedding": []}), cents, "embedding")
        assert len(out) == 0
        assert list(out.columns) == ["cluster", "n", "vsum"]
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "embedding": pd.Series([], dtype=object)})
        assigned = kmeans_assign(rd.from_pandas(empty), cents,
                                 keep=["vec_id"]).to_pandas()
        assert len(assigned) == 0

    def test_empty_cluster_keeps_centroid(self, ray_session):
        # 10 identical points: every vector lands in one cluster; the
        # other seeds (duplicates of the same point) must keep their
        # previous centroid rather than divide by zero
        df = pd.DataFrame({
            "vec_id": np.arange(10, dtype=np.int64),
            "embedding": [np.ones(4, np.float32)] * 10,
        })
        cents = kmeans_fit(rd.from_pandas(df), k=3, iters=2)
        assert np.isfinite(cents).all()
        np.testing.assert_allclose(cents, np.ones((3, 4)))
        out = kmeans_assign(rd.from_pandas(df), cents, keep=["vec_id"]).to_pandas()
        # ties resolve to the smallest cluster index
        assert (out["cluster"] == 0).all()
