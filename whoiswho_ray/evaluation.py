"""Pairwise-F1 evaluation — the reference's own formula.

Re-implements ``/root/reference/whoiswho/evaluation/SNDeval.py:9-70``
semantics: per block (per name), over all record pairs,

    TP      = pairs together in prediction AND truth
    TP+FP   = pairs together in prediction
    TP+FN   = pairs together in truth
    P = TP/(TP+FP), R = TP/(TP+FN), F1 = 2PR/(P+R)

then the **unweighted mean over blocks** (``SNDeval.py:15-43``). Pair
counts come from the contingency table in O(N) per block via sums of
C(n,2) — never by enumerating pairs.

Also provides the labeled-pair variant used by the BASELINE.json gate
("pairwise F1 ≥ 0.99 on labeled pairs at the same blocking key"): each
labeled pair is predicted-same iff both records share a cluster_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _comb2(x: np.ndarray | int) -> np.ndarray | float:
    return x * (x - 1) / 2.0


def _block_counts(pred_label: pd.Series, true_label: pd.Series) -> tuple[float, float, float]:
    ct = pd.crosstab(pred_label, true_label)
    tp = float(_comb2(ct.to_numpy().astype(np.float64)).sum())
    tp_fp = float(_comb2(ct.sum(axis=1).to_numpy().astype(np.float64)).sum())
    tp_fn = float(_comb2(ct.sum(axis=0).to_numpy().astype(np.float64)).sum())
    return tp, tp_fp, tp_fn


def _f1(tp: float, tp_fp: float, tp_fn: float) -> tuple[float, float, float]:
    p = tp / tp_fp if tp_fp > 0 else 0.0
    r = tp / tp_fn if tp_fn > 0 else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f1


def pairwise_f1_frames(pred: pd.DataFrame, truth: pd.DataFrame) -> pd.DataFrame:
    """Driver-side evaluation on small frames.

    pred: (block_key, record_id, cluster_id); truth: (block_key, record_id,
    entity_id). Returns one row per block: precision, recall, f1 (+ mean row
    with block_key='__mean__').
    """
    joined = pred.merge(truth[["record_id", "entity_id"]], on="record_id", how="inner")
    rows = []
    for bk, g in joined.groupby("block_key", sort=True):
        tp, tp_fp, tp_fn = _block_counts(g["cluster_id"], g["entity_id"])
        p, r, f1 = _f1(tp, tp_fp, tp_fn)
        rows.append({"block_key": bk, "precision": p, "recall": r, "f1": f1})
    out = pd.DataFrame(rows)
    mean = {"block_key": "__mean__", "precision": out["precision"].mean(),
            "recall": out["recall"].mean(), "f1": out["f1"].mean()}
    return pd.concat([out, pd.DataFrame([mean])], ignore_index=True)


def pairwise_f1_ds(pred: "ray.data.Dataset", truth: "ray.data.Dataset") -> pd.DataFrame:
    """Distributed variant: per-block counts via one groupby shuffle, tiny
    per-block result collected to the driver for the unweighted mean."""
    p = pred.select_columns(["block_key", "record_id", "cluster_id"]).map_batches(
        lambda df: df.rename(columns={"cluster_id": "label"}).assign(kind="pred"),
        batch_format="pandas",
    )
    t = truth.select_columns(["block_key", "record_id", "entity_id"]).map_batches(
        lambda df: df.rename(columns={"entity_id": "label"}).assign(kind="true"),
        batch_format="pandas",
    )

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        wide = g.pivot_table(index="record_id", columns="kind", values="label",
                             aggfunc="first").dropna()
        if len(wide) == 0:
            return pd.DataFrame({"block_key": [], "precision": [], "recall": [], "f1": []})
        tp, tp_fp, tp_fn = _block_counts(wide["pred"], wide["true"])
        prec, rec, f1 = _f1(tp, tp_fp, tp_fn)
        return pd.DataFrame({"block_key": [g["block_key"].iloc[0]],
                             "precision": [prec], "recall": [rec], "f1": [f1]})

    per = p.union(t).groupby("block_key").map_groups(per_block, batch_format="pandas").to_pandas()
    mean = {"block_key": "__mean__", "precision": per["precision"].mean(),
            "recall": per["recall"].mean(), "f1": per["f1"].mean()}
    return pd.concat([per, pd.DataFrame([mean])], ignore_index=True)


def labeled_pair_f1(pred: pd.DataFrame, pairs: pd.DataFrame) -> dict:
    """BASELINE gate: F1 over explicit labeled pairs at the same block key.

    pred: (record_id, cluster_id); pairs: (record_id_a, record_id_b,
    same_entity). Pairs whose records are missing from pred count as
    predicted-different (conservative).
    """
    cl = pred.set_index("record_id")["cluster_id"]
    ca = pairs["record_id_a"].map(cl)
    cb = pairs["record_id_b"].map(cl)
    pred_same = (ca == cb) & ca.notna() & cb.notna()
    truth = pairs["same_entity"].astype(bool)
    tp = float((pred_same & truth).sum())
    fp = float((pred_same & ~truth).sum())
    fn = float((~pred_same & truth).sum())
    p = tp / (tp + fp) if tp + fp > 0 else 0.0
    r = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn,
            "n_pairs": int(len(pairs))}


def assignment_metrics(
    assignments: pd.DataFrame,
    truth: pd.DataFrame,
    cluster_truth: pd.DataFrame,
) -> dict:
    """RND-style evaluation (``/root/reference/whoiswho/evaluation/
    RNDeval.py:3-45`` analog): each predicted cluster is mapped to its
    majority true entity (from the known records that formed it); an
    assignment is correct when the new record's entity matches its
    assigned cluster's entity, and a NIL is correct when the record's
    entity has no profile. Reports accuracy plus size-weighted
    precision/recall/F1 over entities.

    assignments: (record_id, assigned_cluster); truth: (record_id,
    entity_id) for the new records; cluster_truth: (record_id, cluster_id,
    entity_id) for the known records.
    """
    majority = (
        cluster_truth.groupby("cluster_id")["entity_id"]
        .agg(lambda s: s.mode().iloc[0])
    )
    known_entities = set(cluster_truth["entity_id"].unique())
    a = assignments.merge(truth[["record_id", "entity_id"]], on="record_id", how="inner")
    a["pred_entity"] = a["assigned_cluster"].map(majority)
    is_nil = a["assigned_cluster"] == "NIL"
    nil_correct = is_nil & ~a["entity_id"].isin(known_entities)
    hit = (~is_nil) & (a["pred_entity"] == a["entity_id"])
    correct = hit | nil_correct
    # size-weighted P/R/F1 per entity (weights = #records of the entity)
    rows = []
    for ent, g in a.groupby("entity_id"):
        tp = float((g["pred_entity"] == ent).sum())
        fp_frame = a[(a["pred_entity"] == ent) & (a["entity_id"] != ent)]
        p = tp / (tp + len(fp_frame)) if tp + len(fp_frame) > 0 else 0.0
        r = tp / len(g) if len(g) else 0.0
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        rows.append({"entity": ent, "n": len(g), "precision": p, "recall": r, "f1": f1})
    per = pd.DataFrame(rows)
    wsum = per["n"].sum()
    return {
        "accuracy": float(correct.mean()) if len(a) else 0.0,
        "nil_rate": float(is_nil.mean()) if len(a) else 0.0,
        "weighted_precision": float((per["precision"] * per["n"]).sum() / wsum) if wsum else 0.0,
        "weighted_recall": float((per["recall"] * per["n"]).sum() / wsum) if wsum else 0.0,
        "weighted_f1": float((per["f1"] * per["n"]).sum() / wsum) if wsum else 0.0,
        "n_assigned": int((~is_nil).sum()),
        "n_records": int(len(a)),
    }


def ind_weighted_auc(pred: pd.DataFrame, truth: pd.DataFrame) -> dict:
    """IND evaluation — the KDD-Cup-2024 incorrect-assignment metric the
    reference's mind/ module is scored against (MIND paper,
    arXiv:2412.03930 §5.1): per-profile AUC of the predicted scores
    against the normal/outlier labels (normal = positive, so higher
    scores should mean more-likely-correct), averaged with each profile
    weighted by its OUTLIER count — profiles with no outliers or no
    normals have undefined AUC and zero weight.

    pred: (profile_id, record_id, score); truth: (record_id, is_outlier).
    AUC per profile via the rank statistic (Mann–Whitney U), average
    ranks on ties.
    """
    df = pred.merge(truth[["record_id", "is_outlier"]].rename(
        columns={"is_outlier": "_truth"}), on="record_id", how="inner")
    total_w = 0.0
    acc = 0.0
    per = {}
    for pid, g in df.groupby("profile_id"):
        neg = g["_truth"].to_numpy(dtype=bool)
        n_out = int(neg.sum())
        n_norm = int((~neg).sum())
        if n_out == 0 or n_norm == 0:
            continue
        ranks = pd.Series(g["score"].to_numpy()).rank(method="average").to_numpy()
        u = ranks[~neg].sum() - n_norm * (n_norm + 1) / 2.0
        auc = u / (n_norm * n_out)
        per[pid] = auc
        acc += n_out * auc
        total_w += n_out
    return {
        "weighted_auc": float(acc / total_w) if total_w else float("nan"),
        "n_profiles_scored": len(per),
        "per_profile": per,
    }


def blocking_quality(
    ds: "ray.data.Dataset",
    block_col: str = "block_key",
    truth_col: str = "content_sha256",
) -> pd.DataFrame:
    """Blocking-stage quality metrics (the standard record-linkage pair:
    reduction ratio + pair completeness, Christen, "Data Matching",
    ch. 7): how much of the quadratic comparison space the blocking key
    prunes, and what fraction of TRUE match pairs (rows sharing
    ``truth_col``) it keeps co-located. One summary row, every count an
    int64 (sums of C(n,2) from group sizes — pairs are never
    enumerated), ratios single divisions of those ints (IEEE-identical
    in SQL).

    Scale shape: three grouped counts — per block (bounded key space,
    driver combine), per truth key and per (truth, block) (unbounded,
    ``final='shuffle'`` then per-batch C(n,2) partial sums; only one
    int64 per block reaches the driver).
    """
    from whoiswho_ray.stages.agg import grouped_agg

    def pair_sum(counts_ds) -> int:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n"].to_numpy(np.int64)
            return pd.DataFrame({"p": [int((n * (n - 1) // 2).sum())]})

        parts = counts_ds.map_batches(partial, batch_format="pandas").to_pandas()
        return int(parts["p"].sum())

    blocks = grouped_agg(ds, block_col, {"n": (None, "count")})
    n_records = int(blocks["n"].sum())
    nb = blocks["n"].to_numpy(np.int64)
    candidate_pairs = int((nb * (nb - 1) // 2).sum())
    total_pairs = n_records * (n_records - 1) // 2
    truth_pairs = pair_sum(grouped_agg(ds, truth_col,
                                       {"n": (None, "count")},
                                       final="shuffle"))
    covered_pairs = pair_sum(grouped_agg(ds, [truth_col, block_col],
                                         {"n": (None, "count")},
                                         final="shuffle"))
    return pd.DataFrame({
        "n_records": [np.int64(n_records)],
        "total_pairs": [np.int64(total_pairs)],
        "candidate_pairs": [np.int64(candidate_pairs)],
        "truth_pairs": [np.int64(truth_pairs)],
        "covered_pairs": [np.int64(covered_pairs)],
        "pair_completeness": [covered_pairs / truth_pairs
                              if truth_pairs else 0.0],
        "reduction_ratio": [1.0 - candidate_pairs / total_pairs
                            if total_pairs else 0.0],
    })


def cluster_contingency(
    ds: "ray.data.Dataset", pred_col: str, true_col: str
) -> "ray.data.Dataset":
    """Distributed contingency table ``(pred, true, n)`` — one row per
    (predicted-cluster, true-entity) cell. Per-batch pandas partial
    counts, one bucketed shuffle over the composite key; cell count is
    bounded by the record count, never materialized on the driver."""
    from .stages.agg import grouped_agg

    return grouped_agg(ds, [pred_col, true_col], {"n": (None, "count")},
                       final="shuffle")


def bcubed_report(
    ds: "ray.data.Dataset", pred_col: str, true_col: str
) -> "ray.data.Dataset":
    """Per-predicted-cluster B-cubed report (Bagga & Baldwin, 1998).

    For each predicted cluster c: ``n_rows`` (cluster size),
    ``n_entities`` (distinct true labels inside), ``max_overlap``
    (largest single-entity overlap — the majority-label count),
    ``purity_num`` = sum over entities of overlap² (the B-cubed
    numerator: summed per-record precision × n_c), and
    ``bcubed_precision`` = purity_num / n_c² — the mean per-record
    B-cubed precision of the cluster. All counts are int64; the only
    float is ONE division of two exact ints, so a SQL oracle compares
    bit-exactly (guarded: raises if n_c² would overflow int64).

    Global B-cubed/ARI summaries live in :func:`pair_comparison_summary`
    / :func:`bcubed_scores`.
    """
    from .stages.agg import group_apply

    cont = cluster_contingency(ds, pred_col, true_col)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.int64)
        n_c = int(n.sum())
        if n_c >= 3_037_000_499:  # sqrt(int64 max)
            raise OverflowError("bcubed_report: cluster too large for "
                                "int64 purity arithmetic")
        purity = int((n * n).sum())
        return pd.DataFrame({
            pred_col: [g[pred_col].iloc[0]],
            "n_rows": [np.int64(n_c)],
            "n_entities": [np.int64(len(n))],
            "max_overlap": [np.int64(n.max())],
            "purity_num": [np.int64(purity)],
            "bcubed_precision": [float(purity) / (n_c * n_c)],
        })

    return group_apply(cont, pred_col, kernel, batch_format="pandas")


def _int_scalar_sum(ds: "ray.data.Dataset", expr) -> int:
    """Exact integer sum of ``expr(n_array)`` over a Dataset's ``n``
    column — per-batch int partials, Python-int driver total (no
    float, no overflow)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64)
        return pd.DataFrame({"s": [int(expr(n))]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return int(sum(int(v) for v in parts["s"]))


def pair_comparison_summary(
    ds: "ray.data.Dataset", pred_col: str, true_col: str
) -> pd.DataFrame:
    """One-row external-clustering-validity summary: exact integer pair
    statistics plus Adjusted Rand Index (Hubert & Arabie, 1985) and
    pairwise precision/recall/F1.

    Integer columns are exact (Python-int driver sums). Float columns
    are computed with a FIXED scalar operation order mirrored verbatim
    by the SQL oracle (single divisions; ARI's four-term expression) so
    cross-engine comparison is bit-exact — no float SUM aggregate whose
    addition order an engine may choose.
    """
    from .stages.agg import grouped_agg

    cont = cluster_contingency(ds, pred_col, true_col)

    def c2(n: np.ndarray) -> int:
        return int((n.astype(object) * (n.astype(object) - 1) // 2).sum())

    index = _int_scalar_sum(cont, c2)
    n_records = _int_scalar_sum(cont, lambda n: n.sum())
    pred_marg = grouped_agg(cont, pred_col, {"n": ("n", "sum")},
                            final="shuffle")
    true_marg = grouped_agg(cont, true_col, {"n": ("n", "sum")},
                            final="shuffle")
    a = _int_scalar_sum(pred_marg, c2)
    b = _int_scalar_sum(true_marg, c2)
    n_pred = _int_scalar_sum(pred_marg, lambda n: len(n))
    n_true = _int_scalar_sum(true_marg, lambda n: len(n))
    total = n_records * (n_records - 1) // 2

    # float ops in EXACTLY this order — the oracle mirrors it
    precision = float(index) / float(a) if a else 0.0
    recall = float(index) / float(b) if b else 0.0
    f1 = 2.0 * float(index) / (float(a) + float(b)) if (a + b) else 0.0
    if total:
        exp = float(a) * float(b) / float(total)
        mx = (float(a) + float(b)) / 2.0
        ari = (float(index) - exp) / (mx - exp) if mx != exp else 0.0
    else:
        ari = 0.0

    return pd.DataFrame({
        "n_records": [np.int64(n_records)],
        "n_pred_clusters": [np.int64(n_pred)],
        "n_true_entities": [np.int64(n_true)],
        "pair_index": [np.int64(index)],
        "pred_pairs": [np.int64(a)],
        "true_pairs": [np.int64(b)],
        "pair_precision": [precision],
        "pair_recall": [recall],
        "pair_f1": [f1],
        "ari": [ari],
    })


def bcubed_scores(
    ds: "ray.data.Dataset", pred_col: str, true_col: str
) -> dict:
    """Global B-cubed precision/recall/F1 (record-averaged). Float sums
    use ``math.fsum`` over driver-collected PER-CLUSTER rationals (one
    row per cluster/entity — bounded like every report here), so the
    value is deterministic but not SQL-bit-mirrorable; tested against
    brute force, not oracled."""
    import math

    from .stages.agg import group_apply

    cont = cluster_contingency(ds, pred_col, true_col)

    def side(col: str) -> tuple[float, int]:
        def kernel(g: pd.DataFrame) -> pd.DataFrame:
            n = g["n"].to_numpy(np.int64)
            tot = int(n.sum())
            return pd.DataFrame({"r": [float((n * n).sum()) / tot]})

        rows = group_apply(cont, col, kernel,
                           batch_format="pandas").to_pandas()
        return math.fsum(sorted(rows["r"])), len(rows)

    p_sum, n_pred = side(pred_col)
    r_sum, n_true = side(true_col)
    n_records = _int_scalar_sum(cont, lambda n: n.sum())
    p = p_sum / n_records if n_records else 0.0
    r = r_sum / n_records if n_records else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {"bcubed_precision": p, "bcubed_recall": r, "bcubed_f1": f1,
            "n_records": n_records, "n_pred_clusters": n_pred,
            "n_true_entities": n_true}
