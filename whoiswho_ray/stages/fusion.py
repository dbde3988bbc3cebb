"""Survivorship / golden-record fusion — the consolidation step after
entity resolution or deduplication: collapse each duplicate cluster to
ONE canonical record under per-field survivorship rules.

Rules (the classic data-fusion vocabulary):

* ``min`` / ``max``  — extreme value (ids, timestamps, sizes);
* ``longest``        — longest string, ties → lexicographically smallest
                       (then deterministic regardless of partition order);
* ``mode``           — most frequent non-null value, ties → smallest
                       (NOT the engine's ``mode()``, whose tie-break is
                       unspecified — this one is exactly replayable in
                       SQL via a count + row_number ordering).

One cluster-hash bucket shuffle (``group_apply`` whole-bucket mode),
then per-rule VECTORIZED passes over the key-sorted bucket — sort +
boundary masks, no per-cluster Python. NULLs lose to any value under
every rule; an all-null field survives as NULL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def golden_records(
    ds: "ray.data.Dataset",
    cluster_col: str,
    rules: dict[str, str],
) -> "ray.data.Dataset":
    """Fuse ``ds`` to one row per ``cluster_col`` value; ``rules`` maps
    field → one of ``min | max | longest | mode``. Returns
    (cluster_col, *rules-keys) with each field renamed in place."""
    from whoiswho_ray.stages.agg import group_apply

    bad = {r for r in rules.values() if r not in ("min", "max", "longest",
                                                  "mode")}
    if bad:
        raise ValueError(f"unknown survivorship rules: {sorted(bad)}")

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({cluster_col: g[cluster_col],
                                 **{c: g[c] for c in rules}})
        g = g.sort_values(cluster_col, kind="stable").reset_index(drop=True)
        keys = g[cluster_col].to_numpy()
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        out = {cluster_col: keys[starts]}
        idx = np.arange(len(g), dtype=np.int64)
        seg = np.cumsum(new) - 1  # 0-based cluster ordinal per row
        for col, rule in rules.items():
            s = g[col]
            if rule in ("min", "max"):
                # NULLs skipped by the C groupby agg; all-null → NaN
                tmp = pd.DataFrame({"seg": seg, "v": s})
                agg = tmp.groupby("seg", sort=True)["v"].agg(rule)
                out[col] = agg.to_numpy()
            elif rule == "longest":
                ln = s.fillna("").str.len().to_numpy(np.int64)
                ln = np.where(s.isna().to_numpy(), -1, ln)
                # per segment: argmax length, ties → smallest value;
                # lexsort keys are last-is-primary
                order = np.lexsort((s.fillna("").to_numpy(str), -ln, seg))
                first = np.r_[True, seg[order][1:] != seg[order][:-1]]
                pick = order[first]
                vals = s.to_numpy(object)[pick]
                out[col] = [None if pd.isna(v) else v for v in vals]
            else:  # mode
                tmp = pd.DataFrame({"seg": seg, "v": s})
                cnt = (tmp.dropna(subset=["v"])
                       .groupby(["seg", "v"], sort=False)
                       .size().rename("n").reset_index())
                if len(cnt):
                    cs = cnt.sort_values(["seg", "n", "v"],
                                         ascending=[True, False, True],
                                         kind="stable")
                    win = cs[~cs["seg"].duplicated(keep="first")]
                    m = pd.Series(win["v"].to_numpy(object),
                                  index=win["seg"].to_numpy())
                else:
                    m = pd.Series([], dtype=object)
                out[col] = m.reindex(range(len(starts))).to_numpy(object)
        return pd.DataFrame(out)

    return group_apply(ds, cluster_col, fuse, batch_format="pandas",
                       whole_bucket=True)
