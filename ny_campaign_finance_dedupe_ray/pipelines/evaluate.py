"""Pairwise precision/recall/F1 against labeled pairs — the evaluation
harness of the reference's golden-label tests
(/root/reference/dedupe_extension/dedupe/tests/canonical.py:28-39): predicted
duplicate pairs = pairs sharing a cluster id; scored against true pairs,
restricted to the labeled pair set (FIXTURES.md §2).
"""

from __future__ import annotations

import pandas as pd


def pairwise_prf(
    clusters: pd.DataFrame, labels: pd.DataFrame
) -> dict[str, float]:
    """clusters: (record_id, cluster_id); labels: (url_a, url_b, is_match)
    with url_a < url_b.  Returns precision/recall/f1 over labeled pairs."""
    cid = dict(zip(clusters["record_id"], clusters["cluster_id"]))
    pred = []
    for a, b in zip(labels["url_a"], labels["url_b"]):
        ca, cb = cid.get(a), cid.get(b)
        pred.append(ca is not None and ca == cb)
    truth = labels["is_match"].to_numpy()
    pred = pd.Series(pred).to_numpy()
    tp = int((pred & truth).sum())
    fp = int((pred & ~truth).sum())
    fn = int((~pred & truth).sum())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "fp": fp,
        "fn": fn,
    }


def cluster_shape_metrics(clusters: pd.DataFrame) -> dict[str, float]:
    """The match_runs metrics (total clusters, avg/biggest cluster size,
    record/cluster ratio — /root/reference/data_load/pre_init_db.py:23-28)."""
    sizes = clusters.groupby("cluster_id").size()
    n_records = len(clusters)
    n_clusters = int(len(sizes))
    return {
        "total_clusters": n_clusters,
        "avg_cluster_size": float(sizes.mean()) if n_clusters else 0.0,
        "biggest_cluster_size": int(sizes.max()) if n_clusters else 0,
        "total_records": n_records,
        "record_cluster_ratio": (n_records / n_clusters) if n_clusters else 0.0,
    }
