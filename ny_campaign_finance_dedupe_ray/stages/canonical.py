"""Cluster canonicalization: per-field centroid representatives
(/root/reference/dedupe_extension/dedupe/dedupe/canonical.py:5-71).

- get_centroid: the value minimizing mean affine-gap distance to the other
  variants; ties -> first.
- get_canonical_rep: per-field centroid over non-empty values in a cluster.
- canonicalize_clusters: Ray stage — clusters joined to records, one
  canonical record emitted per cluster via hash-bucketed map_groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.affinegap import normalized_affine_gap_distance
from ..functions.hashing import hash64_str


def get_centroid(variants: list[str], comparator=normalized_affine_gap_distance) -> str:
    n = len(variants)
    if n == 1:
        return variants[0]
    dm = np.zeros((n, n))
    for i in range(n):
        for j in range(i):
            d = comparator(variants[i], variants[j])
            dm[i, j] = dm[j, i] = d
    avg = dm.mean(axis=0)
    return variants[int(np.argmin(avg))]  # ties -> first (canonical.py:37-45)


def get_canonical_rep(records: list[dict]) -> dict:
    """Per-field centroid over non-empty values (canonical.py:48-71)."""
    rep: dict = {}
    for key in records[0].keys():
        values = [r[key] for r in records if r.get(key)]
        rep[key] = get_centroid(values) if values else ""
    return rep


def canonicalize_clusters(
    clusters: "ray.data.Dataset",
    records: "ray.data.Dataset",
    fields: tuple[str, ...],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """(record_id, cluster_id) x RECORDS -> one canonical row per cluster.

    Records are joined to their cluster via a bucketed groupby on record_id
    (no broadcast), then canonicalized per cluster."""
    lab = clusters.map_batches(
        lambda t: pa.table(
            {
                "record_id": t.column("record_id").cast(pa.string()),
                "cluster_id": t.column("cluster_id").cast(pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    def tag_records(t: pa.Table) -> pa.Table:
        cols = {"record_id": t.column("record_id").cast(pa.string()),
                "cluster_id": pa.array([None] * t.num_rows, pa.string())}
        for f in fields:
            cols[f] = t.column(f).cast(pa.string())
        return pa.table(cols)

    def tag_labels(t: pa.Table) -> pa.Table:
        cols = {"record_id": t.column("record_id"),
                "cluster_id": t.column("cluster_id")}
        for f in fields:
            cols[f] = pa.array([None] * t.num_rows, pa.string())
        return pa.table(cols)

    def bucket_by(t: pa.Table, col: str) -> pa.Table:
        c = t.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        h = hash64_str(c)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    unioned = (
        records.map_batches(tag_records, batch_format="pyarrow")
        .union(lab.map_batches(tag_labels, batch_format="pyarrow"))
        .map_batches(lambda t: bucket_by(t, "record_id"), batch_format="pyarrow")
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        labels = g[g["cluster_id"].notna()][["record_id", "cluster_id"]]
        recs = g[g["cluster_id"].isna()].drop(columns=["cluster_id", "bucket"])
        out = recs.merge(labels, on="record_id", how="inner")
        return out[["record_id", "cluster_id", *fields]]

    labeled = unioned.groupby("bucket").map_groups(attach, batch_format="pandas")

    def canon_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cid, sub in g.groupby("cluster_id", sort=False):
            # order by record_id so the centroid tie-break (first value,
            # canonical.py:37-45) is deterministic under any partitioning
            recs = sub.sort_values("record_id")[list(fields)].to_dict("records")
            rep = get_canonical_rep(recs)
            rep["cluster_id"] = cid
            rep["cluster_size"] = len(recs)
            rows.append(rep)
        if not rows:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object)
                 for c in ["cluster_id", "cluster_size", *fields]}
            )
        return pd.DataFrame(rows)[["cluster_id", "cluster_size", *fields]]

    return (
        labeled.map_batches(
            lambda t: bucket_by(t.drop_columns(["bucket"]) if "bucket" in t.column_names else t, "cluster_id"),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(canon_bucket, batch_format="pandas")
    )
