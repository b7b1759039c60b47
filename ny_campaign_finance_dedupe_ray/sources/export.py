"""Result exports: the reference's timestamped CSV dumps of the entity map
and donor table (/root/reference/dedupe_extension/campaign_finance_dedupe.py:
360-367 COPY ... TO STDOUT WITH CSV HEADER) as streamed Ray sinks, plus the
CSV-sink shape that replaces the Readable iterator adapter (:37-53)."""

from __future__ import annotations

import os
import time

import ray.data


def export_timestamped(
    ds: "ray.data.Dataset",
    out_dir: str,
    name: str,
    fmt: str = "csv",
    timestamp: str | None = None,
) -> str:
    """Write ``ds`` under ``{out_dir}/{name}_{YYYYmmdd_HHMMSS}/`` (a
    directory of part files — never one giant file) and return the path."""
    ts = timestamp or time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    path = os.path.join(out_dir, f"{name}_{ts}")
    if fmt == "csv":
        ds.write_csv(path)
    elif fmt == "parquet":
        ds.write_parquet(path)
    else:
        raise ValueError(f"unknown export format {fmt!r}")
    return path


def export_entity_map(
    clusters: "ray.data.Dataset", out_dir: str, timestamp: str | None = None
) -> str:
    """The entity_map export: (record_id, cluster_id, cluster_score)."""
    return export_timestamped(
        clusters.select_columns(["record_id", "cluster_id", "cluster_score"]),
        out_dir,
        "entity_map",
        timestamp=timestamp,
    )
