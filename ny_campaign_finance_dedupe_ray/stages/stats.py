"""Run-metrics stage: the ``match_runs`` telemetry row
(/root/reference/data_load/pre_init_db.py:23-28, written at
campaign_finance_dedupe.py:469-482) as a JSON manifest per run, computed
with distributed aggregates (per-batch partial counts -> small groupby)."""

from __future__ import annotations

import json
import time

import pandas as pd
import pyarrow as pa
import ray.data


def cluster_run_metrics(
    clusters: "ray.data.Dataset",
    predicates: list[str] | None = None,
    run_seconds: float | None = None,
    settings_name: str | None = None,
) -> dict:
    """CLUSTERS -> the match_runs metric row: total_clusters, avg/biggest
    cluster size, total records, record/cluster ratio."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column("cluster_id").value_counts()
        return pa.table(
            {"cluster_id": vc.field("values"), "partial": vc.field("counts")}
        )

    from ray.data.aggregate import Sum

    sizes = (
        clusters.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Sum("partial", alias_name="n"))
        .to_pandas()
    )
    n_clusters = int(len(sizes))
    total = int(sizes["n"].sum()) if n_clusters else 0
    return {
        "predicates": predicates or [],
        "total_clusters": n_clusters,
        "avg_cluster_size": float(sizes["n"].mean()) if n_clusters else 0.0,
        "biggest_cluster_size": int(sizes["n"].max()) if n_clusters else 0,
        "total_records": total,
        "record_cluster_ratio": (total / n_clusters) if n_clusters else 0.0,
        "run_time_s": run_seconds,
        "settings_file": settings_name,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }


def top_clusters(clusters: "ray.data.Dataset", k: int = 10) -> pd.DataFrame:
    """Biggest clusters (campaign_finance_dedupe.py:419-437)."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t.column("cluster_id").value_counts()
        return pa.table(
            {"cluster_id": vc.field("values"), "partial": vc.field("counts")}
        )

    from ray.data.aggregate import Sum

    return (
        clusters.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Sum("partial", alias_name="cluster_size"))
        .sort(["cluster_size", "cluster_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )


def write_run_manifest(
    path: str, metrics: dict, include_dropped_work: bool = True
) -> None:
    """Persist the run metrics; when dropped-work counting was enabled
    (state/counters.enable_counters), the manifest also records every cap
    that fired — hot blocking keys, oversized LSH bands / embedding
    buckets, link-block caps — so a capped run is visibly capped
    (VERDICT r3 #6).  Counters are reset after being folded in, so each
    manifest covers one run."""
    if include_dropped_work:
        try:
            from ..state.counters import dropped_totals

            metrics = {**metrics, "dropped_work": dropped_totals(reset=True)}
        except Exception:
            metrics = {**metrics, "dropped_work": {}}
    with open(path, "w") as f:
        json.dump(metrics, f, indent=2)


def distinct_count(
    ds: "ray.data.Dataset",
    key_col: str,
    distinct_col: str,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact COUNT(DISTINCT distinct_col) per ``key_col`` — the standard
    scale pattern: a LOCAL per-batch dedup combiner bounds what the
    shuffle moves at the true distinct count, a (key, value)-hash
    bucketed groupby dedups globally (a pair lives in exactly one
    bucket, so per-bucket counts sum exactly), and a tiny final groupby
    adds the per-bucket partials.  Output: (key_col, n_distinct),
    n_distinct int64; null distinct values are not counted (SQL
    COUNT(DISTINCT) semantics), null keys group together like SQL
    GROUP BY."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import hash64_str

    def local_dedup(t: pa.Table) -> pa.Table:
        t = t.select([key_col, distinct_col]).filter(
            pc.is_valid(t.column(distinct_col))
        )
        # a sentinel-filled STRING key rides along for the final groupby:
        # a null key sorts fine as "\x00null" where a genuinely-null typed
        # key would crash Ray's sort-based shuffle on mixed NaN/str
        kstr = t.column(key_col).cast(pa.string()).fill_null("\x00null")
        if isinstance(kstr, pa.ChunkedArray):
            kstr = kstr.combine_chunks()
        pair = pc.binary_join_element_wise(
            kstr, t.column(distinct_col).cast(pa.string()), "\x1f"
        )
        if isinstance(pair, pa.ChunkedArray):
            pair = pair.combine_chunks()
        h = hash64_str(pair)
        t = t.append_column("_key_str", kstr)
        t = t.append_column(
            "_bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )
        # combiner: within the batch, keep each (key, value) once
        df = t.to_pandas().drop_duplicates(["_key_str", distinct_col])
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_counts(g: "pd.DataFrame") -> "pd.DataFrame":
        uniq = g.drop_duplicates(["_key_str", distinct_col])
        agg = (
            uniq.groupby("_key_str")
            .agg(partial=(distinct_col, "size"), **{key_col: (key_col, "first")})
            .reset_index()
        )
        return agg

    def sum_partials(g: "pd.DataFrame") -> "pd.DataFrame":
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_distinct": [np.int64(g["partial"].sum())],
            }
        )

    return (
        ds.map_batches(local_dedup, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby("_key_str")
        .map_groups(sum_partials, batch_format="pandas")
    )


def grouped_corr(
    ds: "ray.data.Dataset",
    key_col: str,
    x_col: str,
    y_col: str,
) -> "ray.data.Dataset":
    """Exact per-key Pearson correlation via MERGEABLE co-moments (the
    Chan et al. pairwise-update form): each batch emits one
    (key, n, mean_x, mean_y, M2x, M2y, Cxy) partial per key — numerically
    stable where naive sum-of-squares cancels — and a small groupby merges
    partials with the exact combine rule.  One tiny shuffle; rows where
    either value is null are excluded, null KEYS form their own group
    (SQL corr() / GROUP BY semantics; a sentinel string key rides the
    shuffle like distinct_count's).
    Output: (key_col, corr) float64."""
    import numpy as np

    def partials(t: pa.Table) -> pa.Table:
        x = t.column(x_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        y = t.column(y_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        ok = ~np.isnan(x) & ~np.isnan(y)
        kstr = t.column(key_col).cast(pa.string()).fill_null("\x00null")
        if isinstance(kstr, pa.ChunkedArray):
            kstr = kstr.combine_chunks()
        df = pd.DataFrame(
            {
                "k": kstr.to_numpy(zero_copy_only=False)[ok],
                "orig": t.column(key_col).to_pandas()[ok].to_numpy(),
                "x": x[ok],
                "y": y[ok],
            }
        )
        rows = []
        for key, sub in df.groupby("k"):
            n = len(sub)
            mx, my = sub["x"].mean(), sub["y"].mean()
            dx, dy = sub["x"].to_numpy() - mx, sub["y"].to_numpy() - my
            rows.append((key, sub["orig"].iloc[0], n, mx, my,
                         (dx * dx).sum(), (dy * dy).sum(), (dx * dy).sum()))
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.string()),
                "orig": pa.Array.from_pandas(
                    pd.Series([r[1] for r in rows])
                ),
                "n": pa.array([r[2] for r in rows], pa.int64()),
                "mx": pa.array([r[3] for r in rows], pa.float64()),
                "my": pa.array([r[4] for r in rows], pa.float64()),
                "m2x": pa.array([r[5] for r in rows], pa.float64()),
                "m2y": pa.array([r[6] for r in rows], pa.float64()),
                "cxy": pa.array([r[7] for r in rows], pa.float64()),
            }
        )

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        n = m2x = m2y = cxy = 0.0
        mx = my = 0.0
        for r in g.itertuples(index=False):
            nb = float(r.n)
            if nb == 0:
                continue
            na = n
            n = na + nb
            dx, dy = r.mx - mx, r.my - my
            f = na * nb / n
            m2x += r.m2x + dx * dx * f
            m2y += r.m2y + dy * dy * f
            cxy += r.cxy + dx * dy * f
            mx += dx * nb / n
            my += dy * nb / n
        denom = np.sqrt(m2x * m2y)
        corr = cxy / denom if denom > 0 else np.nan
        return pd.DataFrame({key_col: [g["orig"].iloc[0]], "corr": [corr]})

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("k")
        .map_groups(merge, batch_format="pandas")
    )
