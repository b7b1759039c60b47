"""Exact distributed quantiles WITHOUT a full sort.

A sort-based quantile moves every row through an all-to-all exchange; at
corpus scale that is the single most expensive way to learn one number.
This module finds exact order statistics by iterative histogram
refinement instead: each pass is ONE streaming ``map_batches`` scan that
emits a tiny per-(target, bin) count vector, the driver narrows each
target's value interval to the bin containing its rank, and once a bin
holds few enough rows they are collected and the exact value picked.
log_B(range) passes (2-4 in practice) of O(bytes-scanned), zero shuffle,
nothing corpus-sized on the driver.

``quantile_cont`` semantics (DuckDB / numpy 'linear'): for quantile q
over n non-null values, rank r = (n-1)·q, and the result interpolates
the floor(r)-th and ceil(r)-th order statistics (0-indexed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _column_values(t: pa.Table, col: str) -> np.ndarray:
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.cast(pa.float64()).to_numpy(zero_copy_only=False)


def exact_quantiles(
    ds: "ray.data.Dataset",
    value_col: str,
    qs: "list[float]",
    by: str | None = None,
    n_bins: int = 512,
    collect_threshold: int = 100_000,
    max_passes: int = 64,
) -> pd.DataFrame:
    """Exact (interpolated) quantiles of ``value_col``, optionally per
    ``by`` group.  Returns a SMALL pandas frame: ([by], q, value) — one
    row per (group, q); groups with zero non-null values are omitted.

    Scale shape: the number of passes is bounded (float64 range / bins),
    each pass streams the dataset once and reduces to
    O(groups × targets × n_bins) ints on the driver; the only row-level
    collect is the final bin of ≤ ``collect_threshold`` values per
    target.  The driver state is proportional to groups × len(qs) — use
    a pre-aggregation for high-cardinality ``by`` columns (documented
    limit, not a silent cap: > 10_000 groups raises).
    Nulls and NaNs are excluded (SQL aggregate semantics).
    """
    cols = [value_col] + ([by] if by else [])
    slim = ds.select_columns(cols).materialize()

    # pass 0: per-group (count, min, max)
    def stats(t: pa.Table) -> pa.Table:
        v = _column_values(t, value_col)
        ok = ~np.isnan(v)
        if by:
            g = t.column(by).to_numpy(zero_copy_only=False)
            df = pd.DataFrame({"g": g[ok], "v": v[ok]})
            agg = df.groupby("g")["v"].agg(["size", "min", "max"]).reset_index()
            return pa.table(
                {
                    "g": pa.array(agg["g"]),
                    "n": pa.array(agg["size"].astype(np.int64)),
                    "lo": pa.array(agg["min"].astype(np.float64)),
                    "hi": pa.array(agg["max"].astype(np.float64)),
                }
            )
        vv = v[ok]
        return pa.table(
            {
                "g": pa.array(["_all_"]),
                "n": pa.array([np.int64(len(vv))]),
                "lo": pa.array([float(vv.min()) if len(vv) else np.nan]),
                "hi": pa.array([float(vv.max()) if len(vv) else np.nan]),
            }
        )

    parts = slim.map_batches(stats, batch_format="pyarrow").to_pandas()
    groups = (
        parts.groupby("g")
        .agg(n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
        .reset_index()
    )
    groups = groups[groups["n"] > 0]
    if len(groups) > 10_000:
        raise ValueError(
            f"{len(groups)} groups — exact_quantiles tracks driver state "
            "per (group, quantile); pre-aggregate high-cardinality keys"
        )

    # targets: one per (group, needed order statistic)
    targets = {}  # (g, k) -> dict(lo, hi, k_local, value)
    ranks = {}  # (g, q) -> (r, k1, k2)
    for _, row in groups.iterrows():
        n = int(row["n"])
        for q in qs:
            r = (n - 1) * float(q)
            k1, k2 = int(np.floor(r)), int(np.ceil(r))
            ranks[(row["g"], q)] = (r, k1, k2)
            for k in (k1, k2):
                targets.setdefault(
                    (row["g"], k),
                    {"lo": float(row["lo"]), "hi": float(row["hi"]),
                     "k": k, "value": None, "count": n},
                )

    def unresolved():
        return {key: t for key, t in targets.items() if t["value"] is None}

    # trivial targets: single-value interval
    for t in targets.values():
        if t["lo"] == t["hi"]:
            t["value"] = t["lo"]

    for _ in range(max_passes):
        live = unresolved()
        if not live:
            break
        # collect small targets exactly: one filtered pull per target
        spec = []  # (g, lo, hi, edges) per live target, broadcast via closure
        keys = list(live.keys())
        edges = {
            key: np.linspace(live[key]["lo"], live[key]["hi"], n_bins + 1)
            for key in keys
        }

        def histogram(t: pa.Table) -> pa.Table:
            v = _column_values(t, value_col)
            ok = ~np.isnan(v)
            g = (
                t.column(by).to_numpy(zero_copy_only=False)
                if by
                else np.full(t.num_rows, "_all_", dtype=object)
            )
            out_k, out_b, out_c = [], [], []
            for ti, key in enumerate(keys):
                gg, _ = key
                e = edges[key]
                mask = ok & (g == gg) & (v >= e[0]) & (v <= e[-1])
                if not mask.any():
                    continue
                idx = np.clip(
                    np.searchsorted(e, v[mask], side="right") - 1,
                    0,
                    n_bins - 1,
                )
                cnt = np.bincount(idx, minlength=n_bins)
                nz = np.nonzero(cnt)[0]
                out_k.extend([ti] * len(nz))
                out_b.extend(nz.tolist())
                out_c.extend(cnt[nz].tolist())
            return pa.table(
                {
                    "ti": pa.array(out_k, pa.int64()),
                    "bin": pa.array(out_b, pa.int64()),
                    "cnt": pa.array(out_c, pa.int64()),
                }
            )

        hist = slim.map_batches(histogram, batch_format="pyarrow").to_pandas()
        for ti, key in enumerate(keys):
            t = live[key]
            sub = hist[hist["ti"] == ti]
            cnt = np.zeros(n_bins, dtype=np.int64)
            if len(sub):
                np.add.at(
                    cnt, sub["bin"].to_numpy(), sub["cnt"].to_numpy()
                )
            cum = np.cumsum(cnt)
            total = int(cum[-1]) if len(cum) else 0
            k = t["k"]
            b = int(np.searchsorted(cum, k + 1, side="left"))
            if b >= n_bins:  # numeric edge: rank beyond counted rows
                t["value"] = t["hi"]
                continue
            e = edges[key]
            new_lo, new_hi = float(e[b]), float(e[b + 1])
            in_bin = int(cnt[b])
            t["k"] = k - (int(cum[b - 1]) if b > 0 else 0)
            t["lo"], t["hi"], t["count"] = new_lo, new_hi, in_bin
            if new_lo == new_hi or in_bin <= 1:
                t["value"] = new_lo
            elif in_bin <= collect_threshold:
                # exact pick: pull just this bin's values
                def pick(tab: pa.Table, gg=key[0], lo=new_lo, hi=new_hi):
                    v = _column_values(tab, value_col)
                    ok2 = ~np.isnan(v)
                    if by:
                        gv = tab.column(by).to_numpy(zero_copy_only=False)
                        ok2 &= gv == gg
                    sel = v[ok2 & (v >= lo) & (v <= hi)]
                    return pa.table({"v": pa.array(sel, pa.float64())})

                vals = (
                    slim.map_batches(pick, batch_format="pyarrow")
                    .to_pandas()["v"]
                    .to_numpy()
                )
                kk = min(t["k"], len(vals) - 1)
                t["value"] = float(np.partition(vals, kk)[kk])

    for t in unresolved().values():  # max_passes exhausted: bin midpoint
        t["value"] = t["lo"]

    rows = []
    for (g, q), (r, k1, k2) in ranks.items():
        v1 = targets[(g, k1)]["value"]
        v2 = targets[(g, k2)]["value"]
        frac = r - k1
        rows.append((g, q, float(v1 + (v2 - v1) * frac)))
    out = pd.DataFrame(rows, columns=[by or "group", "q", "value"])
    return out.sort_values([by or "group", "q"]).reset_index(drop=True)
