"""Exact distributed quantiles WITHOUT a full sort.

A sort-based quantile moves every row through an all-to-all exchange; at
corpus scale that is the single most expensive way to learn one number.
This module finds exact order statistics by iterative histogram
refinement instead: each pass is ONE streaming ``map_batches`` scan that
emits a tiny per-(target, bin) count vector, the driver narrows each
target's value interval to the bin containing its rank, and once a bin
holds few enough rows they are collected (one batched scan per pass for
ALL resolved targets) and the exact value picked.  log_B(range) passes
(2-4 in practice) of O(bytes-scanned), zero shuffle, nothing
corpus-sized on the driver.

``quantile_cont`` semantics (DuckDB / numpy 'linear'): for quantile q
over n non-null values, rank r = (n-1)·q, and the result interpolates
the floor(r)-th and ceil(r)-th order statistics (0-indexed).  Null keys
form their own group (SQL GROUP BY), null/NaN values are excluded (SQL
aggregate semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_NULL_KEY = "\x00null"


def _column_values(t: pa.Table, col: str) -> np.ndarray:
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.cast(pa.float64()).to_numpy(zero_copy_only=False)


def _key_strings(t: pa.Table, by: str | None) -> np.ndarray:
    """Sentinel-filled string view of the group key (null keys group
    together without feeding NaN into groupbys or comparisons)."""
    if by is None:
        return np.full(t.num_rows, "_all_", dtype=object)
    k = t.column(by).cast(pa.string()).fill_null(_NULL_KEY)
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    return k.to_numpy(zero_copy_only=False)


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
    row per (group, q); groups with zero non-null values are omitted,
    null keys form their own group (key None in the output).

    Scale shape: the number of passes is bounded (float64 range / bins),
    each pass streams the dataset once and reduces to
    O(groups × targets × n_bins) ints on the driver, plus one batched
    collect scan per pass for every target whose bin shrank below
    ``collect_threshold`` rows.  The driver state is proportional to
    groups × len(qs) — use a pre-aggregation for high-cardinality ``by``
    columns (documented limit, not a silent cap: > 10_000 groups raises,
    and exhausting ``max_passes`` raises instead of returning an
    approximation).
    """
    cols = [value_col] + ([by] if by else [])
    slim = ds.select_columns(cols).materialize()

    # pass 0: per-group (count, min, max) + the original key value per
    # sentinel string (restored in the output)
    def stats(t: pa.Table) -> pa.Table:
        v = _column_values(t, value_col)
        ok = ~np.isnan(v)
        g = _key_strings(t, by)
        df = pd.DataFrame({"g": g[ok], "v": v[ok]})
        agg = df.groupby("g")["v"].agg(["size", "min", "max"]).reset_index()
        return pa.table(
            {
                "g": pa.array(agg["g"].to_numpy(), pa.string()),
                "n": pa.array(agg["size"].to_numpy().astype(np.int64)),
                "lo": pa.array(agg["min"].to_numpy().astype(np.float64)),
                "hi": pa.array(agg["max"].to_numpy().astype(np.float64)),
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
    orig_key: dict[str, object] = {}
    if by:
        # map sentinel strings back to one original key value per group
        def key_sample(t: pa.Table) -> pa.Table:
            g = _key_strings(t, by)
            df = pd.DataFrame({"g": g, "orig": t.column(by).to_pandas()})
            first = df.drop_duplicates("g")
            return pa.table(
                {
                    "g": pa.array(first["g"].to_numpy(), pa.string()),
                    "orig": pa.Array.from_pandas(first["orig"]),
                }
            )

        ks = slim.map_batches(key_sample, batch_format="pyarrow").to_pandas()
        for _, row in ks.drop_duplicates("g").iterrows():
            orig_key[row["g"]] = row["orig"]

    # targets: one per (group, needed order statistic)
    targets: dict = {}  # (g, k) -> dict(lo, hi, k, value)
    ranks: dict = {}  # (g, q) -> (r, k1, k2)
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
                     "k": k, "value": None},
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
        keys = list(live.keys())
        edges = {
            key: np.linspace(live[key]["lo"], live[key]["hi"], n_bins + 1)
            for key in keys
        }

        def histogram(t: pa.Table) -> pa.Table:
            v = _column_values(t, value_col)
            ok = ~np.isnan(v)
            g = _key_strings(t, by)
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
        picks = []  # (key, gg, lo, hi, k_local) to resolve in ONE scan
        for ti, key in enumerate(keys):
            t = live[key]
            sub = hist[hist["ti"] == ti]
            cnt = np.zeros(n_bins, dtype=np.int64)
            if len(sub):
                np.add.at(
                    cnt, sub["bin"].to_numpy(), sub["cnt"].to_numpy()
                )
            cum = np.cumsum(cnt)
            k = t["k"]
            b = int(np.searchsorted(cum, k + 1, side="left"))
            if b >= n_bins:  # numeric edge: rank beyond counted rows
                t["value"] = t["hi"]
                continue
            e = edges[key]
            new_lo, new_hi = float(e[b]), float(e[b + 1])
            in_bin = int(cnt[b])
            t["k"] = k - (int(cum[b - 1]) if b > 0 else 0)
            t["lo"], t["hi"] = new_lo, new_hi
            if new_lo == new_hi:
                t["value"] = new_lo
            elif in_bin <= collect_threshold:
                # resolve exactly: pull this bin's actual values (a
                # 1-row bin must ALSO be pulled — its single value is
                # somewhere strictly inside [new_lo, new_hi], not at the
                # bin edge)
                picks.append((key, key[0], new_lo, new_hi, t["k"]))

        if picks:
            pick_specs = [(gg, lo, hi) for _, gg, lo, hi, _ in picks]

            def pick(tab: pa.Table) -> pa.Table:
                v = _column_values(tab, value_col)
                ok2 = ~np.isnan(v)
                g = _key_strings(tab, by)
                out_ti, out_v = [], []
                for ti, (gg, lo, hi) in enumerate(pick_specs):
                    sel = v[ok2 & (g == gg) & (v >= lo) & (v <= hi)]
                    out_ti.extend([ti] * len(sel))
                    out_v.extend(sel.tolist())
                return pa.table(
                    {
                        "ti": pa.array(out_ti, pa.int64()),
                        "v": pa.array(out_v, pa.float64()),
                    }
                )

            got = slim.map_batches(pick, batch_format="pyarrow").to_pandas()
            for ti, (key, _, _, _, k_local) in enumerate(picks):
                vals = got[got["ti"] == ti]["v"].to_numpy()
                if not len(vals):  # numeric edge: empty after narrowing
                    targets[key]["value"] = targets[key]["lo"]
                    continue
                kk = min(k_local, len(vals) - 1)
                targets[key]["value"] = float(np.partition(vals, kk)[kk])

    if unresolved():
        raise RuntimeError(
            f"exact_quantiles did not converge in {max_passes} passes "
            f"({len(unresolved())} targets live) — raise max_passes or "
            "collect_threshold; refusing to return an approximation"
        )

    rows = []
    for (g, q), (r, k1, k2) in ranks.items():
        v1 = targets[(g, k1)]["value"]
        v2 = targets[(g, k2)]["value"]
        frac = r - k1
        key_out = (
            (None if g == _NULL_KEY else orig_key.get(g, g)) if by else g
        )
        rows.append((key_out, q, float(v1 + (v2 - v1) * frac)))
    out = pd.DataFrame(rows, columns=[by or "group", "q", "value"])
    return out.sort_values(
        [by or "group", "q"], na_position="last"
    ).reset_index(drop=True)
