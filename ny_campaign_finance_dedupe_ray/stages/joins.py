"""Generic both-large join as bucketed groupby co-location.

The reference's joins are Postgres SQL (entity_map ⨝ donors ⨝ contributions,
/root/reference/dedupe_extension/campaign_finance_dedupe.py:369-398); the
engine's small-side joins broadcast (ray.put) and its pair/payload joins use
the two-hop pattern in stages/pairs.attach_payload.  This module is the
general case: BOTH sides large, co-located by ``hash(key) % n_buckets`` and
merged vectorized per bucket — one shuffle per side, no driver
materialization, no broadcast.

Ray 2.49 does ship an experimental ``Dataset.join`` (hash-join aggregator
actors); this engine keeps the groupby formulation because aggregator
actors reserve CPUs outside the task pool and starve concurrent actor-pool
stages under a fixed CPU budget (the same scheduling conflict that rules
out ShuffleStrategy.HASH_SHUFFLE here — see bench.py note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import hash64_str


def bucketed_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    how: str = "inner",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Join two Datasets on column ``on`` (same name both sides; other
    column names must not collide).  how: 'inner', 'left', 'right' or
    'outer'.

    NULL keys follow SQL equi-join semantics: they never match anything.
    Null-key rows are dropped for sides an inner join would drop, and kept
    as unmatched rows on the preserved side(s) of left/right/outer joins.
    Column dtypes are preserved end-to-end (a final cast undoes pandas'
    NaN-driven int->float widening on null-filled columns)."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError("how must be 'inner', 'left', 'right' or 'outer'")

    def _pa_type(t) -> pa.DataType:
        # pandas-block datasets report numpy dtypes / python classes in
        # schema().types; normalize to Arrow (object/str columns -> string)
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            return pa.string()

    l_schema = left.schema()
    r_schema = right.schema()
    l_types = {n: _pa_type(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type(t) for n, t in zip(r_schema.names, r_schema.types)}
    l_cols = [c for c in l_schema.names if c != on]
    r_cols = [c for c in r_schema.names if c != on]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")

    def tag(side: str, other_cols: list[str], other_types: dict,
            keep_nulls: bool):
        def _t(t: pa.Table) -> pa.Table:
            if not keep_nulls:
                # SQL: null keys never match — drop early, before the shuffle
                t = t.filter(pc.is_valid(t.column(on)))
            cols = {on: t.column(on), "_side": pa.array([side] * t.num_rows)}
            for c in t.column_names:
                if c != on:
                    cols[c] = t.column(c)
            for c in other_cols:  # typed null placeholders for the other side
                cols[c] = pa.nulls(t.num_rows, type=other_types[c])
            key = t.column(on)
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
            h = hash64_str(key.cast(pa.string()).fill_null(""))
            cols["_bucket"] = pa.array((h % np.uint64(n_buckets)).astype(np.int64))
            return pa.table(cols)

        return _t

    # align column order across both sides so union block schemas agree
    ordered = [on, "_side", *l_cols, *r_cols, "_bucket"]

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(ordered)

    keep_l_nulls = how in ("left", "outer")
    keep_r_nulls = how in ("right", "outer")
    unioned = (
        left.map_batches(
            tag("l", r_cols, r_types, keep_l_nulls), batch_format="pyarrow"
        )
        .map_batches(reorder, batch_format="pyarrow")
        .union(
            right.map_batches(
                tag("r", l_cols, l_types, keep_r_nulls), batch_format="pyarrow"
            ).map_batches(reorder, batch_format="pyarrow")
        )
    )

    out_cols = [on, *l_cols, *r_cols]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lt = g[g["_side"] == "l"][[on, *l_cols]]
        rt = g[g["_side"] == "r"][[on, *r_cols]]
        # null keys must not match each other (pandas merge matches NaN to
        # NaN): split them out, merge the clean parts, append unmatched
        l_null = lt[lt[on].isna()]
        r_null = rt[rt[on].isna()]
        parts = [lt[lt[on].notna()].merge(rt[rt[on].notna()], on=on, how=how)]
        if keep_l_nulls and len(l_null):
            parts.append(l_null.reindex(columns=out_cols))
        if keep_r_nulls and len(r_null):
            parts.append(r_null.reindex(columns=out_cols))
        return pd.concat(parts, ignore_index=True)[out_cols]

    out_types = {on: l_types[on]}
    out_types.update({c: l_types[c] for c in l_cols})
    out_types.update({c: r_types[c] for c in r_cols})

    def cast_back(t: pa.Table) -> pa.Table:
        # pandas widens null-filled int columns to float; non-null values
        # stay exactly integral, so the cast back to the source Arrow type
        # is lossless
        cols = {}
        for c in out_cols:
            col = t.column(c)
            if col.type != out_types[c]:
                col = col.cast(out_types[c])
            cols[c] = col
        return pa.table(cols)

    return (
        unioned.groupby("_bucket")
        .map_groups(merge, batch_format="pandas")
        .map_batches(cast_back, batch_format="pyarrow")
    )


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on_key: str,
    on_ts: str,
    n_buckets: int = 64,
    allow_exact_matches: bool = False,
) -> "ray.data.Dataset":
    """As-of join: each left row picks the right row with the greatest
    ``on_ts`` strictly below (or equal, with ``allow_exact_matches``) its
    own, per ``on_key`` — the operator Ray Data lacks natively, expressed
    as key-hash co-location + one vectorized ``pd.merge_asof`` per bucket.
    Partitioning assumption: all rows of a key land in one bucket (hash
    co-location), so per-bucket backward search is globally correct.
    Unmatched left rows keep nulls (left-join semantics)."""
    l_schema, r_schema = left.schema(), right.schema()

    def _pa_type(t) -> pa.DataType:
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError, ValueError):
            return pa.string()

    l_types = {n: _pa_type(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type(t) for n, t in zip(r_schema.names, r_schema.types)}
    shared = (on_key, on_ts)
    l_cols = [c for c in l_schema.names if c not in shared]
    r_cols = [c for c in r_schema.names if c not in shared]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")

    def tag(side: str, other_cols: list[str], other_types: dict):
        def _t(t: pa.Table) -> pa.Table:
            cols = {
                on_key: t.column(on_key),
                on_ts: t.column(on_ts),
                "_side": pa.array([side] * t.num_rows),
            }
            for c in t.column_names:
                if c not in shared:
                    cols[c] = t.column(c)
            for c in other_cols:
                cols[c] = pa.nulls(t.num_rows, type=other_types[c])
            key = t.column(on_key)
            if isinstance(key, pa.ChunkedArray):
                key = key.combine_chunks()
            h = hash64_str(key.cast(pa.string()))
            cols["_bucket"] = pa.array((h % np.uint64(n_buckets)).astype(np.int64))
            return pa.table(cols)

        return _t

    ordered = [on_key, on_ts, "_side", *l_cols, *r_cols, "_bucket"]

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(ordered)

    unioned = (
        left.map_batches(tag("l", r_cols, r_types), batch_format="pyarrow")
        .map_batches(reorder, batch_format="pyarrow")
        .union(
            right.map_batches(tag("r", l_cols, l_types), batch_format="pyarrow")
            .map_batches(reorder, batch_format="pyarrow")
        )
    )

    out_cols = [on_key, on_ts, *l_cols, *r_cols]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lt = g[g["_side"] == "l"][[on_key, on_ts, *l_cols]]
        rt = g[g["_side"] == "r"][[on_key, on_ts, *r_cols]]
        # SQL semantics for nulls: a null key or timestamp never matches.
        # Right-side rows with nulls can never be picked; left-side rows
        # with nulls stay (left-join) but unmatched — and merge_asof rejects
        # nulls in its keys, so both are split out rather than merged.
        l_null = lt[lt[on_key].isna() | lt[on_ts].isna()]
        lt = lt[lt[on_key].notna() & lt[on_ts].notna()].sort_values(
            on_ts, kind="mergesort"
        )
        rt = rt[rt[on_key].notna() & rt[on_ts].notna()].sort_values(
            on_ts, kind="mergesort"
        )
        out = pd.merge_asof(
            lt,
            rt,
            on=on_ts,
            by=on_key,
            direction="backward",
            allow_exact_matches=allow_exact_matches,
        )
        if len(l_null):
            out = pd.concat(
                [out[out_cols], l_null.reindex(columns=out_cols)],
                ignore_index=True,
            )
        return out[out_cols]

    return unioned.groupby("_bucket").map_groups(merge, batch_format="pandas")


def _pa_type_of(t) -> pa.DataType:
    """Normalize a Dataset.schema() type (Arrow type, numpy dtype or python
    class from a pandas-block dataset) to an Arrow DataType."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        return pa.string()


def _intlike(t: pa.DataType) -> bool:
    return pa.types.is_temporal(t) or pa.types.is_integer(t)


def _int64able(t: pa.DataType) -> bool:
    # uint64 keys above 2^63 can't view as int64 — use the float path
    return _intlike(t) and not (
        pa.types.is_integer(t) and t.bit_width == 64
        and not pa.types.is_signed_integer(t)
    )


def _num_extract(col, int_mode: bool) -> tuple[np.ndarray, np.ndarray]:
    """(values in the join's numeric dtype, valid mask) — exact int64 for
    temporal/integer keys in int_mode, float64 otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = col.is_valid().to_numpy(zero_copy_only=False)
    if int_mode:
        v = (
            col.cast(pa.int64())
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return v, valid
    if pa.types.is_temporal(col.type):
        col = col.cast(pa.int64())
    v = np.asarray(
        col.cast(pa.float64()).to_numpy(zero_copy_only=False),
        dtype=np.float64,
    )
    return v, valid & ~np.isnan(v)


def _placeholder(n: int, typ: pa.DataType):
    """Other-side placeholder column: zero-fill int/temporal types so
    pandas keeps the exact dtype through the groupby (these rows belong to
    the other side and are never read); a null-smeared int64 becomes
    float64 and corrupts values above 2^53.  Types Arrow can't cast 0 into
    (date32/time32) fall back to nulls."""
    if _intlike(typ):
        try:
            return pc.fill_null(pa.nulls(n, typ), pa.scalar(0).cast(typ))
        except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
            return pa.nulls(n, typ)
    return pa.nulls(n, typ)


def _value_domain(left, value_col, value_type, int_mode, domain, n_tiles):
    """(f_lo, f_width): float64 tile origin/width over the left values.
    Tiling always runs in float64 — int64 differences can WRAP for
    full-range domains (e.g. signed hash keys spanning > 2^62). Float
    tiling is still exactly correct: int64 -> float64 rounding and the
    (x - lo) / w pipeline are monotone non-decreasing, so lo <= v <= hi
    (compared exactly in int64 in the tile kernel) implies
    tile(lo) <= tile(v) <= tile(hi) and the match is always found in the
    left row's tile."""
    num_dtype = np.int64 if int_mode else np.float64
    if domain is None:
        from ray.data.aggregate import Max, Min

        agg = left.aggregate(Min(value_col), Max(value_col))
        vals = (
            None
            if agg is None
            else (agg.get(f"min({value_col})"), agg.get(f"max({value_col})"))
        )
        if vals is None or vals[0] is None or vals[1] is None:
            # empty (or all-null) left side: any domain works, no matches
            d_lo, d_hi = num_dtype(0), num_dtype(1)
        else:
            dom = pa.array(list(vals))
            if dom.type != value_type:
                # pa.array infers ns-resolution for Timestamp scalars; the
                # epoch UNIT must match the column's own int64 view
                dom = dom.cast(value_type)
            arr, _ = _num_extract(dom, int_mode)
            d_lo, d_hi = arr[0], arr[1]
    else:
        d_lo, d_hi = num_dtype(domain[0]), num_dtype(domain[1])
    f_lo = float(d_lo)
    f_width = max((float(d_hi) - f_lo) / n_tiles, 1e-300)
    return f_lo, f_width


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    value_col: str,
    lo_col: str,
    hi_col: str,
    n_tiles: int = 64,
    domain: tuple | None = None,
) -> "ray.data.Dataset":
    """Interval-containment join — the third operator Ray Data lacks
    natively (with as-of and windowed aggregates): every left row paired
    with every right interval where ``lo <= value <= hi`` (SQL BETWEEN;
    null values/bounds never match).

    Physical shape: the value domain (min/max of the left values, or an
    explicit ``domain``) is split into ``n_tiles`` tiles.  A left row
    lands in exactly ONE tile; a right interval is replicated to every
    tile it overlaps, so each match is found exactly once (in the left
    row's tile) with no pair dedup.  Per tile the kernel sorts left
    values once and turns every interval into a CONTIGUOUS index range
    via two searchsorted calls — O((L+R)·log L + output) per tile, no
    L×R materialization, no per-interval Python loop.

    The scale knob is interval replication: an interval spanning the
    whole domain costs n_tiles copies (span/tile_width + 1 in general).
    Size n_tiles to ~2-4x cores for parallelism; wide-interval workloads
    want coarser tiles.

    Numerics: when value/lo/hi are all temporal or integer the whole
    join (tiling AND containment) runs in exact int64 arithmetic — a
    timestamp[ns] key never rounds through float64; mixed/float keys use
    float64.  Other-side placeholder columns are zero-filled (not null)
    for integer/temporal types so pandas keeps their exact dtype through
    the tile groupby (a null-smeared int64 becomes float64 and corrupts
    values above 2^53); genuine nulls in the INPUT's own integer columns
    still take the float64 round-trip and are restored to null — KNOWN
    LIMIT: the non-null values of such a nulls-containing integer column
    lose precision above 2^53 in that round-trip (use a null-free id
    column, or a string id, for full-range 64-bit keys).

    Output: left columns + right columns (name collisions raise).
    """
    l_schema, r_schema = left.schema(), right.schema()
    l_types = {n: _pa_type_of(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type_of(t) for n, t in zip(r_schema.names, r_schema.types)}
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")

    int_mode = all(
        _int64able(typ)
        for typ in (l_types[value_col], r_types[lo_col], r_types[hi_col])
    )
    num_dtype = np.int64 if int_mode else np.float64

    def _num(col) -> tuple[np.ndarray, np.ndarray]:
        return _num_extract(col, int_mode)

    f_lo, f_width = _value_domain(
        left, value_col, l_types[value_col], int_mode, domain, n_tiles
    )

    def tag_left(t: pa.Table) -> pa.Table:
        v, valid = _num(t.column(value_col))
        t = t.filter(pa.array(valid))
        v = v[valid]
        tile = np.clip(
            (v.astype(np.float64) - f_lo) // f_width, 0, n_tiles - 1
        ).astype(np.int64)
        zeros = np.zeros(t.num_rows, dtype=num_dtype)
        cols = {
            "_side": pa.array(["l"] * t.num_rows, pa.string()),
            "_tile": pa.array(tile),
            "_v": pa.array(v),
            "_lo": pa.array(zeros),
            "_hi": pa.array(zeros),
        }
        for c in l_cols:
            cols[c] = t.column(c)
        for c in r_cols:
            cols[c] = _placeholder(t.num_rows, r_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        lo, lo_ok = _num(t.column(lo_col))
        hi, hi_ok = _num(t.column(hi_col))
        keep = lo_ok & hi_ok & (lo <= hi)
        t = t.filter(pa.array(keep))
        lo, hi = lo[keep], hi[keep]
        t0 = np.clip(
            (lo.astype(np.float64) - f_lo) // f_width, 0, n_tiles - 1
        ).astype(np.int64)
        t1 = np.clip(
            (hi.astype(np.float64) - f_lo) // f_width, 0, n_tiles - 1
        ).astype(np.int64)
        counts = t1 - t0 + 1  # t1 >= t0 by monotonicity (lo <= hi)
        from ..functions.hashing import _ranges

        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        tile = np.repeat(t0, counts) + _ranges(counts)
        rep = t.take(pa.array(idx))
        cols = {
            "_side": pa.array(["r"] * rep.num_rows, pa.string()),
            "_tile": pa.array(tile),
            "_v": pa.array(np.zeros(rep.num_rows, dtype=num_dtype)),
            "_lo": pa.array(lo[idx]),
            "_hi": pa.array(hi[idx]),
        }
        for c in l_cols:
            cols[c] = _placeholder(rep.num_rows, l_types[c])
        for c in r_cols:
            cols[c] = rep.column(c)
        return pa.table(cols)

    ordered = ["_side", "_tile", "_v", "_lo", "_hi", *l_cols, *r_cols]

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(ordered)

    unioned = (
        left.map_batches(tag_left, batch_format="pyarrow")
        .map_batches(reorder, batch_format="pyarrow")
        .union(
            right.map_batches(tag_right, batch_format="pyarrow")
            .map_batches(reorder, batch_format="pyarrow")
        )
    )
    out_cols = [*l_cols, *r_cols]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import _ranges

        lt = g[g["_side"] == "l"]
        rt = g[g["_side"] == "r"]
        if lt.empty or rt.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=g[c].dtype) for c in out_cols}
            )
        v = lt["_v"].to_numpy()
        order = np.argsort(v, kind="stable")
        vs = v[order]
        starts = np.searchsorted(vs, rt["_lo"].to_numpy(), side="left")
        ends = np.searchsorted(vs, rt["_hi"].to_numpy(), side="right")
        counts = np.maximum(ends - starts, 0)
        ridx = np.repeat(np.arange(len(rt), dtype=np.int64), counts)
        lidx = order[np.repeat(starts, counts) + _ranges(counts)]
        out = {}
        for c in l_cols:
            out[c] = lt[c].to_numpy()[lidx]
        for c in r_cols:
            out[c] = rt[c].to_numpy()[ridx]
        return pd.DataFrame(out)

    merged = unioned.groupby("_tile").map_groups(merge, batch_format="pandas")

    def cast_back(t: pa.Table) -> pa.Table:
        types = {**l_types, **r_types}
        cols = {}
        for c in out_cols:
            col = t.column(c)
            if col.type != types[c]:
                if pa.types.is_floating(col.type) and _intlike(types[c]):
                    # genuine input nulls took the pandas float round-trip
                    # as NaN — restore null before the integer cast
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    col = pc.if_else(
                        pc.is_nan(col), pa.scalar(None, col.type), col
                    )
                col = col.cast(types[c])
            cols[c] = col
        return pa.table(cols)

    return merged.map_batches(cast_back, batch_format="pyarrow")


def range_join_count(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    value_col: str,
    lo_col: str,
    hi_col: str,
    count_by: str | list[str] | None = None,
    count_name: str = "n",
    n_tiles: int = 64,
    domain: tuple | None = None,
) -> "ray.data.Dataset":
    """Aggregate-pushdown form of :func:`range_join`: per right interval
    (grouped by the right-side ``count_by`` columns), COUNT the left rows
    with ``lo <= value <= hi`` — without ever materializing the joined
    pairs.  Equivalent SQL::

        SELECT count_by, COUNT(*) AS n
        FROM left JOIN right ON left.value BETWEEN right.lo AND right.hi
        GROUP BY count_by

    (inner-join semantics: groups whose total count is zero are dropped,
    null values/bounds never match; a NULL in ``count_by`` is a normal
    group key, as in SQL GROUP BY).

    Why it exists: counting over a containment join is the most common
    range-join use, and composing the generic ``range_join`` with a
    ``groupby().count()`` materializes O(|left| x avg-overlap) rows just to
    count them — at wide-interval workloads that is |L| x |R|.  Here the
    per-tile kernel's two searchsorted calls already yield each interval's
    match count (``ends - starts``) BEFORE any row explosion, so the
    shuffle after the tile stage carries only ~|right| x replication
    partial-count rows (one per interval replica), then a small
    groupby-sum.  Same tiling, same exact-int64 containment arithmetic,
    same exactly-once guarantee (a left row lives in exactly one tile) as
    ``range_join``.

    ``count_by=None`` counts per distinct interval identity — only valid
    when the right side has no payload columns beyond lo/hi; pass explicit
    ``count_by`` columns otherwise.  Output: ``count_by`` columns (their
    input types preserved) + ``count_name`` (int64).
    """
    if count_by is None:
        by_cols: list[str] = []
    elif isinstance(count_by, str):
        by_cols = [count_by]
    else:
        by_cols = list(count_by)

    l_schema, r_schema = left.schema(), right.schema()
    l_types = {n: _pa_type_of(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type_of(t) for n, t in zip(r_schema.names, r_schema.types)}
    missing = [c for c in by_cols if c not in r_types]
    if missing:
        raise ValueError(f"count_by columns not on the right side: {missing}")
    if not by_cols:
        extra = [c for c in r_schema.names if c not in (lo_col, hi_col)]
        if extra:
            raise ValueError(
                "count_by=None requires a right side with only lo/hi "
                f"columns; found payload columns {extra} — pass count_by"
            )
    reserved = {"_side", "_tile", "_v", "_lo", "_hi", "_partial", count_name}
    bad = reserved & set(by_cols)
    if bad:
        raise ValueError(f"count_by collides with internal names: {sorted(bad)}")

    int_mode = all(
        _int64able(typ)
        for typ in (l_types[value_col], r_types[lo_col], r_types[hi_col])
    )
    num_dtype = np.int64 if int_mode else np.float64
    f_lo, f_width = _value_domain(
        left, value_col, l_types[value_col], int_mode, domain, n_tiles
    )

    def tag_left(t: pa.Table) -> pa.Table:
        # the slim win over range_join: left ships ONLY (_tile, _v)
        v, valid = _num_extract(t.column(value_col), int_mode)
        v = v[valid]
        tile = np.clip(
            (v.astype(np.float64) - f_lo) // f_width, 0, n_tiles - 1
        ).astype(np.int64)
        n = len(v)
        cols = {
            "_side": pa.array(["l"] * n, pa.string()),
            "_tile": pa.array(tile),
            "_v": pa.array(v),
            "_lo": pa.array(np.zeros(n, dtype=num_dtype)),
            "_hi": pa.array(np.zeros(n, dtype=num_dtype)),
        }
        for c in by_cols:
            cols[c] = _placeholder(n, r_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        lo, lo_ok = _num_extract(t.column(lo_col), int_mode)
        hi, hi_ok = _num_extract(t.column(hi_col), int_mode)
        keep = lo_ok & hi_ok & (lo <= hi)
        t = t.filter(pa.array(keep))
        lo, hi = lo[keep], hi[keep]
        t0 = np.clip(
            (lo.astype(np.float64) - f_lo) // f_width, 0, n_tiles - 1
        ).astype(np.int64)
        t1 = np.clip(
            (hi.astype(np.float64) - f_lo) // f_width, 0, n_tiles - 1
        ).astype(np.int64)
        counts = t1 - t0 + 1  # t1 >= t0 by monotonicity (lo <= hi)
        from ..functions.hashing import _ranges

        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        tile = np.repeat(t0, counts) + _ranges(counts)
        rep = t.take(pa.array(idx))
        cols = {
            "_side": pa.array(["r"] * rep.num_rows, pa.string()),
            "_tile": pa.array(tile),
            "_v": pa.array(np.zeros(rep.num_rows, dtype=num_dtype)),
            "_lo": pa.array(lo[idx]),
            "_hi": pa.array(hi[idx]),
        }
        for c in by_cols:
            cols[c] = rep.column(c)
        return pa.table(cols)

    ordered = ["_side", "_tile", "_v", "_lo", "_hi", *by_cols]

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(ordered)

    unioned = (
        left.select_columns([value_col])
        .map_batches(tag_left, batch_format="pyarrow")
        .map_batches(reorder, batch_format="pyarrow")
        .union(
            right.select_columns([lo_col, hi_col, *by_cols])
            .map_batches(tag_right, batch_format="pyarrow")
            .map_batches(reorder, batch_format="pyarrow")
        )
    )

    def _empty_parts() -> pa.Table:
        cols = {"_key_str": pa.array([], pa.string())}
        for c in by_cols:
            cols[c] = pa.array([], r_types[c])
        cols["_partial"] = pa.array([], pa.int64())
        return pa.table(cols)

    def partials(g: pa.Table) -> pa.Table:
        # ends - starts IS the per-interval match count in this tile — the
        # count the generic range_join only reaches after np.repeat.
        # All-Arrow (no pandas round-trip), so count_by columns keep exact
        # types — incl. nullable int64 above 2^53.  Locally combined per
        # count_by key (dictionary-encode + bincount: one row per key per
        # tile); keyed for the final shuffle by a sentinel-filled STRING
        # (a genuinely-null typed key would crash Ray's sort-based shuffle).
        side = g.column("_side")
        rt = g.filter(pc.equal(side, "r"))
        if rt.num_rows == 0:
            return _empty_parts()
        lv = g.filter(pc.equal(side, "l")).column("_v")
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        if len(lv) == 0:
            partial = np.zeros(rt.num_rows, dtype=np.int64)
        else:
            vs = np.sort(lv.to_numpy(zero_copy_only=False), kind="stable")
            lo = rt.column("_lo").to_numpy(zero_copy_only=False)
            hi = rt.column("_hi").to_numpy(zero_copy_only=False)
            starts = np.searchsorted(vs, lo, side="left")
            ends = np.searchsorted(vs, hi, side="right")
            partial = np.maximum(ends - starts, 0).astype(np.int64)
        parts_str = [
            rt.column(c).cast(pa.string()).fill_null("\x00null")
            for c in by_cols
        ] or [pa.array([""] * rt.num_rows, pa.string())]
        kstr = parts_str[0]
        for p in parts_str[1:]:
            kstr = pc.binary_join_element_wise(kstr, p, "\x1f")
        if isinstance(kstr, pa.ChunkedArray):
            kstr = kstr.combine_chunks()
        enc = kstr.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(enc.dictionary)
        sums = np.bincount(codes, weights=partial, minlength=m)
        uniq, first_idx = np.unique(codes, return_index=True)
        take = pa.array(first_idx[np.argsort(uniq)], pa.int64())
        cols = {"_key_str": enc.dictionary}
        for c in by_cols:
            cols[c] = rt.column(c).take(take)
        # partial counts are < |left| per tile: exact in float64, safe cast
        cols["_partial"] = pa.array(sums.astype(np.int64))
        return pa.table(cols)

    parts = unioned.groupby("_tile").map_groups(partials, batch_format="pyarrow")

    if not by_cols:
        # no grouping: one global count — a tiny driver-side sum
        from ray.data.aggregate import Sum

        total = parts.aggregate(Sum("_partial"))
        n = 0 if total is None else int(total.get("sum(_partial)") or 0)
        import ray.data as rd

        table = pa.table({count_name: pa.array([n], pa.int64())})
        return rd.from_arrow(table if n > 0 else table.slice(0, 0))

    def sum_partials(g: pa.Table) -> pa.Table:
        n = pc.sum(g.column("_partial")).as_py() or 0
        head = g.slice(0, 1 if n > 0 else 0)  # inner-join: zero-match drops
        cols = {c: head.column(c) for c in by_cols}
        cols[count_name] = pa.array([np.int64(n)][: head.num_rows], pa.int64())
        return pa.table(cols)

    return parts.groupby("_key_str").map_groups(
        sum_partials, batch_format="pyarrow"
    )
