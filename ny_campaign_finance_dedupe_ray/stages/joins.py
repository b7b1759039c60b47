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
    Column dtypes are preserved end-to-end: the per-bucket merge is an
    Arrow hash join (``pa.Table.join``, single-threaded inside the Ray
    task), so null-filled integer columns stay integer — no pandas NaN
    widening, no precision loss on 64-bit values."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError("how must be 'inner', 'left', 'right' or 'outer'")

    l_schema = left.schema()
    r_schema = right.schema()
    l_types = {n: _pa_type_of(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type_of(t) for n, t in zip(r_schema.names, r_schema.types)}
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
    arrow_how = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
    }[how]

    # Arrow's hash join rejects nested (list/struct/map) NON-KEY columns;
    # when any payload column is nested, join (key, row-index) tables only
    # and gather the payloads with take() afterwards — take supports every
    # type, and the outer joins' null indices gather as null rows.
    has_nested = any(
        pa.types.is_nested(tp)
        for c, tp in {**l_types, **r_types}.items()
        if c != on
    )

    def merge(g: pa.Table) -> pa.Table:
        # Arrow hash join per bucket: SQL null semantics built in (null
        # keys never match each other; preserved-side null-key rows stay
        # as unmatched output rows), exact dtypes throughout.
        side = g.column("_side")
        lt = g.filter(pc.equal(side, "l")).select([on, *l_cols])
        rt = g.filter(pc.equal(side, "r")).select([on, *r_cols])
        if not has_nested:
            return lt.join(
                rt, keys=on, join_type=arrow_how, use_threads=False
            ).select(out_cols)
        li = pa.table(
            {on: lt.column(on),
             "_li": pa.array(np.arange(lt.num_rows, dtype=np.int64))}
        )
        ri = pa.table(
            {on: rt.column(on),
             "_ri": pa.array(np.arange(rt.num_rows, dtype=np.int64))}
        )
        j = li.join(ri, keys=on, join_type=arrow_how, use_threads=False)
        cols = {on: j.column(on)}
        for c in l_cols:
            cols[c] = pc.take(lt.column(c), j.column("_li"))
        for c in r_cols:
            cols[c] = pc.take(rt.column(c), j.column("_ri"))
        return pa.table(cols).select(out_cols)

    return unioned.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


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
    as key-hash co-location + one vectorized backward search per bucket
    (all-Arrow: key codes x timestamp ranks form a composite int64 order,
    one ``searchsorted`` resolves every left row, ``Table.take`` gathers
    the right payload — exact dtypes end-to-end, no pandas round-trip).
    Partitioning assumption: all rows of a key land in one bucket (hash
    co-location), so per-bucket backward search is globally correct.
    Unmatched left rows keep nulls (left-join semantics); null keys or
    timestamps never match (right rows with nulls are never picked, left
    rows with nulls stay as unmatched output rows)."""
    l_schema, r_schema = left.schema(), right.schema()
    l_types = {n: _pa_type_of(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type_of(t) for n, t in zip(r_schema.names, r_schema.types)}
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
    ts_int_mode = _int64able(l_types[on_ts]) and _int64able(r_types[on_ts])

    def merge(g: pa.Table) -> pa.Table:
        side = g.column("_side")
        lt = g.filter(pc.equal(side, "l"))
        rt = g.filter(pc.equal(side, "r"))

        # right rows with a null key or timestamp can never be picked
        r_ts_all, r_ts_ok = _num_extract(rt.column(on_ts), ts_int_mode)
        r_ok = rt.column(on_key).is_valid().to_numpy(zero_copy_only=False) & r_ts_ok
        rt = rt.filter(pa.array(r_ok))
        r_ts = r_ts_all[r_ok]

        l_ts, l_ts_ok = _num_extract(lt.column(on_ts), ts_int_mode)
        l_ok = lt.column(on_key).is_valid().to_numpy(zero_copy_only=False) & l_ts_ok

        rpay_cols: dict[str, pa.Array]
        if rt.num_rows == 0 or lt.num_rows == 0:
            rpay_cols = {c: pa.nulls(lt.num_rows, r_types[c]) for c in r_cols}
        else:
            # shared key codes across both sides (string view, like the
            # bucket hash); null keys were masked out above so the fill
            # sentinel never creates a spurious match
            lk = lt.column(on_key).cast(pa.string()).fill_null("")
            rk = rt.column(on_key).cast(pa.string()).fill_null("")
            if isinstance(lk, pa.ChunkedArray):
                lk = lk.combine_chunks()
            if isinstance(rk, pa.ChunkedArray):
                rk = rk.combine_chunks()
            enc = pa.concat_arrays([lk, rk]).dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            l_code, r_code = codes[: lt.num_rows], codes[lt.num_rows:]

            # composite order: key code major, timestamp RANK minor — ranks
            # keep the composite in int64 regardless of ts dtype/scale
            uts = np.unique(np.concatenate([l_ts, r_ts]))
            l_rank = np.searchsorted(uts, l_ts)
            r_rank = np.searchsorted(uts, r_ts)
            m = np.int64(len(uts) + 1)
            order = np.lexsort((r_rank, r_code))
            rcomp = r_code[order] * m + r_rank[order]
            lcomp = l_code * m + l_rank
            side_kw = "right" if allow_exact_matches else "left"
            pos = np.searchsorted(rcomp, lcomp, side=side_kw) - 1
            safe = np.maximum(pos, 0)
            matched = (pos >= 0) & l_ok & (r_code[order][safe] == l_code)
            ridx = order[safe]
            take = pa.array(ridx, pa.int64(), mask=~matched)
            rpay = rt.select(r_cols).take(take) if r_cols else None
            rpay_cols = {c: rpay.column(c) for c in r_cols} if r_cols else {}

        cols = {on_key: lt.column(on_key), on_ts: lt.column(on_ts)}
        for c in l_cols:
            cols[c] = lt.column(c)
        cols.update(rpay_cols)
        return pa.table(cols).select(out_cols)

    return unioned.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


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
    """Other-side placeholder column (typed nulls): these rows belong to
    the other side and are never read; the merge stage is all-Arrow, so
    nulls survive the shuffle without any dtype widening."""
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
    float64.  The per-tile merge is all-Arrow (``Table.take`` gathers),
    so every payload column — including nullable int64 with values above
    2^53 — keeps its exact type and values end-to-end.

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
    out_types = {**l_types, **r_types}

    def merge(g: pa.Table) -> pa.Table:
        from ..functions.hashing import _ranges

        side = g.column("_side")
        lt = g.filter(pc.equal(side, "l"))
        rt = g.filter(pc.equal(side, "r"))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table({c: pa.array([], out_types[c]) for c in out_cols})
        v = lt.column("_v")
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        vs = v[order]
        lo = rt.column("_lo").to_numpy(zero_copy_only=False)
        hi = rt.column("_hi").to_numpy(zero_copy_only=False)
        starts = np.searchsorted(vs, lo, side="left")
        ends = np.searchsorted(vs, hi, side="right")
        counts = np.maximum(ends - starts, 0)
        ridx = pa.array(np.repeat(np.arange(rt.num_rows, dtype=np.int64), counts))
        lidx = pa.array(order[np.repeat(starts, counts) + _ranges(counts)])
        # Arrow take gathers exact types — nullable int64 payloads above
        # 2^53 included — with no float round-trip anywhere
        cols = {}
        ltake = lt.select(l_cols).take(lidx)
        rtake = rt.select(r_cols).take(ridx)
        for c in l_cols:
            cols[c] = ltake.column(c)
        for c in r_cols:
            cols[c] = rtake.column(c)
        return pa.table(cols)

    return unioned.groupby("_tile").map_groups(merge, batch_format="pyarrow")


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
    sum_cols: str | list[str] | None = None,
    min_max: bool = False,
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

    ``sum_cols`` extends the pushdown to SUMs of LEFT numeric columns over
    the same containment predicate: each ``c`` adds an output column
    ``sum_<c>`` (float64) equal to ``COALESCE(SUM(left.c), 0)`` per group.
    Weight semantics differ from SQL SUM in two documented ways: null AND
    NaN weights contribute 0 (their rows still count), where SQL would
    propagate NaN; and ±inf weights RAISE — the per-tile prefix-sum
    (``pre[end] - pre[start]``) would smear inf/NaN into every interval
    sharing the tile, so non-finite weights must be nulled upstream.
    Weights spanning >~15 decimal orders of magnitude within one tile can
    lose small addends to float64 absorption (inherent to any float SUM,
    but order differs from a per-group sum).  Cost model unchanged — an
    interval's sum is two gathers, exactly like the count; no pair set is
    ever materialized.

    ``min_max=True`` adds ``min_<value_col>`` / ``max_<value_col>`` — the
    extremes of the matched left values per group, in the value column's
    ORIGINAL type (timestamps stay timestamps; when the join runs on the
    float64 path — mixed value/bound types or uint64 — the restoration
    round-trips through float64, exact below 2^53 like the rest of that
    path).  Free at the kernel level: with the tile sorted, an interval's
    min/max are ``vs[start]`` and ``vs[end-1]``.  Together with the count,
    AVG/coverage-span queries need no join either.
    """
    if count_by is None:
        by_cols: list[str] = []
    elif isinstance(count_by, str):
        by_cols = [count_by]
    else:
        by_cols = list(count_by)
    if sum_cols is None:
        s_cols: list[str] = []
    elif isinstance(sum_cols, str):
        s_cols = [sum_cols]
    else:
        s_cols = list(sum_cols)

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
    s_missing = [c for c in s_cols if c not in l_types]
    if s_missing:
        raise ValueError(f"sum_cols columns not on the left side: {s_missing}")
    for c in s_cols:
        t = l_types[c]
        if not (_intlike(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)):
            raise ValueError(f"sum_cols column {c!r} is not numeric: {t}")
    # index-based internal names so user column names can never collide
    s_int = [f"_s_{i}" for i in range(len(s_cols))]
    s_part = [f"_ps_{i}" for i in range(len(s_cols))]
    s_out = [f"sum_{c}" for c in s_cols]
    if len(s_cols) != len(set(s_cols)):
        raise ValueError(f"sum_cols has duplicates: {s_cols}")
    mm_out = [f"min_{value_col}", f"max_{value_col}"] if min_max else []
    reserved = {
        "_side", "_tile", "_v", "_lo", "_hi", "_partial", "_key_str",
        "_pmin", "_pmax", count_name, *s_int, *s_part, *s_out, *mm_out,
    }
    bad = reserved & set(by_cols)
    if bad:
        raise ValueError(f"count_by collides with internal names: {sorted(bad)}")
    if count_name in (*s_out, *mm_out):
        raise ValueError(f"count_name {count_name!r} collides with an "
                         "aggregate output name")

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
        # (+ one float64 lane per sum_col)
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
        for name, c in zip(s_int, s_cols):
            w, w_ok = _num_extract(t.column(c), False)
            # null AND NaN -> 0 (w_ok already excludes NaN); ±inf would
            # smear through the tile's prefix sums into unrelated
            # intervals — refuse it rather than corrupt silently
            if np.isinf(w[w_ok]).any():
                raise ValueError(
                    f"sum_cols column {c!r} contains ±inf; the prefix-sum "
                    "pushdown requires finite weights (null them upstream)"
                )
            w = np.where(w_ok, w, 0.0)
            cols[name] = pa.array(w[valid])
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
        for name in s_int:
            cols[name] = pa.array(np.zeros(rep.num_rows, dtype=np.float64))
        for c in by_cols:
            cols[c] = rep.column(c)
        return pa.table(cols)

    ordered = ["_side", "_tile", "_v", "_lo", "_hi", *s_int, *by_cols]

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(ordered)

    unioned = (
        left.select_columns(list(dict.fromkeys([value_col, *s_cols])))
        .map_batches(tag_left, batch_format="pyarrow")
        .map_batches(reorder, batch_format="pyarrow")
        .union(
            right.select_columns([lo_col, hi_col, *by_cols])
            .map_batches(tag_right, batch_format="pyarrow")
            .map_batches(reorder, batch_format="pyarrow")
        )
    )

    num_pa = pa.int64() if int_mode else pa.float64()

    def _empty_parts() -> pa.Table:
        cols = {"_key_str": pa.array([], pa.string())}
        for c in by_cols:
            cols[c] = pa.array([], r_types[c])
        cols["_partial"] = pa.array([], pa.int64())
        for name in s_part:
            cols[name] = pa.array([], pa.float64())
        if min_max:
            cols["_pmin"] = pa.array([], num_pa)
            cols["_pmax"] = pa.array([], num_pa)
        return pa.table(cols)

    def partials(g: pa.Table) -> pa.Table:
        # ends - starts IS the per-interval match count in this tile — the
        # count the generic range_join only reaches after np.repeat; with
        # sum_cols, prefix sums over the value-sorted weights give each
        # interval's SUM as pre[end] - pre[start] at the same cost.
        # All-Arrow (no pandas round-trip), so count_by columns keep exact
        # types — incl. nullable int64 above 2^53.  Locally combined per
        # count_by key (dictionary-encode + bincount: one row per key per
        # tile); keyed for the final shuffle by a sentinel-filled STRING
        # (a genuinely-null typed key would crash Ray's sort-based shuffle).
        side = g.column("_side")
        rt = g.filter(pc.equal(side, "r"))
        if rt.num_rows == 0:
            return _empty_parts()
        lt = g.filter(pc.equal(side, "l"))
        lv = lt.column("_v")
        if isinstance(lv, pa.ChunkedArray):
            lv = lv.combine_chunks()
        if len(lv) == 0:
            partial = np.zeros(rt.num_rows, dtype=np.int64)
            wsums = [np.zeros(rt.num_rows, dtype=np.float64) for _ in s_int]
            hit = np.zeros(rt.num_rows, dtype=bool)
            imins = imaxs = np.zeros(rt.num_rows, dtype=num_dtype)
        else:
            v = lv.to_numpy(zero_copy_only=False)
            order = np.argsort(v, kind="stable")
            vs = v[order]
            lo = rt.column("_lo").to_numpy(zero_copy_only=False)
            hi = rt.column("_hi").to_numpy(zero_copy_only=False)
            starts = np.searchsorted(vs, lo, side="left")
            ends = np.searchsorted(vs, hi, side="right")
            partial = np.maximum(ends - starts, 0).astype(np.int64)
            hit = ends > starts
            wsums = []
            for name in s_int:
                w = lt.column(name).to_numpy(zero_copy_only=False)[order]
                pre = np.concatenate(([0.0], np.cumsum(w, dtype=np.float64)))
                ws = np.where(hit, pre[ends] - pre[starts], 0.0)
                wsums.append(ws)
            if min_max:
                # sorted tile: an interval's extremes are its boundary hits
                imins = vs[np.minimum(starts, len(vs) - 1)]
                imaxs = vs[np.maximum(ends - 1, 0)]
        # Self-delimiting key encoding: each part is "N" (null) or
        # "<len>:<value>", concatenated with no separator — parts with
        # embedded separator bytes or a literal "N"/"3:..." value cannot
        # collide across group boundaries (a plain '\x1f' join would merge
        # ('a\x1f','b') with ('a','\x1fb')).
        def _enc_part(arr):
            s = arr.cast(pa.string())
            ln = pc.utf8_length(s).cast(pa.string())
            return pc.binary_join_element_wise(ln, s, ":").fill_null("N")

        parts_str = [_enc_part(rt.column(c)) for c in by_cols] or [
            pa.array([""] * rt.num_rows, pa.string())
        ]
        kstr = parts_str[0]
        for p in parts_str[1:]:
            kstr = pc.binary_join_element_wise(kstr, p, "")
        if isinstance(kstr, pa.ChunkedArray):
            kstr = kstr.combine_chunks()
        enc = kstr.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        m = len(enc.dictionary)
        sums = np.bincount(codes, weights=partial, minlength=m)
        # dictionary codes are dense 0..m-1 and np.unique returns them
        # sorted, so first_idx is already dictionary-aligned
        _, first_idx = np.unique(codes, return_index=True)
        take = pa.array(first_idx, pa.int64())
        cols = {"_key_str": enc.dictionary}
        for c in by_cols:
            cols[c] = rt.column(c).take(take)
        # partial counts are < |left| per tile: exact in float64, safe cast
        cols["_partial"] = pa.array(sums.astype(np.int64))
        for name, ws in zip(s_part, wsums):
            cols[name] = pa.array(np.bincount(codes, weights=ws, minlength=m))
        if min_max:
            # min/max-by-group over the hit intervals only; groups with no
            # hits in this tile emit null partials (skipped downstream)
            hidx = codes[hit]
            gmin = np.full(m, np.iinfo(np.int64).max if int_mode else np.inf,
                           dtype=num_dtype)
            gmax = np.full(m, np.iinfo(np.int64).min if int_mode else -np.inf,
                           dtype=num_dtype)
            np.minimum.at(gmin, hidx, imins[hit])
            np.maximum.at(gmax, hidx, imaxs[hit])
            ghit = np.bincount(hidx, minlength=m) > 0
            cols["_pmin"] = pa.array(gmin, mask=~ghit)
            cols["_pmax"] = pa.array(gmax, mask=~ghit)
        return pa.table(cols)

    parts = unioned.groupby("_tile").map_groups(partials, batch_format="pyarrow")

    def _mm_final(vmin, vmax, nrows: int) -> dict:
        # back to the value column's ORIGINAL type unconditionally: the
        # int_mode extraction cast temporals/ints to int64 epoch/values;
        # the float path (e.g. temporal values with float bounds, or
        # uint64 keys) round-trips via int64 — exact below 2^53, the
        # float path's documented precision domain
        orig = l_types[value_col]
        out = {}
        for name, val in zip(mm_out, (vmin, vmax)):
            arr = pa.array([val][:nrows], num_pa)
            if not arr.type.equals(orig):
                if pa.types.is_temporal(orig) and not int_mode:
                    arr = arr.cast(pa.int64()).cast(orig)
                else:
                    arr = arr.cast(orig)
            out[name] = arr
        return out

    if not by_cols:
        # no grouping: one global count (+ sums/extremes) — tiny driver agg
        from ray.data.aggregate import Max, Min, Sum

        aggs = [Sum("_partial")] + [Sum(name) for name in s_part]
        if min_max:
            aggs += [Min("_pmin"), Max("_pmax")]
        total = parts.aggregate(*aggs)
        n = 0 if total is None else int(total.get("sum(_partial)") or 0)
        import ray.data as rd

        cols = {count_name: pa.array([n], pa.int64())}
        for name, out in zip(s_part, s_out):
            s = 0.0 if total is None else float(total.get(f"sum({name})") or 0.0)
            cols[out] = pa.array([s], pa.float64())
        if min_max:
            cols.update(_mm_final(
                None if total is None else total.get("min(_pmin)"),
                None if total is None else total.get("max(_pmax)"), 1))
        table = pa.table(cols)
        return rd.from_arrow(table if n > 0 else table.slice(0, 0))

    def sum_partials(g: pa.Table) -> pa.Table:
        n = pc.sum(g.column("_partial")).as_py() or 0
        head = g.slice(0, 1 if n > 0 else 0)  # inner-join: zero-match drops
        cols = {c: head.column(c) for c in by_cols}
        cols[count_name] = pa.array([np.int64(n)][: head.num_rows], pa.int64())
        for name, out in zip(s_part, s_out):
            s = pc.sum(g.column(name)).as_py() or 0.0
            cols[out] = pa.array([float(s)][: head.num_rows], pa.float64())
        if min_max:
            # n > 0 guarantees >= 1 non-null partial; pc.min/max skip nulls
            cols.update(_mm_final(
                pc.min(g.column("_pmin")).as_py(),
                pc.max(g.column("_pmax")).as_py(), head.num_rows))
        return pa.table(cols)

    return parts.groupby("_key_str").map_groups(
        sum_partials, batch_format="pyarrow"
    )
