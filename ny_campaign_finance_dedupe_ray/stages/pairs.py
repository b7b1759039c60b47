"""Candidate-pair generation: the block-key self-join.

Reference semantics (/root/reference/dedupe_extension/dedupe/dedupe/
api.py:222-254 sqlite join; campaign_finance_dedupe.py:297-316 Postgres):
within-block all-pairs with ``id_a < id_b``, globally deduplicated — the
``pairs()`` contract guarantees each pair at most once (api.py:197-205),
which MUST hold or clustering double-counts edges (SURVEY.md §7 hard parts).

Physical shape: hash-bucket co-location.  A bare
``groupby(block_key).map_groups`` dispatches a Python call per tiny group
(millions of them at scale); instead rows are bucketed by
``hash(block_key) % n_buckets`` and ONE ``map_groups`` task per bucket does
the per-block combination work vectorized in pandas/numpy.  The same
pattern dedups pairs by ``hash(pair) % n_buckets``.  ``n_buckets`` is the
shuffle parallelism knob — size it ~2-4x total cores.

Block sizes are bounded upstream by the hot-key cap (stages/blocking.py), so
a block emits at most cap*(cap-1)/2 pairs and no bucket task sees a runaway
group.  Payload columns (_a/_b suffixed) ride along so scoring needs no
join back to the record table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64_str

PAIR_SEP = "\x1f"  # unit separator: cannot appear in urls


def _add_bucket(t: pa.Table, col: str, n_buckets: int) -> pa.Table:
    h = hash64_str(t.column(col).combine_chunks() if isinstance(t.column(col), pa.ChunkedArray) else t.column(col))
    bucket = (h % np.uint64(n_buckets)).astype(np.int64)
    return t.append_column("bucket", pa.array(bucket))


def _hash_block_key(t: pa.Table, n_buckets: int) -> pa.Table:
    """Replace the block_key string with its 64-bit hash before the shuffle:
    the sort/exchange then moves 8-byte ints instead of ~20-60 byte strings,
    and the in-bucket grouping sorts ints (collision odds at 64 bits are
    negligible against the pair-dedup backstop downstream)."""
    col = t.column("block_key")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash64_str(col)
    t = t.drop_columns(["block_key"])
    t = t.append_column("block_key", pa.array(h.astype(np.int64)))
    return t.append_column(
        "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
    )


def _empty_pairs(g: pd.DataFrame, payload: list[str]) -> pd.DataFrame:
    """Typed empty pair frame inheriting the input dtypes: empty
    object-dtype Series trip Ray's block-size estimator (np.vectorize on
    size-0 input logs an error per column) and pollute the union's block
    schema — keep the ids/payload dtypes the non-empty buckets will have."""
    idt = g["record_id"].dtype
    data = {
        "id_a": pd.Series([], dtype=idt),
        "id_b": pd.Series([], dtype=idt),
    }
    for c in payload:
        for s in ("_a", "_b"):
            data[c + s] = pd.Series([], dtype=g[c].dtype)
    return pd.DataFrame(data)


def _pairs_in_bucket(g: pd.DataFrame, max_block_size: int | None) -> pd.DataFrame:
    """All rows of one key-hash bucket -> within-block pairs, fully
    vectorized: one numpy pass per distinct group SIZE (<= cap sizes), no
    per-key Python/pandas loop (a bucket holds ~10^5 tiny groups at scale;
    per-group dispatch would dominate).

    Because the bucket key is hash(block_key), every row of a block key is
    in exactly one bucket — so per-key counts here are globally exact, and
    the hot-key cap (keys with more than ``max_block_size`` records are
    dropped, the stop-word analogue of canopy_index.py:20-31) is applied in
    the same pass with no separate counting shuffle."""
    payload = [c for c in g.columns if c not in ("block_key", "record_id", "bucket")]
    cols = ["id_a", "id_b"] + [c + s for c in payload for s in ("_a", "_b")]
    g = g.drop_duplicates(["block_key", "record_id"])
    g = g.sort_values(["block_key", "record_id"], kind="mergesort")
    keys = g["block_key"].to_numpy()
    if len(keys) == 0:
        return _empty_pairs(g, payload)
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    valid = counts >= 2
    if max_block_size is not None:
        valid &= counts <= max_block_size
        from ..state.counters import add_dropped

        add_dropped("hot_block_keys", int((counts > max_block_size).sum()))
        add_dropped(
            "hot_block_rows", int(counts[counts > max_block_size].sum())
        )
    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    for s in np.unique(counts[valid]):
        st = starts[valid & (counts == s)]
        la, lb = np.triu_indices(int(s), k=1)
        ia_parts.append((st[:, None] + la[None, :]).ravel())
        ib_parts.append((st[:, None] + lb[None, :]).ravel())
    if not ia_parts:
        return _empty_pairs(g, payload)
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    rid = g["record_id"].to_numpy()
    out = {"id_a": rid[ia], "id_b": rid[ib]}
    for c in payload:
        v = g[c].to_numpy()
        out[c + "_a"] = v[ia]
        out[c + "_b"] = v[ib]
    return pd.DataFrame(out)


def _dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
    return g.drop_duplicates("pair_key").drop(columns=["bucket"])


def candidate_pairs(
    blocks: "ray.data.Dataset",
    n_buckets: int = 64,
    max_block_size: int | None = 200,
) -> "ray.data.Dataset":
    """BLOCKS(+payload) -> unique PAIRS(+payload_a/_b), id_a < id_b.

    Two bucketed shuffles: (1) key-hash buckets for combinations with the
    hot-key cap applied in-bucket, (2) pair-hash buckets for the
    at-most-once contract (idempotent under task retries)."""
    from ..state.counters import enable_counters

    if ray.is_initialized():
        enable_counters()  # dropped-work caps below are counted, not silent
    bucketed = blocks.map_batches(
        _hash_block_key, fn_kwargs={"n_buckets": n_buckets},
        batch_format="pyarrow",
    )
    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: _pairs_in_bucket(g, max_block_size), batch_format="pandas"
    )

    def add_pair_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pk = pc.binary_join_element_wise(
            t.column("id_a"), t.column("id_b"), PAIR_SEP
        )
        t = t.append_column("pair_key", pk)
        return _add_bucket(t, "pair_key", n_buckets)

    keyed = pairs.map_batches(add_pair_key, batch_format="pyarrow")
    deduped = keyed.groupby("bucket").map_groups(
        _dedup_bucket, batch_format="pandas"
    )
    return deduped.drop_columns(["pair_key"])


def attach_payload(
    pairs: "ray.data.Dataset",
    records: "ray.data.Dataset",
    columns: tuple[str, ...],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Join payload columns onto slim (id_a, id_b) pairs via two bucketed
    groupbys (record side, then pair side) — no broadcast, both sides can
    be arbitrarily large.

    Use with payload-free blocking when keys-per-record x payload-bytes is
    large: a duplicate pair is emitted once per shared block key, so
    carrying payload through the pair-dedup shuffle multiplies it by the
    duplication factor (16 LSH bands of near-identical documents => 16x).
    Slim rows through dedup + this join move ~6x fewer bytes."""

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a = t.column("id_a").cast(pa.string())
        b = t.column("id_b").cast(pa.string())
        pk = pc.binary_join_element_wise(a, b, PAIR_SEP)
        if isinstance(pk, pa.ChunkedArray):
            pk = pk.combine_chunks()
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        n = t.num_rows
        cols = {
            "record_id": pa.concat_arrays([a, b]),
            "pair_key": pa.concat_arrays([pk, pk]),
            "side": pa.array(["a"] * n + ["b"] * n, pa.string()),
        }
        for c in columns:
            cols[c] = pa.array([None] * (2 * n), pa.string())
        return pa.table(cols)

    def tag_records(t: pa.Table) -> pa.Table:
        cols = {
            "record_id": t.column("record_id").cast(pa.string()),
            "pair_key": pa.array([None] * t.num_rows, pa.string()),
            "side": pa.array([None] * t.num_rows, pa.string()),
        }
        for c in columns:
            cols[c] = t.column(c).cast(pa.string())
        return pa.table(cols)

    def bucket(t: pa.Table, col: str) -> pa.Table:
        c = t.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        h = hash64_str(c)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    unioned = (
        pairs.map_batches(explode, batch_format="pyarrow")
        .union(records.map_batches(tag_records, batch_format="pyarrow"))
        .map_batches(lambda t: bucket(t, "record_id"), batch_format="pyarrow")
    )

    def send_payload(g: pd.DataFrame) -> pd.DataFrame:
        payload = g[g["pair_key"].isna()].drop_duplicates("record_id")
        requests = g[g["pair_key"].notna()][["record_id", "pair_key", "side"]]
        out = requests.merge(
            payload[["record_id", *columns]], on="record_id", how="left"
        )
        return out[["pair_key", "side", *columns]]

    routed = unioned.groupby("bucket").map_groups(
        send_payload, batch_format="pandas"
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b"] + [c + s for c in columns for s in ("_a", "_b")]
        a = (
            g[g["side"] == "a"].drop_duplicates("pair_key")
            .set_index("pair_key")[list(columns)].add_suffix("_a")
        )
        b = (
            g[g["side"] == "b"].drop_duplicates("pair_key")
            .set_index("pair_key")[list(columns)].add_suffix("_b")
        )
        out = a.join(b, how="outer").reset_index()
        if out.empty:
            return pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
        ids = out["pair_key"].str.split(PAIR_SEP, n=1, expand=True)
        out["id_a"] = ids[0]
        out["id_b"] = ids[1]
        return out[cols]

    return (
        routed.map_batches(lambda t: bucket(t, "pair_key"), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(assemble, batch_format="pandas")
    )


def _link_pairs_in_bucket(
    g: pd.DataFrame, max_block_size: int | None
) -> pd.DataFrame:
    """Record-link variant: within each block key, the cross product of
    side-'a' rows x side-'b' rows (reference api.py:332-402 — two blocking
    maps joined on key, no id ordering)."""
    payload = [
        c for c in g.columns
        if c not in ("block_key", "record_id", "bucket", "side")
    ]
    cols = ["id_a", "id_b"] + [c + s for c in payload for s in ("_a", "_b")]
    g = g.drop_duplicates(["block_key", "record_id", "side"])
    # side 'a' sorts before 'b': within each key the a-rows are a contiguous
    # prefix, so a key is (start, n_a, n_b) and the A x B cross product is an
    # index-grid gather per distinct (n_a, n_b) SIZE CLASS — one numpy pass
    # per class, no per-key Python dispatch (a bucket holds ~10^5 tiny keys
    # at scale; mirrors the Dedupe kernel _pairs_in_bucket above).
    g = g.sort_values(["block_key", "side", "record_id"], kind="mergesort")
    keys = g["block_key"].to_numpy()
    if len(keys) == 0:
        return _empty_pairs(g, payload)
    _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
    is_a = g["side"].to_numpy() == "a"
    csum = np.concatenate([[0], np.cumsum(is_a)])
    na = csum[starts + counts] - csum[starts]
    nb = counts - na
    valid = (na > 0) & (nb > 0)
    if max_block_size is not None:
        over = (na > 0) & (nb > 0) & (na * nb > max_block_size ** 2)
        valid &= ~over
        from ..state.counters import add_dropped

        add_dropped("hot_link_blocks", int(over.sum()))
        add_dropped("hot_link_rows", int(counts[over].sum()))
    st = starts[valid]
    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    if len(st):
        sizes = np.stack([na[valid], nb[valid]], axis=1)
        classes, inv = np.unique(sizes, axis=0, return_inverse=True)
        for ci, (ca, cb) in enumerate(classes):
            s = st[inv == ci]
            la = np.repeat(np.arange(ca), cb)
            lb = np.tile(np.arange(cb), ca) + ca  # b-rows start after the a-prefix
            ia_parts.append((s[:, None] + la[None, :]).ravel())
            ib_parts.append((s[:, None] + lb[None, :]).ravel())
    if not ia_parts:
        return _empty_pairs(g, payload)
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    rid = g["record_id"].to_numpy()
    out = {"id_a": rid[ia], "id_b": rid[ib]}
    for c in payload:
        v = g[c].to_numpy()
        out[c + "_a"] = v[ia]
        out[c + "_b"] = v[ib]
    return pd.DataFrame(out)


def candidate_pairs_link(
    blocks_a: "ray.data.Dataset",
    blocks_b: "ray.data.Dataset",
    n_buckets: int = 64,
    max_block_size: int | None = 200,
) -> "ray.data.Dataset":
    """Record linkage across two datasets: blocks from each side are tagged
    and unioned; pairs are the per-key A x B cross product, deduplicated on
    (id_a, id_b) — each pair at most once (api.py:197-205 contract)."""
    from ..state.counters import enable_counters

    if ray.is_initialized():
        enable_counters()  # dropped-work caps below are counted, not silent

    def tag(side: str):
        def _t(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.string())
            )

        return _t

    unioned = blocks_a.map_batches(tag("a"), batch_format="pyarrow").union(
        blocks_b.map_batches(tag("b"), batch_format="pyarrow")
    )
    bucketed = unioned.map_batches(
        _hash_block_key, fn_kwargs={"n_buckets": n_buckets},
        batch_format="pyarrow",
    )
    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: _link_pairs_in_bucket(g, max_block_size),
        batch_format="pandas",
    )

    def add_pair_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pk = pc.binary_join_element_wise(
            t.column("id_a").cast(pa.string()),
            t.column("id_b").cast(pa.string()),
            PAIR_SEP,
        )
        t = t.append_column("pair_key", pk)
        return _add_bucket(t, "pair_key", n_buckets)

    keyed = pairs.map_batches(add_pair_key, batch_format="pyarrow")
    return keyed.groupby("bucket").map_groups(
        _dedup_bucket, batch_format="pandas"
    ).drop_columns(["pair_key"])
