"""Carry-forward joins: re-attach a previous run's cluster ids (or sector
tags) to a new load by identity-key lookup — the reference's post-processing
scripts (/root/reference/post_processing/carry_fwd_clusters_old_filers.py,
carry_fwd_sector.py, old_cluster_id.py) re-expressed as a broadcast join:
the previous run's (identity_key -> value) map is ``ray.put`` once and read
inside each task — no shuffle (SURVEY.md §2.9)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def identity_key(
    t: pa.Table, fields: tuple[str, ...]
) -> pa.Array:
    """Concatenated lowered identity fields ('name|street|city|...') —
    the reference joins on name+address equality."""
    cols = []
    for f in fields:
        c = t.column(f)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(pc.coalesce(pc.utf8_lower(c.cast(pa.string())), ""))
    return pc.binary_join_element_wise(*cols, "|")


def carry_forward(
    new_records: "ray.data.Dataset",
    previous: "ray.data.Dataset",
    key_fields: tuple[str, ...],
    carry_column: str,
    out_column: str | None = None,
) -> "ray.data.Dataset":
    """Attach ``carry_column`` from ``previous`` to ``new_records`` where the
    identity key matches (null where absent).

    ``previous`` must be the small side (a prior run's entity map); it is
    collected and broadcast once.  For two large sides use a bucketed
    groupby join instead (stages/canonical.py shows the pattern)."""
    out_column = out_column or carry_column
    prev_tbl = pa.Table.from_pandas(previous.to_pandas(), preserve_index=False)
    keys = identity_key(prev_tbl, key_fields).to_pylist()
    values = prev_tbl.column(carry_column).to_pylist()
    # first match wins, matching the reference's one-row-per-key lookups
    lookup: dict = {}
    for k, v in zip(keys, values):
        lookup.setdefault(k, v)
    lookup_ref = ray.put(lookup)

    def attach(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        ks = identity_key(t, key_fields).to_pylist()
        return t.append_column(
            out_column, pa.array([lk.get(k) for k in ks])
        )

    return new_records.map_batches(attach, batch_format="pyarrow")


def carry_forward_large(
    new_records: "ray.data.Dataset",
    previous: "ray.data.Dataset",
    key_fields: tuple[str, ...],
    carry_column: str,
    out_column: str | None = None,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """The both-large carry-forward: at full scale a previous run's entity
    map is corpus-sized, so the (identity_key -> value) side joins by
    bucketed groupby co-location (stages/joins.bucketed_join) instead of a
    driver collect + broadcast.  Duplicate previous keys resolve to the MIN
    carried value (deterministic under any partitioning — the broadcast
    variant's first-seen rule depends on row order)."""
    import pandas as pd

    from ..functions.hashing import hash64_str
    from .joins import bucketed_join

    out_column = out_column or carry_column

    def kv(t: pa.Table) -> pa.Table:
        import numpy as np

        key = identity_key(t, key_fields)
        h = hash64_str(key)
        return pa.table(
            {
                "_ckey": key,
                "_cval": t.column(carry_column),
                "_bucket": pa.array((h % np.uint64(n_buckets)).astype("int64")),
            }
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("_ckey", as_index=False)["_cval"].min()
        )

    prev_kv = (
        previous.map_batches(kv, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(dedup, batch_format="pandas")
    )

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("_ckey", identity_key(t, key_fields))

    joined = bucketed_join(
        new_records.map_batches(add_key, batch_format="pyarrow"),
        prev_kv,
        on="_ckey",
        how="left",
        n_buckets=n_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_ckey"])
        names = ["%s" % (out_column if c == "_cval" else c) for c in t.column_names]
        return t.rename_columns(names)

    return joined.map_batches(finish, batch_format="pyarrow")
