"""Blocking stage: RECORDS -> (block_key, record_id, payload...) flat-map.

The map side of the block-key shuffle (reference blocking driver:
/root/reference/dedupe_extension/dedupe/dedupe/blocking.py:48-104 producing
the ``blocking_map`` table, campaign_finance_dedupe.py:241-268).

Differences by design (SURVEY.md §2.3):
- stateful canopy / tf-idf index predicates are replaced by *stateless*
  MinHash/LSH band keys over text shingles plus normalized-url host keys —
  same recall contract, no corpus-wide index, parallel-reproducible;
- hot keys are bounded by a frequency cap — the stop-word analogue of the
  reference's df > max(1000, 0.05*N) cutoff (canopy_index.py:20-31) — via a
  partial-count pre-pass + broadcast drop-set (no full-row shuffle).

Payload columns ride along with each key row so candidate-pair generation
needs NO join back to the record table (at 10^12 rows a pairs<->records join
would be a second full shuffle; the payload is a few short normalized
strings).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions import hashing as H
from ..functions import predicates as P


@dataclass
class BlockingConfig:
    """Which keys to emit per record."""

    # wrapper predicates applied per row (FieldPredicate/CompoundPredicate)
    predicates: list = field(default_factory=list)
    # vectorized MinHash/LSH over this column (None disables)
    minhash_column: str | None = "text_norm"
    minhash_k: int = 5
    minhash_perms: int = 128
    minhash_bands: int = 16
    # emit a host block key from record_id when it is a url
    host_key: bool = False
    # payload columns carried through to pair generation
    payload_columns: tuple[str, ...] = ("name", "street", "city", "state", "zip", "text_norm")
    # stop-word analogue: drop keys whose global frequency exceeds this
    max_block_size: int = 200


def default_config() -> BlockingConfig:
    """Flagship predicate set: cheap high-recall name/street keys + LSH.

    Mirrors the *shape* of a learned reference predicate set (3-5 compound
    predicates, matching_evaluation/match_runs.csv) without the training
    loop — the engine ships fixed blocking keys per SURVEY.md §2.8."""
    return BlockingConfig(
        predicates=[
            P.CompoundPredicate(
                P.StringPredicate(P.first_token, "name"),
                P.StringPredicate(P.first_integer, "street"),
            ),
            P.CompoundPredicate(
                P.StringPredicate(P.sorted_acronym, "name"),
                P.StringPredicate(P.same_three_char_start, "city"),
            ),
            P.StringPredicate(P.same_five_char_start, "name"),
            P.FieldPredicate(P.whole_field, "zip"),
        ],
    )


def doc_config() -> BlockingConfig:
    """Blocking for free-text document pages: MinHash/LSH bands over the
    normalized text only (no profile-field predicates), compact payload."""
    return BlockingConfig(
        predicates=[],
        minhash_column="text_norm",
        payload_columns=("text_norm",),
        host_key=False,
    )


def _block_batch(batch: pa.Table, cfg: BlockingConfig) -> pa.Table:
    import pyarrow.compute as pc

    n = batch.num_rows
    idx_parts: list[np.ndarray] = []
    key_parts: list[pa.Array] = []

    # 1) predicates: Arrow-kernel path per batch where the predicate has a
    # vectorized kernel (functions/predicates.VECTOR_KERNELS); remaining
    # predicates fall back to the per-row loop (short normalized fields)
    slow_preds: list[tuple[int, object]] = []
    for pi, pred in enumerate(cfg.predicates):
        vk = pred.vector_keys(batch) if hasattr(pred, "vector_keys") else None
        if vk is not None:
            valid = pc.is_valid(vk).to_numpy(zero_copy_only=False)
            rows = np.flatnonzero(valid)
            if len(rows):
                idx_parts.append(rows)
                key_parts.append(
                    pc.binary_join_element_wise(
                        vk.drop_null(), pa.scalar(str(pi)), ":"
                    )
                )
            continue
        mk = (
            pred.vector_multi_keys(batch)
            if hasattr(pred, "vector_multi_keys")
            else None
        )
        if mk is not None:
            rows, vals = mk
            if len(rows):
                idx_parts.append(rows)
                key_parts.append(
                    pc.binary_join_element_wise(
                        pa.array(vals, pa.string()), pa.scalar(str(pi)), ":"
                    )
                )
            continue
        slow_preds.append((pi, pred))

    if slow_preds:
        fields_needed = sorted(
            {p.field for _, p in slow_preds if hasattr(p, "field")}
            | {
                m.field
                for _, p in slow_preds
                if isinstance(p, P.CompoundPredicate)
                for m in p.predicates
            }
        )
        cols = {
            f: batch.column(f).to_pylist()
            for f in fields_needed
            if f in batch.column_names
        }
        s_keys: list[str] = []
        s_rows: list[int] = []
        for i in range(n):
            rec = {f: v[i] for f, v in cols.items()}
            for pi, pred in slow_preds:
                for k in pred(rec):
                    s_keys.append("%s:%d" % (k, pi))
                    s_rows.append(i)
        if s_rows:
            idx_parts.append(np.asarray(s_rows, dtype=np.int64))
            key_parts.append(pa.array(s_keys, pa.string()))

    # 2) vectorized MinHash band keys
    if cfg.minhash_column and cfg.minhash_column in batch.column_names:
        col = batch.column(cfg.minhash_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h, splits = H.shingle_hashes(col, k=cfg.minhash_k)
        sigs = H.minhash(h, splits, n_perm=cfg.minhash_perms)
        rows, keys = H.lsh_band_keys(sigs, n_bands=cfg.minhash_bands)
        if len(rows):
            idx_parts.append(rows.astype(np.int64))
            key_parts.append(pa.array([str(k) for k in keys], pa.string()))

    # 3) host key from the url-shaped record_id — vectorized netloc extract
    # (RE2 kernel; urlparse-parity fuzzed in tests, incl. the stdlib's
    # unsafe-byte removal and leading C0/space strip)
    if cfg.host_key:
        rid_col = batch.column("record_id").cast(pa.string())
        if isinstance(rid_col, pa.ChunkedArray):
            rid_col = rid_col.combine_chunks()
        cleaned = pc.replace_substring_regex(
            rid_col.fill_null(""), pattern="[\\t\\n\\r]", replacement=""
        )
        cleaned = pc.replace_substring_regex(
            cleaned, pattern="^[\\x00-\\x20]+|[\\x00-\\x20]+$", replacement=""
        )
        m = pc.extract_regex(
            cleaned,
            pattern=r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//(?P<host>[^/?#]*)",
        )
        hosts = pc.struct_field(m, "host")
        # urlparse RAISES on mismatched brackets ('http://[bad/x',
        # 'http://ex]ample.com/') and on non-IPv6 bracketed hosts — the
        # old scalar path skipped those rows. Parity rule: any bracket in
        # the netloc -> no host key (valid bracketed-IPv6 hosts are also
        # skipped; documented narrowing, they are vanishingly rare in web
        # corpora and a host key is a recall aid, not a correctness gate)
        ok = pc.fill_null(
            pc.and_kleene(
                pc.and_kleene(pc.is_valid(hosts), pc.not_equal(hosts, "")),
                pc.invert(pc.match_substring_regex(hosts, r"[\[\]]")),
            ),
            False,
        ).to_numpy(zero_copy_only=False).astype(bool)
        if ok.any():
            rows = np.flatnonzero(ok)
            keys = pc.binary_join_element_wise(
                pa.array(["host"] * len(rows), pa.string()),
                hosts.take(pa.array(rows)),
                ":",
            )
            idx_parts.append(rows.astype(np.int64))
            key_parts.append(keys)

    if idx_parts:
        idx = np.concatenate(idx_parts)
        keys_arr = pa.concat_arrays(
            [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
             for k in key_parts]
        )
    else:
        idx = np.empty(0, dtype=np.int64)
        keys_arr = pa.array([], pa.string())
    take_idx = pa.array(idx)
    cols_out: dict[str, pa.Array] = {
        "block_key": keys_arr,
        "record_id": batch.column("record_id").cast(pa.string()).take(take_idx),
    }
    payload = [c for c in cfg.payload_columns if c in batch.column_names]
    if payload:
        taken = batch.select(payload).take(take_idx)
        for name_ in payload:
            cols_out[name_] = taken.column(name_)
    return pa.table(cols_out)


def block_records(
    records: "ray.data.Dataset",
    cfg: BlockingConfig | None = None,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """RECORDS -> BLOCKS(+payload) flat-map (one row -> N key rows)."""
    cfg = cfg or default_config()
    return records.map_batches(
        _block_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def hot_keys(
    blocks: "ray.data.Dataset", max_block_size: int
) -> set[str]:
    """Keys whose global frequency exceeds ``max_block_size``.

    Pre-aggregates counts per batch (one row per distinct key per batch)
    before the groupby, so the shuffle carries key partials, not key rows —
    then filters to the (small) over-cap set on the driver.  This is the
    frequency-capped-blocking-key pass of SURVEY.md §4."""

    def partial_counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: F401

        vc = t.column("block_key").value_counts()
        return pa.table(
            {
                "block_key": vc.field("values"),
                "partial": vc.field("counts"),
            }
        )

    partials = blocks.select_columns(["block_key"]).map_batches(
        partial_counts, batch_format="pyarrow"
    )
    from ray.data.aggregate import Sum

    counts = partials.groupby("block_key").aggregate(Sum("partial", alias_name="n"))
    over = counts.filter(
        expr=f"n > {int(max_block_size)}"
    )
    df = over.to_pandas()
    if "block_key" not in df.columns:  # empty result loses schema
        return set()
    from ..state.counters import add_dropped

    add_dropped("hot_keys_filtered", len(df))
    add_dropped("hot_keys_filtered_rows", int(df["n"].sum()))
    return set(df["block_key"].tolist())


def drop_hot_keys(
    blocks: "ray.data.Dataset", hot: set[str]
) -> "ray.data.Dataset":
    """Filter out over-cap keys via a broadcast set (ray.put once, read per
    task — never re-shipped per batch)."""
    if not hot:
        return blocks
    hot_ref = ray.put(pa.array(sorted(hot), pa.string()))

    def _filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hs = ray.get(hot_ref)
        mask = pc.invert(pc.is_in(t.column("block_key"), value_set=hs))
        return t.filter(mask)

    return blocks.map_batches(_filter, batch_format="pyarrow")
