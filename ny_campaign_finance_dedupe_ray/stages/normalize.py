"""Normalization stage: extracted pages -> RECORDS (the `processed_donors`
analogue, /root/reference/data_load/init_postgres_db.py:477-489).

Stateless vectorized ``map_batches`` over Arrow batches; drops every wide
column except the compact normalized fields that downstream blocking/scoring
need (project early)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions import textnorm


def _normalize_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("extracted_text")
    fields = textnorm.parse_profile_fields(text)
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "record_id": batch.column("url"),
    }
    cols.update(fields)
    cols["text_norm"] = textnorm.lower_trim_null(
        textnorm.strip_punctuation(text)
    )
    return pa.table(cols)


def normalize_records(
    pages_extracted: "ray.data.Dataset", batch_size: int = 8192
) -> "ray.data.Dataset":
    """(url, extracted_text, ...) -> RECORDS(record_id, name, street, city,
    state, zip, text_norm)."""
    return pages_extracted.map_batches(
        _normalize_batch, batch_format="pyarrow", batch_size=batch_size
    )


def filter_person_records(
    records: "ray.data.Dataset",
    person: bool = True,
    person_column: str = "person",
    name_column: str = "name",
    exclude_substring: str = "unitem",
) -> "ray.data.Dataset":
    """The matching-input row filter: ``person = 1`` (or ``!= 1``) AND
    ``name NOT LIKE '%unitem%'``
    (/root/reference/dedupe_extension/campaign_finance_dedupe.py:154-159),
    vectorized as an Arrow mask inside map_batches."""
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        flag = t.column(person_column)
        mask = pc.equal(flag, 1) if person else pc.not_equal(flag, 1)
        name = pc.coalesce(t.column(name_column), "")
        mask = pc.and_(
            mask, pc.invert(pc.match_substring(name, exclude_substring))
        )
        return t.filter(mask)

    return records.map_batches(keep, batch_format="pyarrow")
