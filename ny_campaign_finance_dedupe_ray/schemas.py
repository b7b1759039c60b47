"""Arrow schemas for every inter-stage table.

The input shape is fixed by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Inter-stage schemas mirror the reference's relational tables
(blocking_map / scored pairs / entity_map — see
/root/reference/dedupe_extension/campaign_finance_dedupe.py:241-242,287-289 and
/root/reference/dedupe_extension/dedupe/dedupe/core.py:153-157).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input: Common-Crawl-style web pages.
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Normalized entity fields extracted from a page (the `processed_donors`
# analogue, /root/reference/data_load/init_postgres_db.py:477-489).
RECORDS = pa.schema(
    [
        pa.field("record_id", pa.string()),  # = url
        pa.field("name", pa.string()),
        pa.field("street", pa.string()),
        pa.field("city", pa.string()),
        pa.field("state", pa.string()),
        pa.field("zip", pa.string()),
        pa.field("text_norm", pa.string()),
    ]
)

# Blocking inverted index (`blocking_map`): one row per (key, record).
BLOCKS = pa.schema(
    [
        pa.field("block_key", pa.string()),
        pa.field("record_id", pa.string()),
    ]
)

# Candidate pairs after the block-key shuffle; contract: each pair appears
# at most once and id_a < id_b (reference dedupe/api.py:197-254).
PAIRS = pa.schema(
    [
        pa.field("id_a", pa.string()),
        pa.field("id_b", pa.string()),
    ]
)

# Scored pairs — the structured-ndarray analogue (core.py:153-157).
SCORES = pa.schema(
    [
        pa.field("id_a", pa.string()),
        pa.field("id_b", pa.string()),
        pa.field("score", pa.float32()),
    ]
)

# Output cluster assignment (`entity_map`,
# campaign_finance_dedupe.py:287-289): canon id := min member id.
CLUSTERS = pa.schema(
    [
        pa.field("record_id", pa.string()),
        pa.field("cluster_id", pa.string()),
        pa.field("cluster_score", pa.float32()),
    ]
)

# Ground-truth labeled pairs for pairwise-F1 evaluation (FIXTURES.md §2).
LABELS = pa.schema(
    [
        pa.field("url_a", pa.string()),
        pa.field("url_b", pa.string()),
        pa.field("is_match", pa.bool_()),
    ]
)
