"""HTML → text extraction as a stateless zero-copy Arrow ``map_batches`` stage.

The extractor is a pure deterministic function of the ``html`` bytes (never of
batch boundaries or parallelism), so the per-row invariant
"byte-identical extracted text per url" (BASELINE.json ``input_hint``) holds
at any ``num_cpus`` / block size.  It inverts ``synth.render_html`` exactly:
text is the contents of the first ``<p>…</p>`` element.

Scale notes: the wide ``html`` binary column is dropped immediately after
extraction (project early — SURVEY.md §7 "hard parts"); run with
``batch_format='pyarrow'`` so bytes are never copied into Python objects
except in the one decode loop, which is O(bytes) with compiled ``bytes.find``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_P_OPEN = b"<p>"
_P_CLOSE = b"</p>"


def extract_html(html: bytes | None) -> str:
    """Pure function: first <p>…</p> payload, utf-8 decoded; '' if absent."""
    if html is None:
        return ""
    i = html.find(_P_OPEN)
    if i < 0:
        return ""
    j = html.find(_P_CLOSE, i + len(_P_OPEN))
    if j < 0:
        return ""
    return html[i + len(_P_OPEN): j].decode("utf-8", errors="replace")


def _extract_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    html = batch.column("html")
    try:
        # vectorized fast path: RE2 leftmost lazy match == first
        # bytes.find('<p>') then first following '</p>' (verified identical
        # incl. nested '<p>' inside the payload); whole batch stays in
        # Arrow buffers — zero per-row Python boxing
        s = html.cast(pa.string())
        m = pc.extract_regex(s, pattern=r"(?s)<p>(?P<t>.*?)</p>")
        out = pc.struct_field(m, "t").fill_null("")
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
    except pa.ArrowInvalid:
        # batch contains non-utf8 html: per-row fallback decodes with
        # errors='replace' — keeps the "pure function of the bytes" invariant
        out = pa.array(
            [extract_html(v) for v in html.to_pylist()],
            type=pa.string(),
        )
    cols = {name: batch.column(name) for name in batch.column_names if name != "html"}
    cols["extracted_text"] = out
    return pa.table(cols)


def extract_text(
    pages: "ray.data.Dataset",
    batch_size: int = 2048,
) -> "ray.data.Dataset":
    """pages(url, warc_ts, html, text, lang) -> same minus html, plus
    ``extracted_text``.  Small batch_size because ``html`` rows are wide."""
    return pages.map_batches(
        _extract_batch, batch_format="pyarrow", batch_size=batch_size
    )
