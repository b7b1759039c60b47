"""Minimum slice: read pages -> extract -> write; byte-identity invariant."""

from __future__ import annotations

import pyarrow.compute as pc
import ray.data as rd

from ny_campaign_finance_dedupe_ray import synth
from ny_campaign_finance_dedupe_ray.stages.extract import extract_html, extract_text


def test_extract_inverts_render():
    html = synth.render_html("title x", "hello | world")
    assert extract_html(html) == "hello | world"
    assert extract_html(b"<html></html>") == ""
    assert extract_html(None) == ""
    assert extract_html(b"<p>unclosed") == ""


def test_extract_byte_identity_invariant(fixture_tables):
    pages = fixture_tables["pages"]
    ds = rd.from_arrow(pages)
    out = extract_text(ds, batch_size=137)  # odd batch size on purpose
    tbl = out.to_pandas()
    orig = pages.to_pandas().set_index("url")
    got = tbl.set_index("url")
    for url in orig.index:
        assert got.loc[url, "extracted_text"] == orig.loc[url, "text"], url
    assert "html" not in tbl.columns


def test_extract_independent_of_partitioning(fixture_tables, tmp_path):
    pages = fixture_tables["pages"]
    a = extract_text(rd.from_arrow(pages).repartition(1)).to_pandas()
    b = extract_text(rd.from_arrow(pages).repartition(7)).to_pandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    assert (a["extracted_text"] == b["extracted_text"]).all()


def test_write_read_roundtrip(fixture_tables, tmp_path):
    pages = fixture_tables["pages"]
    out_dir = str(tmp_path / "pages_out")
    extract_text(rd.from_arrow(pages)).write_parquet(out_dir)
    back = rd.read_parquet(out_dir)
    assert back.count() == pages.num_rows


def test_extract_vectorized_matches_scalar_and_handles_bad_utf8():
    # VERDICT r1 #7: the pc.extract_regex fast path must agree byte-for-byte
    # with the scalar extractor, and non-utf8 batches fall back per-row.
    import pyarrow as pa
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.stages.extract import (
        _extract_batch, extract_html, extract_text,
    )

    payloads = [
        b"<html><p>hello world</p></html>",
        b"no paragraph here",
        None,
        b"<p>unclosed",
        b"<p>a<p>b</p>tail</p>",
        b"",
        "<p>café ☃</p>".encode("utf-8"),
    ]
    t = pa.table({"url": pa.array([f"u{i}" for i in range(len(payloads))]),
                  "html": pa.array(payloads, pa.binary())})
    got = _extract_batch(t).column("extracted_text").to_pylist()
    assert got == [extract_html(v) for v in payloads]

    # invalid utf-8 forces the fallback path; output is still deterministic
    bad = pa.table({"url": pa.array(["b0", "b1"]),
                    "html": pa.array([b"\xff\xfe<p>x</p>", b"<p>ok</p>"], pa.binary())})
    got_bad = _extract_batch(bad).column("extracted_text").to_pylist()
    assert got_bad == [extract_html(b"\xff\xfe<p>x</p>"), "ok"]

    # through the Dataset surface, odd partitioning
    ds = extract_text(rd.from_arrow(t).repartition(3))
    df = ds.to_pandas().sort_values("url")
    assert df["extracted_text"].tolist() == got
