"""Determinism of the synthetic fixture generators (FIXTURES.md §6)."""

from __future__ import annotations

from ny_campaign_finance_dedupe_ray import synth


def test_generate_deterministic():
    a = synth.generate(n_entities=50, seed=7)
    b = synth.generate(n_entities=50, seed=7)
    for k in ("pages", "labels", "entities"):
        assert a[k].equals(b[k]), k


def test_generate_shapes():
    t = synth.generate(n_entities=50, seed=7)
    pages = t["pages"]
    assert pages.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert pages.num_rows >= 50
    urls = pages.column("url").to_pylist()
    assert len(set(urls)) == len(urls)
    lab = t["labels"].to_pandas()
    assert (lab["url_a"] < lab["url_b"]).all()
    assert lab["is_match"].sum() > 0 and (~lab["is_match"]).sum() > 0


def test_pages_from_documents():
    tbl = synth.pages_from_documents("/root/testdata/sf0.001")
    assert tbl.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert tbl.num_rows == 500
    tbl2 = synth.pages_from_documents("/root/testdata/sf0.001")
    assert tbl.equals(tbl2)
