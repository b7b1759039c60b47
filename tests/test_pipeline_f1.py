"""End-to-end flagship pipeline: pairwise F1 >= 0.99 on the labeled fixture
(the BASELINE.json gate), plus determinism across parallelism."""

from __future__ import annotations

import ray.data as rd

from ny_campaign_finance_dedupe_ray.pipelines.dedupe_pages import dedupe_pages
from ny_campaign_finance_dedupe_ray.pipelines.evaluate import (
    cluster_shape_metrics,
    pairwise_prf,
)


def test_flagship_f1(fixture_tables):
    pages = fixture_tables["pages"]
    clusters = dedupe_pages(rd.from_arrow(pages).repartition(8)).to_pandas()
    assert len(clusters) == pages.num_rows  # every record assigned exactly once
    assert clusters["record_id"].is_unique
    m = pairwise_prf(clusters, fixture_tables["labels"].to_pandas())
    assert m["f1"] >= 0.99, m
    shape = cluster_shape_metrics(clusters)
    assert shape["total_records"] == pages.num_rows
    assert shape["biggest_cluster_size"] <= 20


def test_flagship_deterministic_across_partitioning(fixture_tables):
    pages = fixture_tables["pages"]
    a = dedupe_pages(rd.from_arrow(pages).repartition(2)).to_pandas()
    b = dedupe_pages(rd.from_arrow(pages).repartition(13)).to_pandas()
    a = a.sort_values("record_id").reset_index(drop=True)
    b = b.sort_values("record_id").reset_index(drop=True)
    assert (a["cluster_id"].to_numpy() == b["cluster_id"].to_numpy()).all()


def test_affine_gap_f1(fixture_tables):
    # VERDICT r1 #3: flagship run with the reference's comparator space
    # (affine gap per string field) must hit the same F1 gate.
    from ny_campaign_finance_dedupe_ray.state.model import affine_model

    pages = fixture_tables["pages"]
    clusters = dedupe_pages(
        rd.from_arrow(pages).repartition(8), model=affine_model()
    ).to_pandas()
    m = pairwise_prf(clusters, fixture_tables["labels"].to_pandas())
    assert m["f1"] >= 0.99, m


def test_flagship_empty_and_single_row(fixture_tables):
    import pyarrow as pa

    pages = fixture_tables["pages"]
    out0 = dedupe_pages(rd.from_arrow(pages.slice(0, 0))).to_pandas()
    assert len(out0) == 0
    out1 = dedupe_pages(rd.from_arrow(pages.slice(0, 1))).to_pandas()
    assert len(out1) == 1
    assert out1["cluster_id"].iloc[0] == out1["record_id"].iloc[0]
    assert out1["cluster_score"].iloc[0] == 1.0
