"""Checkpoint manifests: resume skips completed stages, stale inputs refuse."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ny_campaign_finance_dedupe_ray import synth
from ny_campaign_finance_dedupe_ray.pipelines.checkpointed import run_dedupe_checkpointed
from ny_campaign_finance_dedupe_ray.pipelines.evaluate import pairwise_prf
from ny_campaign_finance_dedupe_ray.state.checkpoint import StageCheckpoint


def test_stage_checkpoint_skip_and_stale(tmp_path):
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))

    cp = StageCheckpoint(str(tmp_path), "s1")
    out1 = cp.run(factory, params={"p": 1}, input_fingerprint="f1")
    assert out1.count() == 3 and calls["n"] == 1
    # identical params+input -> skipped
    out2 = cp.run(factory, params={"p": 1}, input_fingerprint="f1")
    assert out2.count() == 3 and calls["n"] == 1
    # changed params -> recompute
    cp.run(factory, params={"p": 2}, input_fingerprint="f1")
    assert calls["n"] == 2
    # changed input fingerprint -> recompute
    cp.run(factory, params={"p": 2}, input_fingerprint="f2")
    assert calls["n"] == 3
    m = cp.manifest()
    assert m["complete"] and m["row_count"] == 3 and m["stage"] == "s1"


def test_checkpointed_pipeline_resume(tmp_path, fixture_tables):
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(fixture_tables["pages"], pages_path)
    workdir = str(tmp_path / "work")

    clusters = run_dedupe_checkpointed(pages_path, workdir).to_pandas()
    m = pairwise_prf(clusters, fixture_tables["labels"].to_pandas())
    assert m["f1"] >= 0.99

    # all four stage manifests written
    for stage in ("records", "blocks", "scores", "clusters"):
        assert os.path.exists(os.path.join(workdir, stage, "_manifest.json")), stage

    # wipe only the final stage; rerun must reuse upstream checkpoints
    import shutil
    import time

    mtime_before = os.path.getmtime(os.path.join(workdir, "scores", "_manifest.json"))
    shutil.rmtree(os.path.join(workdir, "clusters"))
    t0 = time.time()
    clusters2 = run_dedupe_checkpointed(pages_path, workdir).to_pandas()
    assert os.path.getmtime(
        os.path.join(workdir, "scores", "_manifest.json")
    ) == mtime_before  # scores stage untouched
    a = clusters.sort_values("record_id").reset_index(drop=True)
    b = clusters2.sort_values("record_id").reset_index(drop=True)
    assert (a["cluster_id"].to_numpy() == b["cluster_id"].to_numpy()).all()


def test_checkpointed_with_interaction_feature(tmp_path, fixture_tables):
    # ADVICE r1: make_scores must exclude interaction fields ("f1*f2") from
    # the payload-join column list or attach_payload crashes on a
    # nonexistent column.
    from ny_campaign_finance_dedupe_ray.state.model import (
        Feature, Model, default_model,
    )

    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(fixture_tables["pages"], pages_path)
    base = default_model()
    model = Model(
        features=base.features
        + [Feature("jwx", "jw_name*jw_street", "interaction")],
        weights=base.weights + [0.0],
        bias=base.bias,
        threshold=base.threshold,
    )
    clusters = run_dedupe_checkpointed(
        pages_path, str(tmp_path / "work_ix"), model=model
    ).to_pandas()
    assert len(clusters) > 0
