"""Checkpoint manifests: resume skips completed stages, stale inputs refuse."""

from __future__ import annotations

import json

import pytest
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

def test_partitioned_checkpoint_resumes_per_shard(tmp_path):
    """A failed run keeps its finished shard checkpoints; the rerun
    recomputes ONLY the failed shard, and a changed input invalidates just
    its own shard (per-partition lineage, north-rule resume contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.state.checkpoint import (
        PartitionedCheckpoint,
    )

    shards = []
    for i in range(3):
        p = tmp_path / f"in_{i}"
        p.mkdir()
        pq.write_table(
            pa.table({"x": pa.array([i * 10 + j for j in range(4)], pa.int64())}),
            str(p / "part.parquet"),
        )
        shards.append((f"shard{i}", str(p)))

    calls = []

    def make_factory(fail_on=None):
        def factory(path):
            calls.append(path)
            if fail_on and fail_on in path:
                raise RuntimeError("simulated shard failure")
            return rd.read_parquet(path).map_batches(
                lambda t: t.append_column(
                    "y", pa.array([v * 2 for v in t.column("x").to_pylist()],
                                  pa.int64())
                ),
                batch_format="pyarrow",
            )
        return factory

    ck = PartitionedCheckpoint(str(tmp_path / "wd"), "double")
    params = {"mult": 2}

    # first attempt dies on shard 2
    with pytest.raises(RuntimeError):
        ck.run(shards, make_factory(fail_on="in_2"), params)
    assert ck.shard("shard0").manifest()["complete"] is True
    assert ck.shard("shard1").manifest()["complete"] is True
    assert ck.shard("shard2").manifest() is None

    # resume: only the failed shard recomputes
    calls.clear()
    out = ck.run(shards, make_factory(), params).to_pandas()
    assert [c.rsplit("/", 1)[-1] for c in calls] == ["in_2"]
    assert sorted(out["x"]) == sorted(i * 10 + j for i in range(3) for j in range(4))
    assert (out.sort_values("x")["y"].to_numpy()
            == out.sort_values("x")["x"].to_numpy() * 2).all()

    # change ONE shard's input: only that shard is stale
    pq.write_table(
        pa.table({"x": pa.array([100, 101], pa.int64())}),
        str(tmp_path / "in_1" / "part.parquet"),
    )
    calls.clear()
    out2 = ck.run(shards, make_factory(), params).to_pandas()
    assert [c.rsplit("/", 1)[-1] for c in calls] == ["in_1"]
    assert set(out2["x"]) == {0, 1, 2, 3, 100, 101, 20, 21, 22, 23}

    # per-shard metrics summary exists
    import json as _json
    sh = _json.loads((tmp_path / "wd" / "double" / "_shards.json").read_text())
    assert sh["shards"]["shard1"] == 2

def test_checkpointed_run_shards_extract_per_file(tmp_path):
    """Multi-file pages input: the records stage checkpoints per input
    file; touching one file recomputes only that shard while the
    downstream stage correctly goes stale (fingerprint chain)."""
    from ny_campaign_finance_dedupe_ray import synth
    from ny_campaign_finance_dedupe_ray.pipelines.checkpointed import (
        run_dedupe_checkpointed,
    )

    fx = synth.generate(n_entities=40, seed=5)
    pages = fx["pages"]
    pdir = tmp_path / "pages"
    pdir.mkdir()
    half = pages.num_rows // 2
    pq.write_table(pages.slice(0, half), str(pdir / "a.parquet"))
    pq.write_table(pages.slice(half), str(pdir / "b.parquet"))

    wd = tmp_path / "wd"
    out = run_dedupe_checkpointed(str(pdir), str(wd)).to_pandas()
    assert len(out) == pages.num_rows
    shard_manifest = json.loads((wd / "records" / "_shards.json").read_text())
    assert set(shard_manifest["shards"]) == {"part00000", "part00001"}

    # touch one shard: only it recomputes; totals unchanged
    m0_before = json.loads(
        (wd / "records" / "part00000" / "_manifest.json").read_text()
    )
    pq.write_table(pages.slice(0, half), str(pdir / "a.parquet"))
    # (rewrite with identical content -> same size fingerprint -> still valid)
    out2 = run_dedupe_checkpointed(str(pdir), str(wd)).to_pandas()
    m0_after = json.loads(
        (wd / "records" / "part00000" / "_manifest.json").read_text()
    )
    assert m0_after == m0_before  # shard untouched (fingerprint match)
    assert sorted(out2["record_id"]) == sorted(out["record_id"])


def test_stage_checkpoint_empty_output(tmp_path, ray_session):
    """An empty stage output (e.g. zero candidate pairs) must checkpoint and
    resume, not crash on a fileless directory (round-4 job-CLI bug)."""
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        src = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
        return src.filter(expr="x > 99")

    cp = StageCheckpoint(str(tmp_path), "empty")
    out1 = cp.run(factory, params={"p": 1}, input_fingerprint="f1")
    assert out1.count() == 0 and calls["n"] == 1
    m = cp.manifest()
    assert m["complete"] and m["row_count"] == 0
    # resume skips the stage and the checkpoint is readable
    out2 = cp.run(factory, params={"p": 1}, input_fingerprint="f1")
    assert out2.count() == 0 and calls["n"] == 1


def test_job_cli_runs_and_resumes(tmp_path, ray_session):
    """python -m ny_campaign_finance_dedupe_ray (the ray-job-submit surface):
    end-to-end over sharded pages parquet, then a resumed re-submit."""
    from ny_campaign_finance_dedupe_ray.__main__ import main

    fx = synth.generate(n_entities=30, seed=7)
    pages = fx["pages"]
    pdir = tmp_path / "pages"
    pdir.mkdir()
    half = pages.num_rows // 2
    pq.write_table(pages.slice(0, half), str(pdir / "a.parquet"))
    pq.write_table(pages.slice(half), str(pdir / "b.parquet"))
    wd = tmp_path / "wd"
    outdir = tmp_path / "out"

    rc = main([
        "--input", str(pdir), "--workdir", str(wd), "--output", str(outdir),
    ])
    assert rc == 0
    manifest = json.loads((wd / "run_manifest.json").read_text())
    assert manifest["total_records"] == pages.num_rows
    assert "dropped_work" in manifest
    written = rd.read_parquet(str(outdir)).count()
    assert written == pages.num_rows

    # re-submit with the same workdir: resumes from checkpoints, same answer
    rc2 = main(["--input", str(pdir), "--workdir", str(wd)])
    assert rc2 == 0
    manifest2 = json.loads((wd / "run_manifest.json").read_text())
    assert manifest2["total_records"] == pages.num_rows
    assert manifest2["total_clusters"] == manifest["total_clusters"]
