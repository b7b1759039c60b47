"""Checkpointed flagship run: every stage writes partitioned Parquet + a
lineage manifest; a rerun resumes at the first stale/missing stage — the
engine-wide generalization of the reference's resume-from-blocking entry
point (/root/reference/dedupe_extension/start_at_clustering.py:119-374).
"""

from __future__ import annotations

import ray.data

from ..stages.blocking import BlockingConfig, block_records, default_config
from ..stages.clustering import add_singletons, connected_components, hierarchical_clusters
from ..stages.extract import extract_text
from ..stages.normalize import normalize_records
from ..stages.pairs import candidate_pairs
from ..stages.scoring import score_pairs
from ..state.checkpoint import (
    PartitionedCheckpoint,
    StageCheckpoint,
    dir_fingerprint,
)
from ..state.model import Model, default_model


def run_dedupe_checkpointed(
    pages_path: str,
    workdir: str,
    cfg: BlockingConfig | None = None,
    model: Model | None = None,
    threshold: float = 0.5,
    cc_mode: str = "driver",
) -> "ray.data.Dataset":
    """pages parquet -> CLUSTERS, with resumable per-stage checkpoints under
    ``workdir`` (records / blocks / scores / clusters).

    The records stage (extract + normalize: embarrassingly shard-parallel)
    checkpoints PER INPUT FILE when ``pages_path`` is a multi-file
    directory — an interrupted extraction resumes at the first unfinished
    shard, not from scratch (per-partition lineage, SURVEY.md §7 /
    north-rule resume contract).  The shuffle-bearing stages (blocks /
    scores / clusters) checkpoint per stage."""
    import glob
    import os

    cfg = cfg or default_config()
    model = model or default_model()
    cfg_params = {
        "predicates": [repr(p) for p in cfg.predicates],
        "minhash": (cfg.minhash_column, cfg.minhash_k, cfg.minhash_perms, cfg.minhash_bands),
        "host_key": cfg.host_key,
        "max_block_size": cfg.max_block_size,
    }

    def records_factory(path: str) -> "ray.data.Dataset":
        return normalize_records(extract_text(ray.data.read_parquet(path)))

    files = (
        sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
        if os.path.isdir(pages_path)
        else []
    )
    if len(files) > 1:
        records_pc = PartitionedCheckpoint(workdir, "records")
        records = records_pc.run(
            [(f"part{i:05d}", f) for i, f in enumerate(files)],
            records_factory,
            params={"stage": "records"},
        )
        records_fp = records_pc.fingerprint()
    else:
        records_cp = StageCheckpoint(workdir, "records")
        records = records_cp.run(
            lambda: records_factory(pages_path),
            params={"stage": "records"},
            input_fingerprint=dir_fingerprint(pages_path),
        )
        records_fp = records_cp.fingerprint()

    import dataclasses

    blocks_cp = StageCheckpoint(workdir, "blocks")
    blocks = blocks_cp.run(
        lambda: block_records(records, dataclasses.replace(cfg, payload_columns=())),
        params={"stage": "blocks", **cfg_params},
        input_fingerprint=records_fp,
    )

    scores_cp = StageCheckpoint(workdir, "scores")

    def make_scores() -> "ray.data.Dataset":
        from ..stages.pairs import attach_payload

        slim = candidate_pairs(blocks, max_block_size=cfg.max_block_size)
        # interaction features (field = "feat1*feat2") are derived from other
        # features' values, not record columns — excluding them mirrors
        # dedupe_pages.records_to_scores
        needed = tuple(
            dict.fromkeys(f.field for f in model.features if "*" not in f.field)
        )
        return score_pairs(
            attach_payload(slim, records, columns=needed), model=model
        )

    scores = scores_cp.run(
        make_scores,
        params={"stage": "scores", "model": model.to_json(), **cfg_params},
        input_fingerprint=blocks_cp.fingerprint(),
    )

    clusters_cp = StageCheckpoint(workdir, "clusters")
    clusters = clusters_cp.run(
        lambda: add_singletons(
            records.select_columns(["record_id"]),
            hierarchical_clusters(
                connected_components(scores, mode=cc_mode), threshold=threshold
            ),
        ),
        params={"stage": "clusters", "threshold": threshold, "cc_mode": cc_mode},
        input_fingerprint=scores_cp.fingerprint(),
    )
    return clusters
