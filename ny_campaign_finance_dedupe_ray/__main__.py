"""Cluster job entry point — the north-rule ``ray job submit`` surface.

On a multi-node cluster (the runtime sets RAY_ADDRESS and ships the
package via --working-dir):

    ray job submit --working-dir . -- \
        python -m ny_campaign_finance_dedupe_ray \
        --input /data/pages --workdir /data/runs/run1

Single-node smoke run (starts a local Ray session):

    python -m ny_campaign_finance_dedupe_ray \
        --input /root/testdata/sf0.001 --workdir /tmp/run1

The job is the checkpointed flagship pipeline
(pipelines/checkpointed.run_dedupe_checkpointed): extract -> normalize ->
block -> score -> cluster, every stage persisted as partitioned Parquet
with a lineage manifest under ``--workdir``.  Re-submitting with the same
workdir resumes at the first missing/stale stage (per input shard for the
extract stage), so a preempted job re-does only unfinished partitions —
the reference's resume-from-blocking entry point
(/root/reference/dedupe_extension/start_at_clustering.py) generalized to
every stage.  A ``run_manifest.json`` with cluster metrics and any
dropped-work counters is written at the end.

This module is the ONLY library surface that owns a Ray session (the
driver contract in __ray_entry__ must never init); it initializes from
RAY_ADDRESS when launched by the job runtime and falls back to a local
session for smoke runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m ny_campaign_finance_dedupe_ray",
        description="Checkpointed blocking -> scoring -> clustering job",
    )
    ap.add_argument(
        "--input", required=True,
        help="pages parquet: a file, or a directory of *.parquet shards "
        "(directories get per-shard extract checkpoints)",
    )
    ap.add_argument(
        "--workdir", required=True,
        help="checkpoint root; re-submitting with the same workdir resumes",
    )
    ap.add_argument(
        "--output", default=None,
        help="also write final clusters to this parquet directory "
        "(default: leave them in <workdir>/clusters)",
    )
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="hierarchical-cluster score threshold")
    ap.add_argument("--cc-mode", default="auto",
                    choices=["driver", "distributed", "auto"],
                    help="connected-components path (auto switches to "
                    "distributed above 20M edges)")
    ap.add_argument("--config", default="profile",
                    choices=["profile", "doc"],
                    help="blocking/model preset: 'profile' for structured "
                    "profile pages (name/street fields), 'doc' for "
                    "free-text document pages (MinHash/LSH + host keys)")
    ap.add_argument("--model", default=None,
                    help="trained Model JSON (state/model.py artifact; "
                    "convert reference settings pickles with "
                    "tools/convert_settings.py); default: built-in model")
    ap.add_argument("--address", default=None,
                    help="Ray address override (default: RAY_ADDRESS from "
                    "the job runtime, else a local session)")
    args = ap.parse_args(argv)

    import ray

    started_session = not ray.is_initialized()
    if started_session:
        ray.init(
            address=args.address or os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )

    from .pipelines.checkpointed import run_dedupe_checkpointed
    from .stages.stats import cluster_run_metrics, write_run_manifest
    from .state.counters import enable_counters
    from .state.model import Model

    enable_counters()
    cfg = None
    model = Model.load(args.model) if args.model else None
    if args.config == "doc":
        from .stages.blocking import doc_config
        from .state.model import doc_model

        cfg = doc_config()
        model = model or doc_model()
    t0 = time.time()
    clusters = run_dedupe_checkpointed(
        args.input,
        args.workdir,
        cfg=cfg,
        model=model,
        threshold=args.threshold,
        cc_mode=args.cc_mode,
    )
    if args.output:
        clusters.write_parquet(args.output)
    metrics = cluster_run_metrics(
        clusters,
        run_seconds=round(time.time() - t0, 3),
        settings_name=args.model,
    )
    manifest_path = os.path.join(args.workdir, "run_manifest.json")
    write_run_manifest(manifest_path, metrics)
    print(
        f"clusters={metrics['total_clusters']} "
        f"records={metrics['total_records']} "
        f"wall_s={metrics['run_time_s']} manifest={manifest_path}"
    )
    if started_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
