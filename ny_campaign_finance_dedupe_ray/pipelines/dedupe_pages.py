"""Flagship pipeline: pages -> extract -> normalize -> block -> pairs ->
score -> cluster -> entity map.

Mirrors the reference production flow run_dedupe
(/root/reference/dedupe_extension/campaign_finance_dedupe.py:119-342) and the
library partition() chain (dedupe/api.py:129-184), with each stage exposed as
a composable Dataset -> Dataset function (the reference's public
block/pairs/score/cluster stage granularity, api.py:92-322).
"""

from __future__ import annotations

import ray.data

from ..stages.blocking import BlockingConfig, block_records, default_config
from ..stages.clustering import add_singletons, connected_components, hierarchical_clusters
from ..stages.extract import extract_text
from ..stages.normalize import normalize_records
from ..stages.pairs import attach_payload, candidate_pairs
from ..stages.scoring import score_pairs
from ..state.model import Model


def pages_to_records(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    return normalize_records(extract_text(pages))


def records_to_scores(
    records: "ray.data.Dataset",
    cfg: BlockingConfig | None = None,
    model: Model | None = None,
    scorer_concurrency=(1, 8),
    payload_mode: str = "join",
) -> "ray.data.Dataset":
    import dataclasses

    from ..state.model import default_model

    cfg = cfg or default_config()
    model = model or default_model()
    needed = tuple(
        dict.fromkeys(f.field for f in model.features if "*" not in f.field)
    )
    # Fully streaming: blocking flat-map -> bucketed pair generation.  The
    # hot-key cap (stop-word analogue) is applied inside the pair-gen bucket
    # tasks — every row of a block key hashes to the same bucket, so the
    # per-key counts there are globally exact and no separate counting
    # shuffle or blocks materialization is needed.
    #
    # payload_mode picks how scorer feature fields reach the pairs:
    #   'join' — pairs run SLIM (ids only) through dedup, payload attached
    #     by a bucketed groupby join afterwards.  Wins when payload x
    #     key-duplication is large (long document text + 16 LSH bands:
    #     45s -> 8s at 411k pairs).
    #   'carry' — payload rides through blocking and pair-gen.  Wins for
    #     short fields where the two join shuffles would cost more than the
    #     duplicated payload bytes (profile records: ~60B payload).
    if payload_mode == "carry":
        carry_cfg = dataclasses.replace(cfg, payload_columns=needed)
        blocks = block_records(records, carry_cfg)
        pairs = candidate_pairs(blocks, max_block_size=cfg.max_block_size)
    else:
        slim_cfg = dataclasses.replace(cfg, payload_columns=())
        blocks = block_records(records, slim_cfg)
        slim = candidate_pairs(blocks, max_block_size=cfg.max_block_size)
        pairs = attach_payload(slim, records, columns=needed)
    return score_pairs(pairs, model=model, concurrency=scorer_concurrency)


def scores_to_clusters(
    scores: "ray.data.Dataset",
    records: "ray.data.Dataset",
    threshold: float = 0.5,
    cc_mode: str = "driver",
    max_components: int = 30000,
) -> "ray.data.Dataset":
    comps = connected_components(scores, max_components=max_components, mode=cc_mode)
    clusters = hierarchical_clusters(comps, threshold=threshold)
    return add_singletons(records.select_columns(["record_id"]), clusters)


def dedupe_pages(
    pages: "ray.data.Dataset",
    cfg: BlockingConfig | None = None,
    model: Model | None = None,
    threshold: float = 0.5,
    cc_mode: str = "driver",
    scorer_concurrency=(1, 8),
    payload_mode: str = "join",
) -> "ray.data.Dataset":
    """pages -> CLUSTERS(record_id, cluster_id, cluster_score).

    threshold=0.5 is the production default
    (campaign_finance_dedupe.py:320)."""
    records = pages_to_records(pages)
    scores = records_to_scores(
        records,
        cfg=cfg,
        model=model,
        scorer_concurrency=scorer_concurrency,
        payload_mode=payload_mode,
    )
    return scores_to_clusters(
        scores, records, threshold=threshold, cc_mode=cc_mode
    )
