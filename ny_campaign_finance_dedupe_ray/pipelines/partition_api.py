"""In-memory convenience API mirroring ``Dedupe.partition(data, threshold)``
(/root/reference/dedupe_extension/dedupe/dedupe/api.py:129-184): a dict of
records in, an iterable of (member_ids_tuple, confidences_tuple) out —
backed by the same Dataset stages as the full pipeline (pairs -> score ->
cluster -> singletons)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.blocking import BlockingConfig, block_records, default_config
from ..stages.clustering import add_singletons, connected_components, hierarchical_clusters
from ..stages.pairs import attach_payload, candidate_pairs
from ..stages.scoring import score_pairs
from ..state.model import Model, default_model


def partition(
    data: dict,
    cfg: BlockingConfig | None = None,
    model: Model | None = None,
    threshold: float = 0.5,
    custom_fns: dict | None = None,
) -> list[tuple[tuple, tuple]]:
    """data: {record_id: {field: value}}.  Returns clusters as
    [(record_ids, confidences)] including singletons with confidence 1.0
    (api.py:160-166 output shape), ordered by min member id."""
    cfg = cfg or default_config()
    model = model or default_model()
    fields = sorted({f.field for f in model.features if "*" not in f.field})
    rows: dict[str, list] = {"record_id": []}
    for f in fields:
        rows[f] = []
    for rid, rec in data.items():
        rows["record_id"].append(str(rid))
        for f in fields:
            rows[f].append(rec.get(f))
    records = ray.data.from_arrow(
        pa.table({k: pa.array(v, pa.string()) for k, v in rows.items()})
    )

    import dataclasses

    blocks = block_records(records, dataclasses.replace(cfg, payload_columns=()))
    slim = candidate_pairs(blocks, max_block_size=cfg.max_block_size).materialize()
    if slim.count() == 0 and len(data) > 1:
        from ..stages.scoring import BlockingError

        raise BlockingError(
            "No candidate pairs were produced — the blocking predicates are "
            "too restrictive for this data (reference core.py:288-293)."
        )
    pairs = attach_payload(slim, records, columns=tuple(fields))
    scores = score_pairs(pairs, model=model, custom_fns=custom_fns)
    comps = connected_components(scores, mode="driver")
    clusters = hierarchical_clusters(comps, threshold=threshold)
    full = add_singletons(
        records.select_columns(["record_id"]), clusters
    ).to_pandas()

    out: list[tuple[tuple, tuple]] = []
    for _, sub in full.groupby("cluster_id"):
        sub = sub.sort_values("record_id")
        out.append(
            (tuple(sub["record_id"]), tuple(float(s) for s in sub["cluster_score"]))
        )
    out.sort(key=lambda c: c[0][0])
    return out
