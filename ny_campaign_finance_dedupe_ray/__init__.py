"""Ray-Data-native record-linkage / web-scale data-processing engine.

A from-scratch re-expression of the capabilities of
rawild/ny-campaign-finance-dedupe (reference at /root/reference/, cited by
file:line in docstrings) as idiomatic Ray Data pipelines:

    pages Dataset --extract--> text --normalize--> fields
        --blocking flat-map--> (block_key, record_id, payload)
        --groupby(block_key)--> candidate pairs (deduped, id_a < id_b)
        --actor-pool scorer--> (id_a, id_b, score)
        --connected components + hierarchical--> (record_id, cluster_id, score)

Every stage is a Dataset -> Dataset function (mirroring the reference's
public block/pairs/score/cluster stage granularity, dedupe/api.py:92-322),
checkpointable to per-partition Parquet with lineage manifests.
"""

__version__ = "0.1.0"
