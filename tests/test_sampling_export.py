"""Blocked sampling, uncertainty selection, exports."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ny_campaign_finance_dedupe_ray.functions import predicates as P
from ny_campaign_finance_dedupe_ray.functions import sampling as S
from ny_campaign_finance_dedupe_ray.sources import export as E


def test_blocked_sample_pairs():
    records = {
        f"r{i}": {"name": name}
        for i, name in enumerate(
            ["mary smith", "mary jones", "bob smith", "bob brown",
             "carol wu", "carol xu", "dan q", "unique zz"]
        )
    }
    preds = [P.StringPredicate(P.first_token, "name")]
    sample = S.blocked_sample_pairs(records, preds, sample_size=3, seed=1)
    assert 0 < len(sample) <= 3
    for a, b in sample:
        assert a < b
        assert records[a]["name"].split()[0] == records[b]["name"].split()[0]
    # deterministic under the same seed
    s2 = S.blocked_sample_pairs(records, preds, sample_size=3, seed=1)
    assert sample == s2


def test_uncertain_pairs():
    df = pd.DataFrame(
        {
            "id_a": ["a", "b", "c"],
            "id_b": ["x", "y", "z"],
            "score": [0.95, 0.52, 0.1],
        }
    )
    assert S.uncertain_pairs(df, 1) == [("b", "y")]
    assert S.uncertain_pairs(df, 2) == [("b", "y"), ("c", "z")]


def test_export_entity_map(tmp_path):
    clusters = rd.from_arrow(
        pa.table(
            {
                "record_id": pa.array(["r1", "r2"], pa.string()),
                "cluster_id": pa.array(["r1", "r1"], pa.string()),
                "cluster_score": pa.array([1.0, 0.9], pa.float32()),
            }
        )
    )
    path = E.export_entity_map(clusters, str(tmp_path), timestamp="20240101_000000")
    assert path.endswith("entity_map_20240101_000000")
    assert os.path.isdir(path)
    back = rd.read_csv(path).to_pandas()
    assert len(back) == 2
    assert set(back.columns) == {"record_id", "cluster_id", "cluster_score"}
