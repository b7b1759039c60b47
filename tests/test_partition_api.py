"""partition() convenience API + interaction/custom model features +
empty/edge inputs through the full pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ny_campaign_finance_dedupe_ray.pipelines.partition_api import partition
from ny_campaign_finance_dedupe_ray.stages.scoring import PairScorer
from ny_campaign_finance_dedupe_ray.state.model import Feature, Model


DATA = {
    "r1": {"name": "mary smith", "street": "1 main street", "city": "albany",
           "state": "ny", "zip": "10001", "text_norm": "mary smith 1 main street"},
    "r2": {"name": "mary smyth", "street": "1 main street", "city": "albany",
           "state": "ny", "zip": "10001", "text_norm": "mary smyth 1 main street"},
    "r3": {"name": "bob jones", "street": "9 oak avenue", "city": "buffalo",
           "state": "ny", "zip": "14201", "text_norm": "bob jones 9 oak avenue"},
}


def test_partition_api():
    clusters = partition(DATA, threshold=0.5)
    got = {ids: scores for ids, scores in clusters}
    assert ("r1", "r2") in got
    assert ("r3",) in got
    assert got[("r3",)] == (1.0,)
    assert all(0 <= s <= 1 for ids, ss in clusters for s in ss)


def _pair_batch():
    return pa.table(
        {
            "id_a": pa.array(["x"], pa.string()),
            "id_b": pa.array(["y"], pa.string()),
            "name_a": pa.array(["mary smith"], pa.string()),
            "name_b": pa.array(["mary smyth"], pa.string()),
            "zip_a": pa.array(["10001"], pa.string()),
            "zip_b": pa.array(["10001"], pa.string()),
        }
    )


def test_interaction_feature():
    m = Model(
        features=[
            Feature("jw_name", "name", "jaro_winkler"),
            Feature("ex_zip", "zip", "exact"),
            Feature("jw_x_zip", "jw_name*ex_zip", "interaction"),
        ],
        weights=[0.0, 0.0, 1.0],
        bias=0.0,
    )
    s = PairScorer(model=m, min_score=0.0)
    X = s.features(_pair_batch())
    assert X.shape == (1, 3)
    assert abs(X[0, 2] - X[0, 0] * X[0, 1]) < 1e-12
    assert X[0, 2] > 0.8  # high jw * exact zip


def test_custom_comparator_feature():
    def same_len(a, b):
        if a is None or b is None:
            return 0.0
        return 1.0 if len(a) == len(b) else 0.0

    m = Model(
        features=[
            Feature("same_len", "name", "custom"),
            Feature("nm", "name", "not_missing"),
        ],
        weights=[1.0, 1.0],
        bias=0.0,
    )
    s = PairScorer(model=m, min_score=0.0, custom_fns={"same_len": same_len})
    X = s.features(_pair_batch())
    assert X[0, 0] == 1.0  # equal lengths
    assert X[0, 1] == 1.0


def test_empty_and_singleton_pipelines():
    from ny_campaign_finance_dedupe_ray.pipelines.dedupe_pages import dedupe_pages
    from ny_campaign_finance_dedupe_ray import synth

    # single page: one singleton cluster, nothing crashes
    one = synth.generate(n_entities=1, seed=0)["pages"].slice(0, 1)
    out = dedupe_pages(rd.from_arrow(one)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["record_id"] == out.iloc[0]["cluster_id"]
    assert out.iloc[0]["cluster_score"] == 1.0


def test_blocking_error_on_zero_pairs():
    # ADVICE r1: BlockingError parity — partition() must raise when the
    # predicates produce zero candidate pairs (reference core.py:288-293)
    import pytest

    from ny_campaign_finance_dedupe_ray.stages.scoring import BlockingError

    disjoint = {
        "a1": {"name": "aaaa bbbb", "street": "1 x", "city": "c1",
               "state": "ny", "zip": "11111", "text_norm": "aaaa"},
        "b1": {"name": "zzzz yyyy", "street": "2 q", "city": "c2",
               "state": "ca", "zip": "99999", "text_norm": "zzzz"},
    }
    with pytest.raises(BlockingError):
        partition(disjoint, threshold=0.5)
