"""End-to-end golden-label evaluation on the reference's own restaurant
corpus (/root/reference/dedupe_extension/dedupe/tests/datasets/
restaurant-nophone-training.csv, 864 rows / 752 entities / 112 dup pairs)
— the reference's canonical test harness (tests/canonical.py:42-110)
re-expressed on this engine: learn blocking rules from labels, fit logistic
weights, run block -> pairs -> score -> cluster, measure pairwise F1.

Uses only the reference's public test DATA, no code.  The published dedupe
results on this corpus are ~0.90-0.95 F1; gate at 0.85.
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ny_campaign_finance_dedupe_ray.functions import predicates as P
from ny_campaign_finance_dedupe_ray.functions import textnorm as TN
from ny_campaign_finance_dedupe_ray.pipelines.dedupe_pages import scores_to_clusters
from ny_campaign_finance_dedupe_ray.stages.blocking import BlockingConfig, block_records
from ny_campaign_finance_dedupe_ray.stages.pairs import attach_payload, candidate_pairs
from ny_campaign_finance_dedupe_ray.stages.scoring import PairScorer, score_pairs
from ny_campaign_finance_dedupe_ray.state.learn_blocking import learn_blocking_rules
from ny_campaign_finance_dedupe_ray.state.model import (
    Feature,
    Model,
    fit_logistic,
    sigmoid,
)

CSV = (
    "/root/reference/dedupe_extension/dedupe/tests/datasets/"
    "restaurant-nophone-training.csv"
)

FIELDS = ["name", "address", "city", "cuisine"]


@pytest.mark.skipif(not os.path.exists(CSV), reason="reference corpus absent")
def test_restaurant_end_to_end_f1():
    df = pd.read_csv(CSV, skipinitialspace=True)
    df["unique_id"] = df["unique_id"].str.strip("'").astype(int)

    def norm(s: pd.Series) -> list:
        arr = pa.array(s.fillna("").tolist(), pa.string())
        return TN.lower_trim_null(TN.strip_punctuation(arr)).to_pylist()

    recs = pd.DataFrame({"record_id": [f"r{i:04d}" for i in range(len(df))]})
    for f in FIELDS:
        recs[f] = norm(df[f])
    uid = dict(zip(recs["record_id"], df["unique_id"]))

    by: dict[int, list[str]] = {}
    for rid, u in uid.items():
        by.setdefault(u, []).append(rid)
    match_pairs = [tuple(sorted(v)) for v in by.values() if len(v) == 2]
    assert len(match_pairs) == 112

    # 1) learn the blocking rule set from the labels (training.py parity)
    rec_dicts = recs.set_index("record_id").to_dict("index")
    candidates = [
        P.StringPredicate(P.first_token, "name"),
        P.StringPredicate(P.sorted_acronym, "name"),
        P.StringPredicate(P.same_three_char_start, "name"),
        P.StringPredicate(P.first_integer, "address"),
        P.StringPredicate(P.same_five_char_start, "address"),
        P.StringPredicate(P.first_token, "city"),
    ]
    rules = learn_blocking_rules(rec_dicts, match_pairs, candidates, recall=0.99)
    covered = sum(
        1
        for a, b in match_pairs
        if any(set(r(rec_dicts[a])) & set(r(rec_dicts[b])) for r in rules)
    )
    assert covered / len(match_pairs) >= 0.98

    # 2) fit the logistic scorer on labeled pairs (rlr parity)
    feats = [
        Feature("jw_name", "name", "jaro_winkler"),
        Feature("lev_name", "name", "levenshtein_ratio"),
        Feature("jw_addr", "address", "jaro_winkler"),
        Feature("lev_addr", "address", "levenshtein_ratio"),
        Feature("jw_city", "city", "jaro_winkler"),
        Feature("ex_cuisine", "cuisine", "exact"),
    ]
    scorer0 = PairScorer(model=Model(features=feats, weights=[0] * 6, bias=0.0))
    rng = np.random.default_rng(5)
    ids = recs["record_id"].tolist()
    neg: list[tuple[str, str]] = []
    while len(neg) < 1500:
        i, j = rng.integers(0, len(ids), 2)
        a, b = sorted((ids[int(i)], ids[int(j)]))
        if a != b and uid[a] != uid[b]:
            neg.append((a, b))
    labeled = match_pairs + neg
    y = np.array([1.0] * len(match_pairs) + [0.0] * len(neg))

    def batch_of(pair_list):
        cols = {}
        for side, k in (("a", 0), ("b", 1)):
            for f in FIELDS:
                cols[f"{f}_{side}"] = pa.array(
                    [rec_dicts[p[k]][f] for p in pair_list], pa.string()
                )
        cols["id_a"] = pa.array([p[0] for p in pair_list], pa.string())
        cols["id_b"] = pa.array([p[1] for p in pair_list], pa.string())
        return pa.table(cols)

    X = np.nan_to_num(scorer0.features(batch_of(labeled)))
    w, b = fit_logistic(X, y, iters=4000, lr=1.0)
    p = sigmoid(X @ w + b)
    assert (p[: len(match_pairs)] > 0.5).mean() > 0.9
    assert (p[len(match_pairs):] <= 0.5).mean() > 0.99

    # 3) full pipeline with the learned rules + fitted weights
    model = Model(
        features=feats,
        weights=[round(float(x), 4) for x in w],
        bias=round(float(b), 4),
        threshold=0.5,
    )
    cfg = BlockingConfig(predicates=rules, minhash_column=None, payload_columns=())
    records_ds = rd.from_pandas(recs)
    slim = candidate_pairs(block_records(records_ds, cfg), max_block_size=200)
    pairs_ds = attach_payload(slim, records_ds, columns=tuple(FIELDS))
    scores = score_pairs(pairs_ds, model=model)
    clusters = scores_to_clusters(scores, records_ds, threshold=0.5).to_pandas()

    pred: set[tuple[str, str]] = set()
    for _, sub in clusters.groupby("cluster_id"):
        pred.update(itertools.combinations(sorted(sub["record_id"]), 2))
    true = set(match_pairs)
    tp, fp, fn = len(pred & true), len(pred - true), len(true - pred)
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.85, (precision, recall, f1)
