"""Offline active-learning loop (state/label_loop.py) on the reference's
restaurant corpus: from 5 seed labels, uncertain_pairs -> mark -> refit
rounds must reach pipeline F1 >= 0.85 within 5 rounds (VERDICT r2 item 6
done-criterion).  Labels come programmatically from the golden entity
ids — no console UI."""

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
from ny_campaign_finance_dedupe_ray.stages.scoring import score_pairs
from ny_campaign_finance_dedupe_ray.state.label_loop import LabelLoop
from ny_campaign_finance_dedupe_ray.state.model import Feature

CSV = (
    "/root/reference/dedupe_extension/dedupe/tests/datasets/"
    "restaurant-nophone-training.csv"
)

FIELDS = ["name", "address", "city", "cuisine"]


def _load_restaurants():
    df = pd.read_csv(CSV, skipinitialspace=True)
    df["unique_id"] = df["unique_id"].str.strip("'").astype(int)

    def norm(s: pd.Series) -> list:
        arr = pa.array(s.fillna("").tolist(), pa.string())
        return TN.lower_trim_null(TN.strip_punctuation(arr)).to_pylist()

    recs = pd.DataFrame({"record_id": [f"r{i:04d}" for i in range(len(df))]})
    for f in FIELDS:
        recs[f] = norm(df[f])
    uid = dict(zip(recs["record_id"], df["unique_id"]))
    return recs, uid


@pytest.mark.skipif(not os.path.exists(CSV), reason="reference corpus absent")
def test_label_loop_reaches_f1():
    recs, uid = _load_restaurants()
    rec_dicts = recs.set_index("record_id").to_dict("index")
    by: dict[int, list[str]] = {}
    for rid, u in uid.items():
        by.setdefault(u, []).append(rid)
    match_pairs = [tuple(sorted(v)) for v in by.values() if len(v) == 2]

    candidates = [
        P.StringPredicate(P.first_token, "name"),
        P.StringPredicate(P.sorted_acronym, "name"),
        P.StringPredicate(P.same_three_char_start, "name"),
        P.StringPredicate(P.first_integer, "address"),
        P.StringPredicate(P.same_five_char_start, "address"),
        P.StringPredicate(P.first_token, "city"),
    ]
    feats = [
        Feature("jw_name", "name", "jaro_winkler"),
        Feature("lev_name", "name", "levenshtein_ratio"),
        Feature("jw_addr", "address", "jaro_winkler"),
        Feature("lev_addr", "address", "levenshtein_ratio"),
        Feature("jw_city", "city", "jaro_winkler"),
        Feature("ex_cuisine", "cuisine", "exact"),
    ]
    loop = LabelLoop(
        rec_dicts, feats, candidates, sample_size=3000, recall=0.95, seed=7
    )

    def oracle(pairs):
        return [uid[a] == uid[b] for a, b in pairs]

    # 5 seeds: the first 3 golden dupes + 2 known non-dupes
    seeds = match_pairs[:3] + [("r0000", "r0400"), ("r0100", "r0700")]
    loop.mark(seeds, oracle(seeds))
    assert loop.rules, "seed positives must already learn a rule set"

    f1 = 0.0
    for round_no in range(5):
        batch = loop.uncertain_pairs(25)
        assert batch and len(set(batch)) == len(batch)
        assert all(p not in loop.labels for p in batch)
        loop.mark(batch, oracle(batch))
        f1 = _pipeline_f1(recs, loop, match_pairs)
        if f1 >= 0.85:
            break
    assert f1 >= 0.85, f"label loop stuck at F1={f1:.3f} after 5 rounds"


def _pipeline_f1(recs, loop, match_pairs):
    cfg = BlockingConfig(
        predicates=loop.rules, minhash_column=None, payload_columns=()
    )
    records_ds = rd.from_pandas(recs)
    slim = candidate_pairs(block_records(records_ds, cfg), max_block_size=200)
    pairs_ds = attach_payload(slim, records_ds, columns=tuple(FIELDS))
    scores = score_pairs(pairs_ds, model=loop.model())
    clusters = scores_to_clusters(scores, records_ds, threshold=0.5).to_pandas()
    pred: set = set()
    for _, sub in clusters.groupby("cluster_id"):
        pred.update(itertools.combinations(sorted(sub["record_id"]), 2))
    true = set(match_pairs)
    tp, fp, fn = len(pred & true), len(pred - true), len(true - pred)
    if tp == 0:
        return 0.0
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    return 2 * precision * recall / (precision + recall)


@pytest.mark.skipif(not os.path.exists(CSV), reason="reference corpus absent")
def test_uncertain_pairs_prefers_disagreement():
    """Pairs where the two committee members disagree must rank above
    pairs where both agree."""
    recs, uid = _load_restaurants()
    rec_dicts = recs.set_index("record_id").to_dict("index")
    candidates = [P.StringPredicate(P.first_token, "name")]
    feats = [Feature("jw_name", "name", "jaro_winkler")]
    loop = LabelLoop(rec_dicts, feats, candidates, sample_size=500, seed=3)
    by: dict[int, list[str]] = {}
    for rid, u in uid.items():
        by.setdefault(u, []).append(rid)
    match_pairs = [tuple(sorted(v)) for v in by.values() if len(v) == 2]
    seeds = match_pairs[:2] + [("r0000", "r0400")]
    loop.mark(seeds, [True, True, False])
    picked = loop.uncertain_pairs(5)
    assert len(picked) == 5
    assert all(p not in loop.labels for p in picked)
    # disagreement of picked >= disagreement of any other unlabeled pair
    p = loop._rlr_scores()
    c = loop._cover_votes()
    dis = np.stack([p, c]).var(axis=0)
    picked_idx = [loop._pos[x] for x in picked]
    rest = [
        i
        for i, pair in enumerate(loop.pool)
        if pair not in loop.labels and i not in picked_idx
    ]
    if rest:
        assert min(dis[picked_idx]) >= max(dis[rest]) - 1e-12


@pytest.mark.skipif(not os.path.exists(CSV), reason="reference corpus absent")
def test_label_loop_link_mode():
    """RecordLink active learning: split the restaurant corpus into two
    sets (one side of each golden dup in each); the link-mode loop must
    sample cross pairs, learn rules covering the golden links, and fit a
    separating model."""
    recs, uid = _load_restaurants()
    rec_dicts = recs.set_index("record_id").to_dict("index")
    by: dict[int, list[str]] = {}
    for rid, u in uid.items():
        by.setdefault(u, []).append(rid)
    match_pairs = [tuple(sorted(v)) for v in by.values() if len(v) == 2]
    side_a = {p[0] for p in match_pairs}
    singles = [v[0] for v in by.values() if len(v) == 1]
    side_a.update(singles[::2])
    recs_a = {k: v for k, v in rec_dicts.items() if k in side_a}
    recs_b = {k: v for k, v in rec_dicts.items() if k not in side_a}
    gold = {(a, b) if a in recs_a else (b, a) for a, b in match_pairs}

    candidates = [
        P.StringPredicate(P.first_token, "name"),
        P.StringPredicate(P.same_three_char_start, "name"),
        P.StringPredicate(P.first_integer, "address"),
    ]
    feats = [
        Feature("jw_name", "name", "jaro_winkler"),
        Feature("jw_addr", "address", "jaro_winkler"),
        Feature("ex_cuisine", "cuisine", "exact"),
    ]
    loop = LabelLoop(
        recs_a, feats, candidates, sample_size=2000, recall=0.9, seed=3,
        records_b=recs_b,
    )
    # every pool pair crosses the two sets
    assert all(a in recs_a and b in recs_b for a, b in loop.pool)

    def oracle(pairs):
        return [uid[a] == uid[b] for a, b in pairs]

    seeds = sorted(gold)[:3] + [
        (next(iter(recs_a)), next(iter(recs_b))),
    ]
    loop.mark(seeds, oracle(seeds))
    for _ in range(3):
        batch = loop.uncertain_pairs(25)
        loop.mark(batch, oracle(batch))
    # learned rules must cover most golden cross links
    covered = sum(
        1
        for a, b in gold
        if any(
            set(r(rec_dicts[a])) & set(r(rec_dicts[b])) for r in loop.rules
        )
    )
    assert covered / len(gold) >= 0.85, covered / len(gold)
    # fitted model separates labeled positives from negatives
    import numpy as np

    idx = np.array([loop._pos[p] for p in loop.labels])
    y = np.array([loop.labels[p] for p in loop.labels])
    from ny_campaign_finance_dedupe_ray.state.model import sigmoid

    p_hat = sigmoid(loop._X[idx] @ loop.weights + loop.bias)
    if y.any() and (~y).any():
        assert p_hat[y].mean() > p_hat[~y].mean() + 0.2

def test_console_label_terminal_loop():
    """console_label: scripted y/n/u/p/f responses drive the LabelLoop via
    the reference's terminal contract (convenience.py:15-109) — previous
    buffer, running counts, flush-on-finish."""
    import io

    from ny_campaign_finance_dedupe_ray.state.console_label import console_label

    recs, uid = _load_restaurants()
    rec_dicts = recs.set_index("record_id").to_dict("index")
    candidates = [
        P.StringPredicate(P.first_token, "name"),
        P.StringPredicate(P.first_token, "city"),
    ]
    feats = [
        Feature("jw_name", "name", "jaro_winkler"),
        Feature("lev_name", "name", "levenshtein_ratio"),
    ]
    loop = LabelLoop(rec_dicts, feats, candidates, sample_size=400, seed=11)

    # y, n, u (buffered then discarded), p->y (revise previous), then f
    script = iter(["y", "n", "u", "p", "y", "f"])
    out = io.StringIO()
    console_label(loop, input_fn=lambda: next(script), output=out)

    # y + n + the revised y flushed; 'u' contributed nothing
    assert sum(loop.labels.values()) >= 1  # at least one positive marked
    assert len(loop.labels) >= 2           # and one negative
    text = out.getvalue()
    assert "Do these records refer to the same thing?" in text
    assert "(p)revious" in text            # buffer path exercised
    assert "Finished labeling" in text
    # field lines printed for both records of a pair
    assert text.count("name :") >= 2
