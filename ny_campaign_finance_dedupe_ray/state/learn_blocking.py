"""Offline blocking-rule learner: pick a small predicate set covering the
labeled duplicate pairs at minimum estimated comparison cost — the
weighted-set-cover core of the reference's BlockLearner
(/root/reference/dedupe_extension/dedupe/dedupe/training.py:17-111; Cover at
:324-411; comparison-count estimate scaled by (N(N-1))/(Ns(Ns-1)) at
:114-170).  The reference's BranchBound search (:229-321) is replaced by the
standard greedy weighted set-cover approximation — deterministic and within
ln(n) of optimal; compound(2) candidates are generated the same way.
"""

from __future__ import annotations

import itertools
from collections import Counter

from ..functions import predicates as P


def _coverage(pred, records: dict, pairs: list) -> set[int]:
    """Indices of labeled pairs covered (both sides share >=1 key)."""
    keys = {rid: set(pred(rec)) for rid, rec in records.items()}
    out = set()
    for i, (a, b) in enumerate(pairs):
        if keys.get(a) and keys.get(b) and keys[a] & keys[b]:
            out.add(i)
    return out


def _estimated_comparisons(pred, records: dict, total_records: int | None) -> float:
    """Sum over keys of c*(c-1)/2, scaled from the sample to the full corpus
    (training.py:114-170)."""
    counts: Counter = Counter()
    for rec in records.values():
        for k in set(pred(rec)):
            counts[k] += 1
    sample = sum(c * (c - 1) / 2 for c in counts.values())
    ns = len(records)
    if total_records and ns > 1:
        scale = (total_records * (total_records - 1)) / (ns * (ns - 1))
        return sample * scale
    return sample


def learn_blocking_rules(
    records: dict,
    match_pairs: list[tuple],
    candidate_predicates: list,
    recall: float = 0.9,
    max_compound: int = 2,
    total_records: int | None = None,
) -> list:
    """records: {record_id: record_dict}; match_pairs: [(id_a, id_b), ...]
    labeled duplicates.  Returns the learned predicate list (possibly
    compound), greedily covering >= recall of the dupes at minimum
    estimated comparisons."""
    candidates = list(candidate_predicates)
    if max_compound >= 2:
        for a, b in itertools.combinations(candidate_predicates, 2):
            if getattr(a, "field", None) != getattr(b, "field", None):
                candidates.append(P.CompoundPredicate(a, b))

    cover = {i: _coverage(p, records, match_pairs) for i, p in enumerate(candidates)}
    cost = {
        i: max(_estimated_comparisons(p, records, total_records), 1.0)
        for i, p in enumerate(candidates)
    }
    target = recall * len(match_pairs)
    covered: set[int] = set()
    chosen: list = []
    remaining = set(cover)
    while len(covered) < target and remaining:
        # greedy: best marginal coverage per unit cost
        best, best_ratio = None, 0.0
        for i in remaining:
            gain = len(cover[i] - covered)
            if gain == 0:
                continue
            ratio = gain / cost[i]
            if ratio > best_ratio:
                best, best_ratio = i, ratio
        if best is None:
            break
        covered |= cover[best]
        chosen.append(candidates[best])
        remaining.discard(best)
    return chosen
