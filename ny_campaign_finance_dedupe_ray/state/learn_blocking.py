"""Offline blocking-rule learner: pick a small predicate set covering the
labeled duplicate pairs at minimum estimated comparison cost — the
weighted-set-cover core of the reference's BlockLearner
(/root/reference/dedupe_extension/dedupe/dedupe/training.py:17-111; Cover at
:324-411; comparison-count estimate scaled by (N(N-1))/(Ns(Ns-1)) at
:114-170).  Two search strategies:

- ``search="branch_bound"`` (default, reference parity): an exact
  branch-and-bound over predicate subsets matching training.py:229-321 —
  cost-window pruning, reachability cutoff, best-first branching on
  (coverage, -cost), dominated-candidate elimination — seeded with the
  greedy solution as the incumbent (a strictly better starting bound than
  the reference's all-candidates start; the search stays exact within the
  call budget).
- ``search="greedy"``: the standard greedy weighted-set-cover
  approximation (deterministic, within ln(n) of optimal) — the fallback
  when branch-and-bound exhausts its call budget without covering the
  target.

Compound(2) candidates are generated the same way in both.
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


def _greedy_cover(
    cover: dict[int, set], cost: dict[int, float], target: float
) -> list[int]:
    """Greedy weighted set cover: best marginal coverage per unit cost."""
    covered: set[int] = set()
    chosen: list[int] = []
    remaining = set(cover)
    while len(covered) < target and remaining:
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
        chosen.append(best)
        remaining.discard(best)
    return chosen


class BranchBoundCover:
    """Exact min-cost set cover by branch-and-bound — the search semantics
    of the reference's BranchBound (training.py:229-321): cost-window
    pruning, reachability cutoff, branching on max (coverage, -cost) with
    an include branch (re-scope candidates to still-uncovered pairs) and an
    exclude branch (drop candidates dominated by the branching predicate).
    The incumbent can be pre-seeded (see learn_blocking_rules)."""

    def __init__(self, target: float, cost: dict[int, float],
                 max_calls: int = 2500):
        self.target = target
        self.cost = cost
        self.calls = max_calls
        self.best: tuple[int, ...] | None = None
        self.best_score = float("inf")
        self._original: dict[int, frozenset] = {}

    def seed(self, partial: tuple[int, ...], cover: dict[int, frozenset]):
        covered = set().union(*(cover[i] for i in partial)) if partial else set()
        if len(covered) >= self.target:
            self.best = partial
            self.best_score = sum(self.cost[i] for i in partial)

    def search(self, candidates: dict[int, frozenset],
               partial: tuple[int, ...] = ()) -> tuple[int, ...] | None:
        if not self._original:
            self._original = dict(candidates)
        if self.calls <= 0:
            return self.best
        self.calls -= 1

        covered = (
            set().union(*(self._original[i] for i in partial))
            if partial
            else set()
        )
        score = sum(self.cost[i] for i in partial)

        if len(covered) >= self.target:
            if score < self.best_score:
                self.best = partial
                self.best_score = score
            return self.best

        window = self.best_score - score
        candidates = {
            i: c for i, c in candidates.items() if self.cost[i] < window
        }
        reachable = (
            len(set().union(*candidates.values())) if candidates else 0
        ) + len(covered)
        if candidates and reachable >= self.target:
            best_i = max(
                candidates, key=lambda i: (len(candidates[i]), -self.cost[i])
            )
            taken = candidates[best_i]
            remaining = {}
            for i, c in candidates.items():
                still = c - taken
                if still:
                    remaining[i] = still
            self.search(remaining, partial + (best_i,))
            reduced = {
                i: c
                for i, c in candidates.items()
                if i == best_i
                or not (self.cost[best_i] <= self.cost[i] and taken >= c)
            }
            del reduced[best_i]
            self.search(reduced, partial)
        return self.best


def learn_blocking_rules(
    records: dict,
    match_pairs: list[tuple],
    candidate_predicates: list,
    recall: float = 0.9,
    max_compound: int = 2,
    total_records: int | None = None,
    search: str = "branch_bound",
    max_calls: int = 2500,
) -> list:
    """records: {record_id: record_dict}; match_pairs: [(id_a, id_b), ...]
    labeled duplicates.  Returns the learned predicate list (possibly
    compound) covering >= recall of the dupes at minimum estimated
    comparisons — exactly (branch_bound, the reference default) or
    approximately (greedy)."""
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
    greedy = _greedy_cover(cover, cost, target)
    if search == "greedy":
        return [candidates[i] for i in greedy]

    frozen = {i: frozenset(c) for i, c in cover.items() if c}
    bb = BranchBoundCover(target, cost, max_calls=max_calls)
    bb.seed(tuple(greedy), frozen)
    try:
        found = bb.search(frozen)
    except RecursionError:
        # the exclude branch recurses once per eliminated candidate; with
        # O(p^2) compound candidates a long exclude chain can exceed the
        # interpreter recursion limit before the call budget — fall back to
        # the greedy cover rather than crash
        found = bb.best or None
    if found is None:
        return [candidates[i] for i in greedy]
    # deterministic output order: as enumerated in the candidate list
    return [candidates[i] for i in sorted(found)]
