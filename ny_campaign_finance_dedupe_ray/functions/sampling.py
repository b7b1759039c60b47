"""Pair and record samplers.

- random_pairs / random_pairs_match: uniform sampling of pair indices via
  triangular-number inversion, the reference's closed form
  (/root/reference/dedupe_extension/dedupe/dedupe/core.py:47-110), seeded.
- stratified_sample: per-stratum fractional sampling (the
  StratifiedShuffleSplit test-subset maker, data_load/get_samples.py:15-58)
  as a groupby + seeded per-group sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def random_pairs(
    n_records: int, sample_size: int, seed: int = 42
) -> np.ndarray:
    """(sample_size, 2) array of pair indices (i < j) sampled uniformly
    WITHOUT enumerating the n*(n-1)/2 pair space (core.py:47-80)."""
    n = n_records * (n_records - 1) // 2
    if n_records < 2:
        return np.empty((0, 2), dtype=np.int64)
    rng = np.random.default_rng(seed)
    if sample_size >= n:
        idx = np.arange(n, dtype=np.int64)
    else:
        idx = rng.choice(n, size=sample_size, replace=False).astype(np.int64)
    b = 1 - 2 * n_records
    x = np.trunc((-b - np.sqrt(b * b - 8 * idx.astype(np.float64))) / 2)
    y = idx + x * (b + x + 2) / 2 + 1
    return np.column_stack((x, y)).astype(np.int64)


def random_pairs_match(
    n_a: int, n_b: int, sample_size: int, seed: int = 42
) -> np.ndarray:
    """Uniform (i, j) pairs across two record sets (core.py:83-96)."""
    n = n_a * n_b
    if n == 0:
        return np.empty((0, 2), dtype=np.int64)
    rng = np.random.default_rng(seed)
    if sample_size >= n:
        idx = np.arange(n, dtype=np.int64)
    else:
        idx = rng.choice(n, size=sample_size, replace=False).astype(np.int64)
    return np.column_stack((idx // n_b, idx % n_b)).astype(np.int64)


def stratified_sample(
    ds: "ray.data.Dataset",
    strata_column: str,
    frac: float,
    seed: int = 42,
    min_per_stratum: int = 1,
) -> "ray.data.Dataset":
    """Seeded fractional sample per stratum; deterministic given (seed,
    stratum) regardless of partitioning."""

    def take(g: pd.DataFrame) -> pd.DataFrame:
        key = str(g[strata_column].iloc[0])
        sub_seed = (seed + hash64_int(key)) % (2**32)
        n = max(min_per_stratum, int(round(len(g) * frac)))
        n = min(n, len(g))
        return g.sort_values(list(g.columns)).sample(
            n=n, random_state=np.random.RandomState(sub_seed)
        )

    return ds.groupby(strata_column).map_groups(take, batch_format="pandas")


def blocked_sample_pairs(
    records: dict,
    predicates: list,
    sample_size: int,
    seed: int = 42,
) -> set[tuple]:
    """Blocked pair sampling: scan shuffled records per predicate; the first
    two ids sharing a key form a sample pair; predicates that stop yielding
    are retired and sampling stops when the growth rate collapses — the
    reference's round-robin sampler
    (/root/reference/dedupe_extension/dedupe/dedupe/sampling.py:11-97),
    seeded instead of wall-clock random."""
    rng = np.random.default_rng(seed)
    ids = sorted(records)
    sample: set[tuple] = set()
    live = list(predicates)
    previous = 0
    while len(sample) < sample_size and live:
        order = rng.permutation(len(ids))
        per_pred = max(1, (sample_size - len(sample)) // len(live))
        still_live = []
        for pred in live:
            block_dict: dict = {}
            got = 0
            start = int(rng.integers(0, len(ids)))  # rotate analogue
            for k in range(len(ids)):
                rid = ids[order[(start + k) % len(ids)]]
                keys = pred(records[rid])
                for key in keys:
                    if key not in block_dict:
                        block_dict[key] = rid
                    else:
                        a = block_dict.pop(key)
                        pair = (a, rid) if a < rid else (rid, a)
                        sample.add(pair)
                        got += 1
                        break
                if got >= per_pred or len(sample) >= sample_size:
                    break
            if got:
                still_live.append(pred)
        growth = len(sample) - previous
        if growth / max(sample_size - previous, 1) < 0.001:
            break
        previous = len(sample)
        live = still_live
    return sample


def uncertain_pairs(
    scores, n: int = 1
):
    """Active-learning query selection: the ``n`` pairs whose match score is
    closest to 0.5 — the RLRLearner uncertainty ``pop()``
    (/root/reference/dedupe_extension/dedupe/dedupe/labeler.py:87-168).
    ``scores``: pandas DataFrame (id_a, id_b, score)."""
    s = scores.copy()
    s["uncertainty"] = (s["score"] - 0.5).abs()
    s = s.sort_values(["uncertainty", "id_a", "id_b"]).head(n)
    return list(zip(s["id_a"], s["id_b"]))


def hash64_int(s: str) -> int:
    """Deterministic string hash (FNV-1a) — Python hash() is randomized."""
    h = 14695981039346656037
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 1099511628211) % (1 << 64)
    return h


def blocked_sample_pairs_link(
    records_a: dict,
    records_b: dict,
    predicates: list,
    sample_size: int,
    seed: int = 42,
) -> set[tuple]:
    """Cross-set blocked pair sampling for RecordLink active learning —
    the link variant of the round-robin sampler
    (/root/reference/dedupe_extension/dedupe/dedupe/sampling.py:100-178):
    per predicate, index rotating-scanned A-side keys, then pair each
    B-side record with the first A record sharing a key.  Seeded."""
    rng = np.random.default_rng(seed)
    ids_a = sorted(records_a)
    ids_b = sorted(records_b)
    sample: set[tuple] = set()
    live = list(predicates)
    previous = 0
    while len(sample) < sample_size and live and ids_a and ids_b:
        order_a = rng.permutation(len(ids_a))
        order_b = rng.permutation(len(ids_b))
        per_pred = max(1, (sample_size - len(sample)) // len(live))
        still_live = []
        for pred in live:
            block: dict = {}
            start = int(rng.integers(0, len(ids_a)))
            for k in range(len(ids_a)):
                rid = ids_a[order_a[(start + k) % len(ids_a)]]
                for key in pred(records_a[rid]):
                    block.setdefault(key, rid)
            got = 0
            start_b = int(rng.integers(0, len(ids_b)))
            for k in range(len(ids_b)):
                rid = ids_b[order_b[(start_b + k) % len(ids_b)]]
                for key in pred(records_b[rid]):
                    a = block.get(key)
                    if a is not None and (a, rid) not in sample:
                        sample.add((a, rid))
                        got += 1
                        break
                if got >= per_pred or len(sample) >= sample_size:
                    break
            if got:
                still_live.append(pred)
        growth = len(sample) - previous
        if growth / max(sample_size - previous, 1) < 0.001:
            break
        previous = len(sample)
        live = still_live
    return sample
