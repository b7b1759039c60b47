"""Labeled-training-pair interchange: the reference's training JSON
(match/distinct pair lists with tuple tagging,
/root/reference/dedupe_extension/dedupe/dedupe/serializer.py:4-31, written
and read at api.py:995-1067) as plain JSON round-trippable files, plus a
golden-key corpus -> labeled pairs builder (convenience.py:112-237)."""

from __future__ import annotations

import itertools
import json

import numpy as np


def save_training(path: str, match: list[tuple[dict, dict]], distinct: list[tuple[dict, dict]]) -> None:
    payload = {
        "match": [[a, b] for a, b in match],
        "distinct": [[a, b] for a, b in distinct],
    }
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)


def load_training(path: str) -> tuple[list[tuple[dict, dict]], list[tuple[dict, dict]]]:
    with open(path) as f:
        d = json.load(f)
    match = [tuple(p) for p in d.get("match", [])]
    distinct = [tuple(p) for p in d.get("distinct", [])]
    return match, distinct


def training_pairs_from_golden(
    records: dict[str, dict],
    golden_key: str = "unique_id",
    n_distinct: int = 1000,
    seed: int = 42,
) -> tuple[list[tuple[dict, dict]], list[tuple[dict, dict]]]:
    """All within-entity pairs as matches + a seeded sample of cross-entity
    pairs as distinct (convenience.py:206-226 semantics)."""
    by_key: dict = {}
    for rid, rec in records.items():
        by_key.setdefault(rec[golden_key], []).append(rid)
    match = []
    for ids in by_key.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            match.append((records[a], records[b]))
    rng = np.random.default_rng(seed)
    ids = sorted(records)
    distinct = []
    tries = 0
    while len(distinct) < n_distinct and tries < n_distinct * 20:
        tries += 1
        i, j = rng.integers(0, len(ids), 2)
        a, b = ids[int(i)], ids[int(j)]
        if a == b or records[a][golden_key] == records[b][golden_key]:
            continue
        distinct.append((records[a], records[b]))
    return match, distinct
