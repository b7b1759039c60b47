"""Field comparators beyond the DuckDB-backed string distances — the rest
of the reference's variable comparators (SURVEY.md §2.5):

- cosine_text / cosine_set: TF cosine similarity over tokens / set elements
  (variables/string.py:78-93, variables/set.py:21-27)
- exact_compare (variables/exact.py:9-14)
- categorical_dummies (variables/categorical_type.py:18-34)
- haversine_sqrt: sqrt of haversine distance (variables/latlong.py:13-15)
- price_difference: |log10 p1 - log10 p2| (variables/price.py:12-19)
- exists_dummies (variables/exists.py:25-35)

All return numpy arrays when given sequences (vectorized where the math
allows) and floats for scalars; NaN marks missing, matching the reference's
missing-data convention (datamodel.py:74-115)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np


def cosine_text(a: str | None, b: str | None) -> float:
    """TF cosine similarity over whitespace tokens."""
    if not a or not b:
        return np.nan
    ca, cb = Counter(a.split()), Counter(b.split())
    common = set(ca) & set(cb)
    num = sum(ca[t] * cb[t] for t in common)
    den = math.sqrt(sum(v * v for v in ca.values())) * math.sqrt(
        sum(v * v for v in cb.values())
    )
    return num / den if den else 0.0


def cosine_set(a, b) -> float:
    """Cosine similarity of two sets (binary vectors)."""
    if not a or not b:
        return np.nan
    sa, sb = set(a), set(b)
    den = math.sqrt(len(sa)) * math.sqrt(len(sb))
    return len(sa & sb) / den if den else 0.0


def exact_compare(a, b) -> float:
    if a is None or b is None:
        return np.nan
    return 1.0 if a == b else 0.0


def categorical_dummies(value, categories: list) -> np.ndarray:
    """Dummy expansion: len(categories)-1 indicator columns (first category
    is the reference level), NaN row when missing."""
    k = len(categories) - 1
    if value is None:
        return np.full(k, np.nan)
    out = np.zeros(k)
    if value in categories:
        i = categories.index(value)
        if i > 0:
            out[i - 1] = 1.0
    return out


_EARTH_RADIUS_KM = 6371.0088  # mean Earth radius, the haversine package's unit


def haversine_sqrt(latlong_a, latlong_b) -> float:
    """sqrt(haversine distance in km) — the LatLong comparator
    (variables/latlong.py:13-15: ``sqrt(haversine(x, y))`` where haversine
    returns kilometers; weights ported from a reference settings file expect
    this scale)."""
    if not latlong_a or not latlong_b:
        return np.nan
    lat1, lon1 = (math.radians(x) for x in latlong_a)
    lat2, lon2 = (math.radians(x) for x in latlong_b)
    dlat, dlon = lat2 - lat1, lon2 - lon1
    h = (
        math.sin(dlat / 2) ** 2
        + math.cos(lat1) * math.cos(lat2) * math.sin(dlon / 2) ** 2
    )
    angle = 2 * math.asin(math.sqrt(min(h, 1.0)))
    return math.sqrt(angle * _EARTH_RADIUS_KM)


def batch_haversine_sqrt(latlongs_a, latlongs_b) -> np.ndarray:
    """Vectorized ``haversine_sqrt`` over sequences of (lat, lon) pairs;
    NaN where either side is missing/empty."""
    n = len(latlongs_a)
    A = np.full((n, 2), np.nan)
    B = np.full((n, 2), np.nan)
    for i, v in enumerate(latlongs_a):
        if v is not None and len(v) == 2:
            A[i] = v
    for i, v in enumerate(latlongs_b):
        if v is not None and len(v) == 2:
            B[i] = v
    A = np.radians(A)
    B = np.radians(B)
    dlat = B[:, 0] - A[:, 0]
    dlon = B[:, 1] - A[:, 1]
    h = (
        np.sin(dlat / 2) ** 2
        + np.cos(A[:, 0]) * np.cos(B[:, 0]) * np.sin(dlon / 2) ** 2
    )
    with np.errstate(invalid="ignore"):
        angle = 2 * np.arcsin(np.sqrt(np.minimum(h, 1.0)))
        return np.sqrt(angle * _EARTH_RADIUS_KM)


def price_difference(p1, p2) -> float:
    """|log10 p1 - log10 p2|; NaN for non-positive/missing prices."""
    if p1 is None or p2 is None or p1 <= 0 or p2 <= 0:
        return np.nan
    return abs(math.log10(p1) - math.log10(p2))


def exists_dummies(a, b) -> np.ndarray:
    """2 dummies from presence pattern: (both present, exactly one)."""
    pa_, pb = bool(a), bool(b)
    if pa_ and pb:
        return np.array([1.0, 0.0])
    if pa_ or pb:
        return np.array([0.0, 1.0])
    return np.array([0.0, 0.0])
