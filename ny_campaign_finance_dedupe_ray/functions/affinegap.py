"""Affine-gap string distance (Gotoh algorithm with the abbreviation
discount of the public ``affinegap`` package the reference depends on —
/root/reference/dedupe_extension/dedupe/setup.py:11-25; comparator used for
String variables at variables/string.py:60-66 and canonicalization at
canonical.py:5-45).

Fresh Python implementation; behavior validated against the reference's own
canonicalization expectations ('mary crane' centroid,
tests/test_canonical.py:6-35).  Default weights are the package's published
defaults: match 1, mismatch 11, gap-open 10, gap-extend 7, abbreviation
scale 1/8 (trailing gaps in the longer string are discounted, so
"mary crane" vs "mary crane center" scores as an abbreviation, not 6 gaps).
"""

from __future__ import annotations


def affine_gap_distance(
    string_a: str,
    string_b: str,
    match_weight: float = 1.0,
    mismatch_weight: float = 11.0,
    gap_weight: float = 10.0,
    space_weight: float = 7.0,
    abbreviation_scale: float = 0.125,
) -> float:
    if string_a == string_b and match_weight == min(
        match_weight, mismatch_weight, gap_weight
    ):
        return match_weight * len(string_a)
    s1, s2 = string_a, string_b
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    n1, n2 = len(s1), len(s2)
    if n2 == 0:
        # pure abbreviation: all of s1 is a discounted trailing gap
        return (gap_weight + space_weight * n1) * abbreviation_scale

    INF = float("inf")
    # V[j]: best alignment score of s2[:i] vs s1[:j]; D[j]: ending in a gap
    # in s2 (char of s1 deleted)
    V_prev = [0.0] * (n1 + 1)
    V_cur = [0.0] * (n1 + 1)
    D = [INF] * (n1 + 1)
    for j in range(1, n1 + 1):
        if j <= n2:
            V_cur[j] = gap_weight + space_weight * j
        else:
            # beyond the length of the shorter string: discounted
            V_cur[j] = V_cur[j - 1] + space_weight * abbreviation_scale
    for i in range(1, n2 + 1):
        c2 = s2[i - 1]
        V_prev, V_cur = V_cur, V_prev
        V_cur[0] = gap_weight + space_weight * i
        I = INF
        for j in range(1, n1 + 1):
            c1 = s1[j - 1]
            if j <= n2:
                I = min(I, V_cur[j - 1] + gap_weight) + space_weight
            else:
                I = (
                    min(I, V_cur[j - 1] + gap_weight * abbreviation_scale)
                    + space_weight * abbreviation_scale
                )
            D[j] = min(D[j], V_prev[j] + gap_weight) + space_weight
            M = V_prev[j - 1] + (match_weight if c1 == c2 else mismatch_weight)
            V_cur[j] = min(I, D[j], M)
    return V_cur[n1]


def normalized_affine_gap_distance(
    string_a: str,
    string_b: str,
    match_weight: float = 1.0,
    mismatch_weight: float = 11.0,
    gap_weight: float = 10.0,
    space_weight: float = 7.0,
    abbreviation_scale: float = 0.125,
) -> float:
    normalizer = len(string_a) + len(string_b)
    if normalizer == 0:
        raise ZeroDivisionError(
            "normalized affine gap distance of two empty strings is undefined"
        )
    return (
        affine_gap_distance(
            string_a,
            string_b,
            match_weight,
            mismatch_weight,
            gap_weight,
            space_weight,
            abbreviation_scale,
        )
        / normalizer
    )
