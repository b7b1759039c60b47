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

import numpy as np


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


# ---------------------------------------------------------------------------
# batch-vectorized Gotoh DP
# ---------------------------------------------------------------------------
#
# The scalar recurrence above is, per row i of the shorter string:
#   D_j = min(D_j, V_prev_j + gap) + space                (previous-row only)
#   M_j = V_prev_{j-1} + match/mismatch                   (previous-row only)
#   I_j = min(I_{j-1}, V_cur_{j-1} + g_j) + sp_j          (sequential in j)
#   V_cur_j = min(I_j, D_j, M_j)
# The only j-sequential dependency is I <-> V_cur.  Substituting
# V_cur_{j-1} = min(I_{j-1}, C_{j-1}) with C = min(D, M) and using g_j >= 0:
#   I_j = min(I_{j-1} + sp_j, C'_{j-1} + g_j + sp_j)
# and with the cumulative-space transform J_j = I_j - cs_j (cs_j = sum of
# sp_1..sp_j, per row — the abbreviation discount makes sp depend on both
# the row and the column):
#   J_j = min(J_{j-1}, C'_{j-1} + g_j - cs_{j-1})
# i.e. one np.minimum.accumulate along j per row of the shorter string,
# vectorized across the whole pair batch.  Cost: max_n2 passes over a
# (chunk_rows x max_n1) float matrix; pairs are chunked sorted by length so
# padding waste stays bounded.

_CHUNK_ROWS = 512
_CHUNK_CELLS = 4_000_000  # rows x max_n1 ceiling per DP chunk (~32 MB/array)


def _pad_codepoints(strs: list, maxlen: int) -> np.ndarray:
    m = np.zeros((len(strs), maxlen), dtype=np.uint32)
    for i, s in enumerate(strs):
        if s:
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            m[i, : len(cp)] = cp
    return m


def _batch_affine_gap_chunk(
    long_strs: list,
    short_strs: list,
    match_weight: float,
    mismatch_weight: float,
    gap_weight: float,
    space_weight: float,
    abbreviation_scale: float,
) -> np.ndarray:
    """Affine-gap distances for one chunk; every pair pre-sorted so
    len(long) >= len(short) and len(short) >= 1."""
    n_rows = len(long_strs)
    n1 = np.array([len(s) for s in long_strs], dtype=np.int64)
    n2 = np.array([len(s) for s in short_strs], dtype=np.int64)
    max_n1 = int(n1.max())
    max_n2 = int(n2.max())
    S1 = _pad_codepoints(long_strs, max_n1)
    S2 = _pad_codepoints(short_strs, max_n2)

    J = np.arange(1, max_n1 + 1, dtype=np.float64)  # column index 1..max_n1
    disc = J[None, :] > n2[:, None]  # abbreviation region per row
    g_col = np.where(disc, gap_weight * abbreviation_scale, gap_weight)
    # cs[:, j] = sum of space weights for columns 1..j (cs[:, 0] = 0)
    cs = np.empty((n_rows, max_n1 + 1), dtype=np.float64)
    cs[:, 0] = 0.0
    cs[:, 1:] = space_weight * np.minimum(
        J[None, :], n2[:, None].astype(np.float64)
    ) + space_weight * abbreviation_scale * np.maximum(
        J[None, :] - n2[:, None], 0.0
    )
    # koff[:, j-1] = g_j - cs_{j-1}: the j-constant part of K (precomputed
    # so the inner loop is pure preallocated out= kernels)
    koff = g_col.copy()
    koff[:, 1:] -= cs[:, 1:-1]

    INF = np.inf
    # i = 0 row: V0[j] = gap + cs[j] for j >= 1 (both regions collapse to
    # this closed form), V0[0] = 0
    V_prev = np.empty((n_rows, max_n1 + 1), dtype=np.float64)
    V_prev[:, 0] = 0.0
    V_prev[:, 1:] = gap_weight + cs[:, 1:]
    V_cur = np.empty_like(V_prev)
    D = np.full((n_rows, max_n1), INF, dtype=np.float64)
    M = np.empty((n_rows, max_n1), dtype=np.float64)
    T = np.empty((n_rows, max_n1), dtype=np.float64)
    K = np.empty((n_rows, max_n1), dtype=np.float64)
    eq = np.empty((n_rows, max_n1), dtype=bool)
    out = np.empty(n_rows, dtype=np.float64)
    delta = mismatch_weight - match_weight
    # rows that are all-abbreviation at i == n2 == 0 never occur here
    # (n2 >= 1 guaranteed by caller)
    for i in range(1, max_n2 + 1):
        c2 = S2[:, i - 1]
        np.equal(S1, c2[:, None], out=eq)
        # M = V_prev[:, :-1] + (mismatch - delta*eq)
        np.multiply(eq, delta, out=M, casting="unsafe")
        np.subtract(mismatch_weight, M, out=M)
        M += V_prev[:, :-1]
        # D = min(D, V_prev[:, 1:] + gap) + space
        np.add(V_prev[:, 1:], gap_weight, out=T)
        np.minimum(D, T, out=D)
        D += space_weight
        np.minimum(D, M, out=M)  # M is now C = min(D, M), col j at j-1
        v0 = gap_weight + space_weight * i
        # K_j = C'_{j-1} + g_j - cs_{j-1}; C'_0 is the j=0 boundary v0
        K[:, 0] = v0 + koff[:, 0]
        np.add(M[:, :-1], koff[:, 1:], out=K[:, 1:])
        np.minimum.accumulate(K, axis=1, out=K)
        K += cs[:, 1:]  # K is now I
        V_cur[:, 0] = v0
        np.minimum(K, M, out=V_cur[:, 1:])
        done = n2 == i
        if done.any():
            out[done] = V_cur[done, n1[done]]
        V_prev, V_cur = V_cur, V_prev
    return out


def batch_affine_gap_distance(
    strings_a: "list | np.ndarray",
    strings_b: "list | np.ndarray",
    match_weight: float = 1.0,
    mismatch_weight: float = 11.0,
    gap_weight: float = 10.0,
    space_weight: float = 7.0,
    abbreviation_scale: float = 0.125,
) -> np.ndarray:
    """Vectorized ``affine_gap_distance`` over pair lists.  None is treated
    as the empty string (callers that want NaN-for-missing mask first)."""
    a = ["" if s is None else s for s in strings_a]
    b = ["" if s is None else s for s in strings_b]
    n = len(a)
    out = np.empty(n, dtype=np.float64)
    la = np.array([len(s) for s in a], dtype=np.int64)
    lb = np.array([len(s) for s in b], dtype=np.int64)
    # orient: s1 = longer, s2 = shorter
    swap = la < lb
    n1 = np.where(swap, lb, la)
    n2 = np.where(swap, la, lb)

    # fast paths, mirroring the scalar function
    equal = np.array([x == y for x, y in zip(a, b)], dtype=bool)
    if match_weight == min(match_weight, mismatch_weight, gap_weight):
        out[equal] = match_weight * la[equal]
    else:
        equal = np.zeros(n, dtype=bool)
    empty_short = (~equal) & (n2 == 0)
    out[empty_short] = (
        gap_weight + space_weight * n1[empty_short]
    ) * abbreviation_scale

    todo = np.flatnonzero(~(equal | empty_short))
    if len(todo):
        # chunk sorted by (n2, n1) so each DP pays its own chunk's max
        # lengths, not the global max; chunk boundaries bound rows x max_n1
        # so a few huge strings don't blow the DP matrices up
        order = todo[np.lexsort((n1[todo], n2[todo]))]
        bounds = [0]
        rows = 0
        cur_max_n1 = 0
        for pos, i in enumerate(order):
            # cell bound must use the chunk's RUNNING max n1: sorted by
            # (n2, n1), a huge-n1/small-n2 outlier lands early in the chunk
            # and later short rows would otherwise inflate rows x outlier_n1
            # without ever re-tripping the bound — split BEFORE adding the
            # row that would exceed the cell budget (a lone oversize string
            # still gets its own single-row chunk)
            nxt_max = max(cur_max_n1, int(n1[i]))
            if rows and (rows >= _CHUNK_ROWS or (rows + 1) * nxt_max > _CHUNK_CELLS):
                bounds.append(pos)
                rows = 0
                nxt_max = int(n1[i])
            rows += 1
            cur_max_n1 = nxt_max
        if bounds[-1] != len(order):
            bounds.append(len(order))
        for s, e in zip(bounds[:-1], bounds[1:]):
            idx = order[s:e]
            longs = [a[i] if not swap[i] else b[i] for i in idx]
            shorts = [b[i] if not swap[i] else a[i] for i in idx]
            out[idx] = _batch_affine_gap_chunk(
                longs,
                shorts,
                match_weight,
                mismatch_weight,
                gap_weight,
                space_weight,
                abbreviation_scale,
            )
    return out


def batch_normalized_affine_gap(
    strings_a: "list | np.ndarray",
    strings_b: "list | np.ndarray",
    **weights,
) -> np.ndarray:
    """Vectorized ``normalized_affine_gap_distance``; NaN where either side
    is missing/empty (the scoring missing-data rule), instead of the scalar
    version's ZeroDivisionError on empty-empty."""
    a = ["" if s is None else s for s in strings_a]
    b = ["" if s is None else s for s in strings_b]
    dist = batch_affine_gap_distance(a, b, **weights)
    la = np.array([len(s) for s in a], dtype=np.float64)
    lb = np.array([len(s) for s in b], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = dist / (la + lb)
    out[(la == 0) | (lb == 0)] = np.nan
    return out


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
