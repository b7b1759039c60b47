"""Hierarchical agglomerative clustering in pure numpy (no scipy in this
environment): centroid (UPGMC) linkage via the Lance-Williams update, plus a
flat-cluster cut at a distance threshold.

Mirrors the reference's fastcluster.linkage(method='centroid') +
hcluster.fcluster(criterion='distance')
(/root/reference/dedupe_extension/dedupe/dedupe/clustering.py:215-224).
Runs per connected component inside a ``map_groups`` task; components are
bounded by the oversized-component refilter (clustering.py:74-98), so the
dense O(N^2) matrix here is small.
"""

from __future__ import annotations

import numpy as np


def centroid_linkage(D: np.ndarray) -> list[tuple[int, int, float, int]]:
    """Agglomerative centroid linkage on a dense symmetric distance matrix.

    Returns merge list [(i, j, height, new_size)] where i, j are cluster
    indices (leaves 0..N-1, merges N, N+1, ...), matching the standard
    linkage encoding.  Lance-Williams (UPGMC) on squared distances:
        d(k, ij)^2 = (ni d(ki)^2 + nj d(kj)^2)/(ni+nj)
                     - ni nj d(ij)^2 / (ni+nj)^2
    """
    N = D.shape[0]
    if N < 2:
        return []
    D2 = (D.astype(np.float64)) ** 2
    np.fill_diagonal(D2, np.inf)
    size = np.ones(N, dtype=np.int64)
    cluster_id = np.arange(N)  # current linkage id per active row
    active = np.ones(N, dtype=bool)
    merges: list[tuple[int, int, float, int]] = []
    next_id = N
    for _ in range(N - 1):
        # nearest active pair
        sub = np.where(active)[0]
        block = D2[np.ix_(sub, sub)]
        flat = np.argmin(block)
        ai, aj = divmod(flat, len(sub))
        i, j = sub[ai], sub[aj]
        if i > j:
            i, j = j, i
        h2 = D2[i, j]
        h = float(np.sqrt(max(h2, 0.0)))
        ni, nj = size[i], size[j]
        merges.append((int(cluster_id[i]), int(cluster_id[j]), h, int(ni + nj)))
        # Lance-Williams update into row/col i
        k = active.copy()
        k[i] = k[j] = False
        dk = (ni * D2[i, k] + nj * D2[j, k]) / (ni + nj) - (
            ni * nj * h2
        ) / (ni + nj) ** 2
        D2[i, k] = dk
        D2[k, i] = dk
        D2[i, i] = np.inf
        active[j] = False
        size[i] = ni + nj
        cluster_id[i] = next_id
        next_id += 1
    return merges


def fcluster_distance(
    merges: list[tuple[int, int, float, int]], n_leaves: int, t: float
) -> np.ndarray:
    """Flat clusters: leaves joined iff every merge on their path has
    (monotonized) height <= t.  Heights are monotonized by taking the max
    over children, the standard guard for non-monotone centroid linkage."""
    labels = np.arange(n_leaves, dtype=np.int64)
    if not merges:
        return labels
    # effective (monotone) height per merge node
    eff: dict[int, float] = {}
    members: dict[int, list[int]] = {}

    def leaf_members(idx: int) -> list[int]:
        return members[idx] if idx >= n_leaves else [idx]

    parent = np.arange(n_leaves, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    node = n_leaves
    for i, j, h, _ in merges:
        hi = eff.get(i, 0.0) if i >= n_leaves else 0.0
        hj = eff.get(j, 0.0) if j >= n_leaves else 0.0
        eh = max(h, hi, hj)
        eff[node] = eh
        mem = leaf_members(i) + leaf_members(j)
        members[node] = mem
        if eh <= t:
            r = find(mem[0])
            for m in mem[1:]:
                parent[find(m)] = r
        node += 1
    out = np.empty(n_leaves, dtype=np.int64)
    for leaf in range(n_leaves):
        out[leaf] = find(leaf)
    return out
