"""Transitive clustering: connected components + per-component hierarchical
clustering + confidences + singletons.

Reference semantics (/root/reference/dedupe_extension/dedupe/dedupe/
clustering.py):
- union-find over the scored edge list (:101-152);
- components with more than ``max_components`` nodes are re-filtered at a
  raised threshold sigmoid(logit(min_score)+1) and recursed (:74-98) —
  the skew/hot-key bound, kept verbatim;
- per component: condensed distances 1-score (unscored pairs = 1.0,
  :155-193), centroid linkage + flat cut at 1-threshold (:196-238);
- per-record confidence 1 - sqrt(sum (1-phi)^2 / (N-1)) (:241-262);
- singleton records appended with confidence 1.0 (api.py:186-195);
- canonical cluster_id := min member record id
  (campaign_finance_dedupe.py:105-110 uses first member; min is the
  deterministic, order-free equivalent).

Ray mapping: components via driver union-find for small edge sets or
distributed min-neighbor edge contraction with pointer-jump compression
(hash-partitioned groupbys; ``cc_labels``) for large ones; per-component work is a
``groupby(component).map_groups`` — components are colocated by the shuffle
and bounded by the refilter rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.linkage import centroid_linkage, fcluster_distance
from ..functions.hashing import hash64_str


# --------------------------------------------------------------------------
# union-find (driver scale)
# --------------------------------------------------------------------------

class UnionFind:
    """Path-compressed, union-by-size union-find over arbitrary ids."""

    def __init__(self) -> None:
        self.parent: dict = {}
        self.size: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return ra
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]
        return ra


def numpy_components(ids_a: np.ndarray, ids_b: np.ndarray) -> np.ndarray:
    """Per-edge component labels, fully vectorized: factorize ids to dense
    ints (pandas hash factorize, C speed for strings), then
    Shiloach-Vishkin-style min-label hooking (``np.minimum.at`` over the
    edge endpoints' current roots) alternated with pointer jumping
    (``parent = parent[parent]``) until every edge is monochrome.
    O(E·α-ish) work over ~log(diameter) numpy rounds — replaces the former
    per-edge Python dict union-find, which cost minutes at the 20M-edge
    ``DRIVER_CC_EDGE_LIMIT`` (2M edges: ~0.9 s here vs ~17 s dict).

    The returned label is the component's first-appearance member id (an
    arbitrary but deterministic-for-a-given-edge-order canonical choice,
    like the old union-find root); downstream cluster ids are derived from
    membership, not from this label."""
    codes, nodes = pd.factorize(np.concatenate([ids_a, ids_b]))
    n_edges = len(ids_a)
    u0 = codes[:n_edges]
    v0 = codes[n_edges:]
    u, v = u0, v0
    parent = np.arange(len(nodes), dtype=np.int64)
    while True:
        pu, pv = parent[u], parent[v]
        # an edge whose endpoints share a root stays merged forever (parents
        # only ever decrease, jumps preserve equality) — drop it, so each
        # round works a geometrically shrinking frontier
        active = pu != pv
        if not active.any():
            break
        u, v, pu, pv = u[active], v[active], pu[active], pv[active]
        mn = np.minimum(pu, pv)
        np.minimum.at(parent, pu, mn)
        np.minimum.at(parent, pv, mn)
        while True:  # pointer-jump to full compression
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
    return np.asarray(nodes)[parent[u0]]


def _refilter_components(
    df: pd.DataFrame, max_components: int, _depth: int = 0
) -> pd.DataFrame:
    """Assign a 'component' column via vectorized connected components;
    recursively re-filter oversized components at a raised threshold
    (clustering.py:74-98).

    The oversize scan is vectorized: unique-node counts per component come
    from one drop_duplicates + value_counts, and only genuinely oversized
    components (rare — they exist only under degenerate blocking) are
    visited in Python; the common all-small case passes straight through."""
    ids_a = df["id_a"].to_numpy()
    ids_b = df["id_b"].to_numpy()
    comp = numpy_components(ids_a, ids_b)
    df = df.assign(component=comp)
    # unique node count per component, vectorized over both endpoints
    nodes = pd.DataFrame(
        {
            "node": np.concatenate([ids_a, ids_b]),
            "component": np.concatenate([comp, comp]),
        }
    ).drop_duplicates()
    n_nodes = nodes["component"].value_counts()
    big = set(n_nodes[n_nodes > max_components].index)
    if not big or _depth >= 20:
        return df
    big_mask = df["component"].isin(big)
    out_parts: list[pd.DataFrame] = [df[~big_mask]]
    for comp_id, sub in df[big_mask].groupby("component", sort=False):
        min_score = float(sub["score"].min())
        logit = np.log(min_score) - np.log(1 - min_score)
        threshold = 1.0 / (1.0 + np.exp(-logit - 1))
        sub2 = sub.sort_values("score")
        cut = int(np.searchsorted(sub2["score"].to_numpy(), threshold))
        sub2 = sub2.iloc[max(cut, 2):]
        if len(sub2):
            refiltered = _refilter_components(
                sub2.drop(columns="component"), max_components, _depth + 1
            )
            refiltered = refiltered.assign(
                component=str(comp_id) + "/" + refiltered["component"].astype(str)
            )
            out_parts.append(refiltered)
    return pd.concat(out_parts, ignore_index=True)


def connected_components_driver(
    scores: "ray.data.Dataset", max_components: int = 30000
) -> "ray.data.Dataset":
    """Small/medium edge sets: collect the edge list (ids+score only, a few
    tens of bytes/row), label on the driver, return a Dataset with a
    'component' column.  Used below a size cutoff; the distributed path
    handles the rest."""
    df = scores.select_columns(["id_a", "id_b", "score"]).to_pandas()
    if df.empty:
        return ray.data.from_pandas(
            pd.DataFrame({"id_a": [], "id_b": [], "score": [], "component": []})
        )
    labeled = _refilter_components(df, max_components)
    labeled["component"] = labeled["component"].astype(str)
    return ray.data.from_pandas(labeled)


# --------------------------------------------------------------------------
# distributed connected components (scale path): edge contraction
# (default) + min-label propagation (cross-check variant)
# --------------------------------------------------------------------------

def _node_bucket(t: pa.Table, col: str, n_buckets: int) -> pa.Table:
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    h = hash64_str(c.cast(pa.string()))
    return t.append_column(
        "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
    )


def cc_labels_propagation(
    edges: "ray.data.Dataset",
    max_iter: int = 25,
    n_buckets: int = 64,
    stats: dict | None = None,
) -> "ray.data.Dataset":
    """EDGES(id_a, id_b) -> LABELS(node, label): distributed
    connected-components as iterative hash-partitioned min-label
    propagation (SURVEY.md §7.6).  ``label`` is the lexicographic-min member
    id as a string (matching the driver union-find's canonical choice).

    This is the simple O(diameter)-round algorithm; it re-shuffles the FULL
    adjacency every round, so its wall cost is rounds x 2 x |E| rows of
    exchange regardless of convergence progress.  ``cc_labels`` (the
    default used by the pipelines) is the edge-contraction variant, which
    shrinks the shuffled edge set geometrically each round; this version is
    kept as the independently-implemented cross-check (tests assert
    contract == propagate == driver on randomized graphs).

    Each round is two bucketed shuffles with fully vectorized pandas merges
    inside the bucket tasks (never per-node dispatch):
      (1) labels ⨝ adjacency on node -> label messages to neighbors,
      (2) per-node min over messages -> new labels.
    Converges in O(component diameter) rounds (near-dup components are
    shallow); early exit via a global label fingerprint (sum of
    hash64(node|label) mod 2^40 — two equal consecutive fingerprints =>
    fixpoint).  No driver-side materialization of edges or labels.
    ``stats`` (optional dict) receives ``cc_rounds`` — the number of
    propagation rounds actually executed, for run manifests/benchmarks.
    """
    from ray.data.aggregate import Sum

    def edge_msgs(t: pa.Table) -> pa.Table:
        a = t.column("id_a").cast(pa.string())
        b = t.column("id_b").cast(pa.string())
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays([b, a]),
            }
        )

    adj = (
        edges.select_columns(["id_a", "id_b"])
        .map_batches(edge_msgs, batch_format="pyarrow")
        .map_batches(
            lambda t: _node_bucket(t, "node", n_buckets), batch_format="pyarrow"
        )
        .materialize()  # reused every round
    )

    # initial labels: min(self, neighbors) per node, vectorized per bucket
    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node")["nbr"].min().reset_index(name="label")
        m["label"] = np.minimum(m["node"], m["label"])
        return m

    labels = adj.groupby("bucket").map_groups(init_labels, batch_format="pandas")

    def fingerprint_batch(t: pa.Table) -> pa.Table:
        joined = pa.compute.binary_join_element_wise(
            t.column("node"), t.column("label"), "|"
        )
        h = hash64_str(joined)
        # small modulus: the per-batch partials are later Sum-aggregated,
        # so each must leave headroom in int64 for thousands of batches
        fp = int(h.sum(dtype=np.uint64) % np.uint64(1 << 40))
        return pa.table({"fp": pa.array([fp], pa.int64())})

    def global_fp(lab: "ray.data.Dataset") -> int:
        return lab.map_batches(fingerprint_batch, batch_format="pyarrow").aggregate(
            Sum("fp", alias_name="fp")
        )["fp"]

    prev_fp = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        lab_tagged = labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "nbr": pa.array([None] * t.num_rows, pa.string()),
                    "label": t.column("label"),
                }
            ),
            batch_format="pyarrow",
        ).map_batches(
            lambda t: _node_bucket(t, "node", n_buckets), batch_format="pyarrow"
        )

        def propagate(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["nbr"].isna()][["node", "label"]].drop_duplicates("node")
            edges_ = g[g["nbr"].notna()][["node", "nbr"]]
            sent = edges_.merge(lab, on="node", how="left")
            sent["label"] = sent["label"].fillna(sent["node"])
            msgs = sent[["nbr", "label"]].rename(columns={"nbr": "node"})
            return pd.concat([lab, msgs], ignore_index=True)

        msgs = (
            lab_tagged.union(
                adj.map_batches(
                    lambda t: pa.table(
                        {
                            "node": t.column("node"),
                            "nbr": t.column("nbr"),
                            "label": pa.array([None] * t.num_rows, pa.string()),
                        }
                    ),
                    batch_format="pyarrow",
                ).map_batches(
                    lambda t: _node_bucket(t, "node", n_buckets),
                    batch_format="pyarrow",
                )
            )
            .groupby("bucket")
            .map_groups(propagate, batch_format="pandas")
        )

        def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node")["label"].min().reset_index(name="label")

        labels = (
            msgs.map_batches(
                lambda t: _node_bucket(t, "node", n_buckets), batch_format="pyarrow"
            )
            .groupby("bucket")
            .map_groups(reduce_min, batch_format="pandas")
            .materialize()
        )
        fp = global_fp(labels)
        if prev_fp is not None and fp == prev_fp:
            break
        prev_fp = fp
    if stats is not None:
        stats["cc_rounds"] = rounds
        stats["cc_algo"] = "propagate"
    return labels


def _rewrite_through(
    ds: "ray.data.Dataset",
    key_col: str,
    keep_cols: list[str],
    mapping: "ray.data.Dataset",
    n_buckets: int,
) -> "ray.data.Dataset":
    """Rewrite ``ds[key_col]`` through ``mapping(node -> root)``: rows whose
    key appears in the mapping get the mapped root, others keep their key —
    one bucketed groupby (the attach pattern), all columns string."""

    def tag_rows(t: pa.Table) -> pa.Table:
        cols = {"_k": t.column(key_col)}
        for c in keep_cols:
            cols[c] = t.column(c)
        cols["_root"] = pa.nulls(t.num_rows, pa.string())
        return pa.table(cols)

    def tag_map(t: pa.Table) -> pa.Table:
        cols = {"_k": t.column("node")}
        for c in keep_cols:
            cols[c] = pa.nulls(t.num_rows, pa.string())
        cols["_root"] = t.column("root")
        return pa.table(cols)

    def apply(g: pd.DataFrame) -> pd.DataFrame:
        m = g[g["_root"].notna()][["_k", "_root"]].drop_duplicates("_k")
        e = g[g["_root"].isna()][["_k", *keep_cols]]
        out = e.merge(m, on="_k", how="left")
        out["_k"] = out["_root"].fillna(out["_k"])
        return out[["_k", *keep_cols]].rename(columns={"_k": key_col})

    return (
        ds.map_batches(tag_rows, batch_format="pyarrow")
        .union(mapping.map_batches(tag_map, batch_format="pyarrow"))
        .map_batches(
            lambda t: _node_bucket(t, "_k", n_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(apply, batch_format="pandas")
    )


_ROWS_PER_BLOCK = 250_000  # ~25 MB of (node, root) string rows


def _bounded_mat(ds: "ray.data.Dataset", cap_blocks: int):
    """Materialize with a size-tracking block count.  The contraction loop
    derives datasets from unions of earlier groupby outputs; Ray's sort
    shuffle emits roughly one block per INPUT block, so without coalescing
    the block count doubles per derivation (the self-union in the
    pointer-jump is the worst case) and per-task scheduling overhead grows
    exponentially even as row counts shrink.  Target block count follows
    the DATA SIZE (rows / ~250k, capped) so a few-hundred-row contracted
    map is one block, not sixty-four near-empty ones; ``repartition`` with
    the default ``shuffle=False`` is a local split/merge — no all-to-all —
    so the coalesce costs one pass over the already-materialized blocks."""
    m = ds.materialize()
    rows = m.count()
    target = min(cap_blocks, max(1, -(-rows // _ROWS_PER_BLOCK)))
    if m.num_blocks() > 2 * target:
        m = m.repartition(target).materialize()
    return m


def _map_fingerprint(mapping: "ray.data.Dataset") -> int:
    """Order- and partitioning-free fingerprint of a (node, root) mapping:
    sum over ROWS of hash64(node|root) mod 2^36.  The modulus is applied
    per row (NOT per batch-sum): per-batch modding makes the fingerprint
    depend on how rows are batched, so the same mapping content under two
    block layouts fingerprints differently — which turned the pointer-jump
    fixpoint test into an infinite loop when a coalesce alternated the
    layout.  Row-level mod keeps per-block partials exact (2^36 x block
    rows << 2^63) and the total is a pure function of the row multiset."""
    from ray.data.aggregate import Sum

    def fp_batch(t: pa.Table) -> pa.Table:
        joined = pa.compute.binary_join_element_wise(
            t.column("node"), t.column("root"), "|"
        )
        h = hash64_str(joined) % np.uint64(1 << 36)
        return pa.table(
            {"fp": pa.array([int(h.sum(dtype=np.uint64))], pa.int64())}
        )

    out = mapping.map_batches(fp_batch, batch_format="pyarrow").aggregate(
        Sum("fp", alias_name="fp")
    )
    return 0 if out is None else int(out["fp"] or 0)


def cc_labels(
    edges: "ray.data.Dataset",
    max_iter: int = 25,
    n_buckets: int = 64,
    stats: dict | None = None,
    algo: str = "contract",
) -> "ray.data.Dataset":
    """EDGES(id_a, id_b) -> LABELS(node, label): the distributed
    connected-components core.  ``label`` is the lexicographic-min member
    id as a string (matching the driver union-find's canonical choice);
    every node appearing in the edge list gets a row.

    Default algorithm: **min-neighbor edge contraction** (the star/hash-min
    contraction family, e.g. Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14).  Each round over the CURRENT edge set:

      1. ``M(v) = min(v ∪ N(v))`` per node — one bucketed groupby over the
         2|E| direction-doubled edge rows;
      2. rewrite every edge to ``(M(a), M(b))`` — two attach-pattern
         bucketed joins against the non-identity part of M — then drop
         self-loops and locally dedupe.

    Connectivity is preserved under the quotient, every surviving vertex
    is an original member id, and the component minimum is a fixed point
    of M — so when the edge set empties, each component has contracted to
    exactly its min member.  Labels come from the ROUND-1 mapping (which
    covers every node) composed with the later rounds' mappings; the later
    mappings are composed smallest-first, so the per-round bookkeeping
    shuffles only the (geometrically shrinking) contracted vertex sets and
    the full node set is touched exactly twice (round 1 + the final
    compose) — unlike propagation, which re-shuffles the full adjacency
    every round.  Worst case is still O(diameter) rounds (adversarially
    ordered paths shrink slowly), same as propagation; near-dup / match
    graphs are shallow and contract in 1-3 rounds.

    ``max_iter`` bounds the rounds; like the propagation variant, labels
    for a graph that has not fully contracted by then are the partial
    quotient (intermediate roots).  Self-loops and edges with a null
    endpoint are dropped (a null id never links anything, matching SQL
    semantics; the driver path never sees null ids either); a node whose
    ONLY incident edges are self-loops therefore gets no label row —
    every consumer (``attach_labels``, the distributed edge-attach)
    left-joins labels and defaults a missing node to its own id, which
    IS that node's component, so the omission is behavior-neutral.
    (The propagation variant emits identity rows for such nodes; tests
    comparing the two normalize for this.)

    ``stats`` receives ``cc_rounds`` and ``cc_algo``.  ``algo="propagate"``
    routes to :func:`cc_labels_propagation` (the independent cross-check
    implementation).
    """
    if algo == "propagate":
        return cc_labels_propagation(
            edges, max_iter=max_iter, n_buckets=n_buckets, stats=stats
        )
    if algo != "contract":
        raise ValueError("algo must be 'contract' or 'propagate'")
    import pyarrow.compute as pc

    def norm(t: pa.Table) -> pa.Table:
        a = t.column("id_a").cast(pa.string())
        b = t.column("id_b").cast(pa.string())
        keep = pc.not_equal(a, b)  # null endpoints -> null -> dropped
        return pa.table({"a": a, "b": b}).filter(keep)

    cur = (
        edges.select_columns(["id_a", "id_b"])
        .map_batches(norm, batch_format="pyarrow")
        .materialize()
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        a, b = t.column("a"), t.column("b")
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays([b, a]),
            }
        )

    def min_reduce(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node")["nbr"].min().reset_index(name="root")
        m["root"] = np.minimum(m["node"], m["root"])
        return m[["node", "root"]]

    def nonid(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("node"), t.column("root")))

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        df = pd.DataFrame({"a": lo[keep], "b": hi[keep]}).drop_duplicates()
        return pa.table(
            {
                "a": pa.array(df["a"], pa.string()),
                "b": pa.array(df["b"], pa.string()),
            }
        )

    def dom_merge(g: pd.DataFrame) -> pd.DataFrame:
        # acc rows win; mapping rows only for nodes new to acc's domain
        a = g[g["_is_acc"]][["node", "root"]]
        m = g[~g["_is_acc"]]
        new = m[~m["node"].isin(set(a["node"]))][["node", "root"]]
        return pd.concat([a, new], ignore_index=True)

    cap_blocks = 4 * n_buckets
    m1 = None  # round-1 full mapping (covers every node, incl. identity)
    acc = None  # composed non-identity mapping of rounds >= 2
    rounds = 0
    for _ in range(max_iter):
        if cur.count() == 0:
            break
        rounds += 1
        mapping = (
            cur.map_batches(both_dirs, batch_format="pyarrow")
            .map_batches(
                lambda t: _node_bucket(t, "node", n_buckets),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(min_reduce, batch_format="pandas")
        )
        # consumed by up to 4 downstream pipelines
        mapping = _bounded_mat(mapping, cap_blocks)
        map_nz = _bounded_mat(
            mapping.map_batches(nonid, batch_format="pyarrow"), cap_blocks
        )
        # Pointer-jump M to full path compression (root <- M(root) until
        # fixpoint): M's non-identity part is a strictly-decreasing forest,
        # and rewriting edges through the COMPRESSED map collapses each
        # M-tree to its root in one round — without this, a monotonically
        # ordered chain contracts by one vertex per round (O(n) rounds);
        # with it, chain depth halves per jump and rounds are O(log
        # diameter).  Fixpoint detection is the same sum-of-hashes
        # fingerprint the propagation variant uses for convergence; a
        # (2^-40-rare) collision only leaves the map less compressed for
        # this round — correctness is unaffected, later rounds finish the
        # contraction.
        prev_fp = _map_fingerprint(map_nz)
        for _jump in range(12):  # depth doubles per jump: 2^12 is plenty
            jumped = _bounded_mat(
                _rewrite_through(
                    map_nz, "root", ["node"], map_nz, n_buckets
                ).map_batches(
                    lambda t: t.select(["node", "root"]),
                    batch_format="pyarrow",
                ),
                cap_blocks,
            )
            fp = _map_fingerprint(jumped)
            map_nz = jumped
            if fp == prev_fp:
                break
            prev_fp = fp
        if rounds == 1:
            # the full round-1 mapping with COMPRESSED roots: identity rows
            # straight from the groupby output, non-identity rows from the
            # jumped map (the same map the edges were rewritten through —
            # an uncompressed m1 here would label single-round components
            # with a mid-tree parent instead of the root)
            ident = mapping.map_batches(
                lambda t: t.filter(
                    pc.equal(t.column("node"), t.column("root"))
                ),
                batch_format="pyarrow",
            )
            m1 = ident.union(map_nz)
        elif acc is None:
            acc = map_nz
        else:
            # compose: stored roots through this round's M, then adopt
            # M rows for vertices new to the domain — both over the small
            # contracted sets, never the full node set
            acc1 = _rewrite_through(acc, "root", ["node"], map_nz, n_buckets)

            def tag(flag):
                def _t(t: pa.Table) -> pa.Table:
                    return pa.table(
                        {
                            "node": t.column("node"),
                            "root": t.column("root"),
                            "_is_acc": pa.array([flag] * t.num_rows, pa.bool_()),
                        }
                    )

                return _t

            acc = (
                acc1.map_batches(tag(True), batch_format="pyarrow")
                .union(map_nz.map_batches(tag(False), batch_format="pyarrow"))
                .map_batches(
                    lambda t: _node_bucket(t, "node", n_buckets),
                    batch_format="pyarrow",
                )
                .groupby("bucket")
                .map_groups(dom_merge, batch_format="pandas")
            )
            acc = _bounded_mat(acc, cap_blocks)
        cur = (
            _rewrite_through(
                _rewrite_through(cur, "a", ["b"], map_nz, n_buckets),
                "b",
                ["a"],
                map_nz,
                n_buckets,
            )
            .map_batches(canon, batch_format="pyarrow")
        )
        cur = _bounded_mat(cur, cap_blocks)
    if stats is not None:
        stats["cc_rounds"] = rounds
        stats["cc_algo"] = "contract"
    if m1 is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "label": pa.array([], pa.string()),
                }
            )
        )
    labels = m1
    if acc is not None:
        labels = _rewrite_through(labels, "root", ["node"], acc, n_buckets)
    return labels.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "label": t.column("root")}
        ),
        batch_format="pyarrow",
    )


def attach_labels(
    nodes: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """NODES(node) ⟕ LABELS(node, label) -> (node, label) for every input
    node, label = node for unlabeled singletons — a bucketed groupby join;
    neither side is broadcast or driver-materialized (the scale-safe
    replacement for a ``ray.put(label_dict)`` whole-corpus broadcast)."""

    def tag_nodes(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.string()),
                "label": pa.array([None] * t.num_rows, pa.string()),
                "is_node": pa.array([True] * t.num_rows, pa.bool_()),
            }
        )

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node").cast(pa.string()),
                "label": t.column("label").cast(pa.string()),
                "is_node": pa.array([False] * t.num_rows, pa.bool_()),
            }
        )

    def join(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[~g["is_node"]][["node", "label"]].drop_duplicates("node")
        out = g[g["is_node"]][["node"]].merge(lab, on="node", how="left")
        out["label"] = out["label"].fillna(out["node"])
        return out

    return (
        nodes.map_batches(tag_nodes, batch_format="pyarrow")
        .union(labels.map_batches(tag_labels, batch_format="pyarrow"))
        .map_batches(
            lambda t: _node_bucket(t, "node", n_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(join, batch_format="pandas")
    )


def connected_components_distributed(
    scores: "ray.data.Dataset",
    max_iter: int = 25,
    max_components: int = 30000,
    n_buckets: int = 64,
    stats: dict | None = None,
) -> "ray.data.Dataset":
    """SCORES -> edges labeled with 'component' via ``cc_labels`` + a
    bucketed label-attach join + the oversized-component refilter."""
    labels = cc_labels(scores, max_iter=max_iter, n_buckets=n_buckets,
                       stats=stats)

    # attach labels to edges: bucketed merge on id_a's node
    lab_rows = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "id_a": pa.array([None] * t.num_rows, pa.string()),
                "id_b": pa.array([None] * t.num_rows, pa.string()),
                # float64 through the union: the driver path keeps the input
                # dtype, so a float32 cast here could flip the refilter's
                # min_score/searchsorted threshold for scores within float32
                # epsilon of a cutoff and diverge between CC modes
                "score": pa.array([None] * t.num_rows, pa.float64()),
                "label": t.column("label"),
            }
        ),
        batch_format="pyarrow",
    )
    edge_rows = scores.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("id_a").cast(pa.string()),
                "id_a": t.column("id_a").cast(pa.string()),
                "id_b": t.column("id_b").cast(pa.string()),
                "score": t.column("score").cast(pa.float64()),
                "label": pa.array([None] * t.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["label"].notna()][["node", "label"]].drop_duplicates("node")
        e = g[g["id_a"].notna()][["node", "id_a", "id_b", "score"]]
        out = e.merge(lab, on="node", how="left")
        out["label"] = out["label"].fillna(out["node"])
        return out.rename(columns={"label": "component"})[
            ["id_a", "id_b", "score", "component"]
        ]

    labeled = (
        lab_rows.union(edge_rows)
        .map_batches(
            lambda t: _node_bucket(t, "node", n_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(attach, batch_format="pandas")
    )

    # oversized-component refilter (clustering.py:74-98): component edges
    # are colocated by hash-bucketing on the label, then the same recursive
    # union-find + refilter as the driver path runs per bucket (it
    # re-derives the per-component structure itself; labels are node ids,
    # globally unique, so no cross-bucket collisions)
    def bucket(t: pa.Table) -> pa.Table:
        c = t.column("component")
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        h = hash64_str(c.cast(pa.string()))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def refilter(g: pd.DataFrame) -> pd.DataFrame:
        out = _refilter_components(
            g.drop(columns=["component", "bucket"]), max_components
        )
        out["component"] = out["component"].astype(str)
        return out

    return (
        labeled.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(refilter, batch_format="pandas")
    )


DRIVER_CC_EDGE_LIMIT = 20_000_000  # ~1 GB of (id_a, id_b, score) rows


def connected_components(
    scores: "ray.data.Dataset",
    max_components: int = 30000,
    mode: str = "auto",
    stats: dict | None = None,
) -> "ray.data.Dataset":
    """SCORES -> edges labeled with 'component'.

    mode='auto' collects the edge list to the driver union-find while it is
    small (edges are tens of bytes each; the match-edge set is orders of
    magnitude smaller than the corpus) and switches to the distributed
    edge-contraction CC above the limit.  The input is materialized first
    so the upstream DAG executes once — count() on a lazy Dataset would run
    the whole pipeline and the chosen path would re-run it."""
    if mode == "auto":
        scores = scores.materialize()
        n_edges = scores.count()
        mode = "driver" if n_edges <= DRIVER_CC_EDGE_LIMIT else "distributed"
        if stats is not None:
            stats["cc_edges"] = n_edges
    if stats is not None:
        stats["cc_mode"] = mode
    if mode == "driver":
        return connected_components_driver(scores, max_components)
    return connected_components_distributed(
        scores, max_components=max_components, stats=stats
    )


# --------------------------------------------------------------------------
# per-component hierarchical clustering
# --------------------------------------------------------------------------

def _cluster_component(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """One connected component -> (record_id, cluster_id, cluster_score)
    rows (clustering.py:196-262 semantics)."""
    if len(g) == 1:
        row = g.iloc[0]
        if row["score"] > threshold:
            ids = sorted([row["id_a"], row["id_b"]])
            return pd.DataFrame(
                {
                    "record_id": ids,
                    "cluster_id": [ids[0], ids[0]],
                    "cluster_score": np.float32(row["score"]),
                }
            )
        return pd.DataFrame(
            {"record_id": [], "cluster_id": [], "cluster_score": []}
        )

    both = np.concatenate([g["id_a"].to_numpy(), g["id_b"].to_numpy()])
    nodes, inv = np.unique(both, return_inverse=True)
    N = len(nodes)
    D = np.ones((N, N), dtype=np.float64)  # unscored pairs -> distance 1
    np.fill_diagonal(D, 0.0)
    ia = inv[: len(g)]
    ib = inv[len(g):]
    d = 1.0 - g["score"].to_numpy(dtype=np.float64)
    D[ia, ib] = d
    D[ib, ia] = d

    merges = centroid_linkage(D)
    labels = fcluster_distance(merges, N, 1.0 - threshold)

    out_ids: list = []
    out_cids: list = []
    out_scores: list = []
    sq = D ** 2
    for lab in np.unique(labels):
        members = np.where(labels == lab)[0]
        if len(members) < 2:
            continue
        sub = sq[np.ix_(members, members)]
        # confidence: 1 - sqrt(sum_j (1-phi_ij)^2 / (N-1))  (clustering.py:241-262)
        conf = 1.0 - np.sqrt(sub.sum(axis=1) / (len(members) - 1))
        cid = min(nodes[m] for m in members)
        for m, c in zip(members, conf):
            out_ids.append(nodes[m])
            out_cids.append(cid)
            out_scores.append(np.float32(c))
    return pd.DataFrame(
        {
            "record_id": out_ids,
            "cluster_id": out_cids,
            "cluster_score": pd.Series(out_scores, dtype=np.float32),
        }
    )


def hierarchical_clusters(
    components: "ray.data.Dataset",
    threshold: float = 0.5,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Component-labeled edges -> CLUSTERS.

    Hash-bucket co-location: one map_groups task per component-hash bucket,
    looping components in-process (a per-component Ray dispatch would pay
    task overhead on millions of tiny components at scale)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        comp = t.column("component")
        if isinstance(comp, pa.ChunkedArray):
            comp = comp.combine_chunks()
        h = hash64_str(comp.cast(pa.string()))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def cluster_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _cluster_component(sub, threshold)
            for _, sub in g.groupby("component", sort=False)
        ]
        if not outs:
            return pd.DataFrame(
                {"record_id": [], "cluster_id": [], "cluster_score": []}
            )
        return pd.concat(outs, ignore_index=True)

    return (
        components.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cluster_bucket, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# singleton injection (api.py:186-195)
# --------------------------------------------------------------------------

def add_singletons(
    record_ids: "ray.data.Dataset", clusters: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Every record not in a cluster becomes its own cluster with
    confidence 1.0 — groupby-based anti join (scale-safe: no broadcast of
    the clustered-id set)."""
    left = record_ids.map_batches(
        lambda t: pa.table(
            {
                "record_id": t.column("record_id").cast(pa.string()),
                "cluster_id": pa.array([None] * t.num_rows, pa.string()),
                "cluster_score": pa.array([None] * t.num_rows, pa.float32()),
            }
        ),
        batch_format="pyarrow",
    )
    # normalize the clusters side to identical Arrow blocks (a union of
    # pandas and arrow blocks is rejected by the executor)
    clusters = clusters.map_batches(
        lambda t: pa.table(
            {
                "record_id": t.column("record_id").cast(pa.string()),
                "cluster_id": t.column("cluster_id").cast(pa.string()),
                "cluster_score": t.column("cluster_score").cast(pa.float32()),
            }
        ),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        rid = t.column("record_id")
        if isinstance(rid, pa.ChunkedArray):
            rid = rid.combine_chunks()
        h = hash64_str(rid)
        return t.append_column(
            "bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def pick_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # clustered rows win; remaining record_ids become singletons
        clustered = g[g["cluster_id"].notna()].drop_duplicates("record_id")
        rest = g[~g["record_id"].isin(clustered["record_id"])].drop_duplicates(
            "record_id"
        )
        singles = pd.DataFrame(
            {
                "record_id": rest["record_id"],
                "cluster_id": rest["record_id"],
                "cluster_score": np.float32(1.0),
            }
        )
        return pd.concat(
            [clustered[["record_id", "cluster_id", "cluster_score"]], singles],
            ignore_index=True,
        )

    return (
        left.union(clusters)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick_bucket, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# one-to-one and gazetteer matching (clustering.py:265-308)
# --------------------------------------------------------------------------

def greedy_matching(scores: "ray.data.Dataset") -> pd.DataFrame:
    """One-to-one links: sort by score desc, greedily accept pairs with
    unseen endpoints.  Inherently sequential (clustering.py:265-277) —
    distributed sort, then a single driver scan.  The scan STREAMS sorted
    batches (iter_batches) so the driver holds only the seen-endpoint sets
    and the accepted links, never the full edge list.  Equal scores
    tie-break on (id_a, id_b) so the output is a pure function of the
    score table — not of block order or internal shuffle hashes."""
    sorted_scores = scores.select_columns(["id_a", "id_b", "score"]).sort(
        ["score", "id_a", "id_b"], descending=[True, False, False]
    )
    seen_a: set = set()
    seen_b: set = set()
    keep_a: list = []
    keep_b: list = []
    keep_s: list = []
    for batch in sorted_scores.iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        for row in batch.itertuples(index=False):
            if row.id_a not in seen_a and row.id_b not in seen_b:
                seen_a.add(row.id_a)
                seen_b.add(row.id_b)
                keep_a.append(row.id_a)
                keep_b.append(row.id_b)
                keep_s.append(row.score)
    return pd.DataFrame({"id_a": keep_a, "id_b": keep_b, "score": keep_s})


def gazette_matching(
    scores: "ray.data.Dataset",
    threshold: float = 0.0,
    n_matches: int = 1,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per query record: filter > threshold, top n_matches by score
    (clustering.py:280-308).  Queries are hash-bucketed by ``id_a`` and one
    task per bucket takes every query's top-k in a single vectorized sort +
    groupby-head — no per-query dispatch (the pairs.py rule)."""

    def bucket(t: pa.Table) -> pa.Table:
        c = t.column("id_a")
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        h = hash64_str(c.cast(pa.string()))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def top_k_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["score"] > threshold].drop(columns=["bucket"])
        g = g.sort_values(["id_a", "score", "id_b"], ascending=[True, False, True],
                          kind="mergesort")
        if n_matches:
            g = g.groupby("id_a", sort=False).head(n_matches)
        return g.reset_index(drop=True)

    return (
        scores.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(top_k_bucket, batch_format="pandas")
    )
