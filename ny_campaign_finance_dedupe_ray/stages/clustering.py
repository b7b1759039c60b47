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
distributed iterative min-label propagation (hash-partitioned groupby per
round, no joins) for large ones; per-component work is a
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
# distributed min-label propagation (scale path)
# --------------------------------------------------------------------------

def _node_bucket(t: pa.Table, col: str, n_buckets: int) -> pa.Table:
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    h = hash64_str(c.cast(pa.string()))
    return t.append_column(
        "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
    )


def cc_labels(
    edges: "ray.data.Dataset",
    max_iter: int = 25,
    n_buckets: int = 64,
    stats: dict | None = None,
) -> "ray.data.Dataset":
    """EDGES(id_a, id_b) -> LABELS(node, label): the distributed
    connected-components core, as iterative hash-partitioned min-label
    propagation (SURVEY.md §7.6).  ``label`` is the lexicographic-min member
    id as a string (matching the driver union-find's canonical choice).

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
    return labels


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
    min-label propagation above the limit.  The input is materialized first
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
