"""Recorded distributed-CC run ABOVE the 20M-edge auto-switch threshold
(VERDICT r4 #3): synthesize a >20M-edge corpus (the r2 5-chain + spoke
generator scaled ~10x), run ``connected_components(mode='auto')`` so the
switch itself routes to the distributed contraction CC, and verify
partition parity against the driver numpy kernel on the same edges.

Usage:  python tools/cc_scale_run.py [--edges-dir /tmp/cc_edges]
Prints one JSON line: edges, nodes, rounds, wall seconds per arm, parity.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHAINS = 3_300_000       # 5-node chains: 4 edges each -> 13.2M edges
N_SPOKES = 1_000_000       # hub + 8 spokes: 8 edges each -> 8M edges
SHARD_EDGES = 2_000_000


def generate(edges_dir: str) -> tuple[int, int]:
    """Deterministic edge corpus -> sharded parquet. Returns (edges, nodes)."""
    os.makedirs(edges_dir, exist_ok=True)
    shard, n_edges = 0, 0
    buf_a: list[np.ndarray] = []
    buf_b: list[np.ndarray] = []
    buffered = 0

    def flush():
        nonlocal shard, buffered
        if not buf_a:
            return
        a = np.concatenate(buf_a)
        b = np.concatenate(buf_b)
        t = pa.table({
            "id_a": pa.array(a), "id_b": pa.array(b),
            "score": pa.array(np.full(len(a), 0.9, dtype=np.float64)),
        })
        pq.write_table(t, f"{edges_dir}/shard_{shard:04d}.parquet")
        shard += 1
        buf_a.clear(); buf_b.clear(); buffered = 0

    # chains: c{i}_0 - c{i}_1 - ... - c{i}_4  (diameter 4: exercises rounds)
    step = 250_000
    for lo in range(0, N_CHAINS, step):
        hi = min(lo + step, N_CHAINS)
        idx = np.arange(lo, hi)
        for p in range(4):
            buf_a.append(np.char.add(
                np.char.add("c", idx.astype("U8")), f"_{p}"))
            buf_b.append(np.char.add(
                np.char.add("c", idx.astype("U8")), f"_{p + 1}"))
        buffered += 4 * (hi - lo)
        n_edges += 4 * (hi - lo)
        if buffered >= SHARD_EDGES:
            flush()
    flush()

    # spoke cliques: hub h{i} - s{i}_j for j in 0..7
    for lo in range(0, N_SPOKES, step):
        hi = min(lo + step, N_SPOKES)
        idx = np.arange(lo, hi)
        hubs = np.char.add("h", idx.astype("U8"))
        for j in range(8):
            buf_a.append(hubs)
            buf_b.append(np.char.add(
                np.char.add("s", idx.astype("U8")), f"_{j}"))
        buffered += 8 * (hi - lo)
        n_edges += 8 * (hi - lo)
        if buffered >= SHARD_EDGES:
            flush()
    flush()
    n_nodes = 5 * N_CHAINS + 9 * N_SPOKES
    return n_edges, n_nodes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges-dir", default="/tmp/cc_edges")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ny_campaign_finance_dedupe_ray.stages.clustering import (
        connected_components, numpy_components,
    )

    t0 = time.perf_counter()
    n_edges, n_nodes = generate(args.edges_dir)
    gen_wall = time.perf_counter() - t0

    scores = rd.read_parquet(args.edges_dir)
    stats: dict = {}
    t0 = time.perf_counter()
    labeled = connected_components(scores, mode="auto", stats=stats)
    # consume: count + component cardinality, all Dataset-side
    out_count = labeled.count()
    dist_wall = time.perf_counter() - t0
    assert stats.get("cc_mode") == "distributed", stats  # threshold crossed

    # distinct components, distributed side (groupby count is the shuffle
    # we can afford once; component column is the canonical min member)
    t0 = time.perf_counter()
    import pandas as pd

    comp_sample = labeled.map_batches(
        lambda t: t.select(["id_a", "id_b", "component"]),
        batch_format="pyarrow",
    )
    # pull the labeled edges down in arrow batches for the parity check
    parts = []
    for b in comp_sample.iter_batches(batch_size=1_000_000,
                                      batch_format="pyarrow"):
        parts.append(b)
    dist_df = pa.concat_tables(parts).to_pandas()
    collect_wall = time.perf_counter() - t0

    # driver kernel on the same edges (numpy min-label CC)
    t0 = time.perf_counter()
    ea = dist_df["id_a"].to_numpy()
    eb = dist_df["id_b"].to_numpy()
    drv_label = numpy_components(ea, eb)
    drv_wall = time.perf_counter() - t0

    # partition parity over EVERY edge: the two labelings must be a
    # bijection (canonical label CHOICE may differ — the refilter relabels
    # by first appearance — but the induced partition must be identical)
    t0 = time.perf_counter()
    drv_codes, drv_uniq = pd.factorize(drv_label)
    dist_codes, dist_uniq = pd.factorize(dist_df["component"].to_numpy())
    pair = drv_codes.astype(np.int64) * np.int64(len(dist_uniq)) + dist_codes
    n_pairs = int(pd.unique(pair).size)
    n_comp_drv = int(len(drv_uniq))
    n_comp_dist = int(len(dist_uniq))
    parity = n_pairs == n_comp_drv == n_comp_dist
    parity_wall = time.perf_counter() - t0

    print(json.dumps({
        "edges": n_edges,
        "nodes": n_nodes,
        "labeled_edge_rows": out_count,
        "cc_mode": stats.get("cc_mode"),
        "cc_rounds": stats.get("cc_rounds"),
        "cc_algo": stats.get("cc_algo"),
        "components_distributed": n_comp_dist,
        "components_driver": n_comp_drv,
        "parity_all_edges": parity,
        "wall_generate_sec": round(gen_wall, 1),
        "wall_distributed_sec": round(dist_wall, 1),
        "wall_driver_kernel_sec": round(drv_wall, 1),
        "wall_collect_sec": round(collect_wall, 1),
        "wall_parity_sec": round(parity_wall, 1),
        "num_cpus": args.num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
