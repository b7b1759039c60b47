"""Benchmark harness: headline flagship pipeline + per-query timings.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "pages": n, "pairs_scored": n,
   "pairs_per_sec": x}

``--scaling`` runs the headline pipeline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports throughputs + scaling
efficiency (the two-cluster-size criterion evidenced at two parallelism
levels, per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
COPIES = int(os.environ.get("GRAFT_PAGE_COPIES", "3"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # NOTE: ShuffleStrategy.HASH_SHUFFLE measured 2.5x faster on the
    # bucketed pair-generation shuffle in isolation, but its aggregator
    # actors deadlock against the scoring actor pool when the whole
    # pipeline runs under a fixed CPU budget — stay on the sort-based
    # default until the two stages get disjoint resource reservations.


def headline() -> dict:
    """Flagship: pages (documents x COPIES perturbed) -> clusters.
    Reports pairs-scored/sec — the BASELINE.json throughput metric."""
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray import synth
    from ny_campaign_finance_dedupe_ray.pipelines.dedupe_pages import (
        pages_to_records,
        scores_to_clusters,
    )
    from ny_campaign_finance_dedupe_ray.stages.blocking import (
        block_records,
        doc_config,
    )
    from ny_campaign_finance_dedupe_ray.stages.pairs import candidate_pairs
    from ny_campaign_finance_dedupe_ray.stages.scoring import score_pairs
    from ny_campaign_finance_dedupe_ray.state.model import doc_model

    pages_tbl = synth.pages_from_documents(SF_DIR, copies=COPIES)
    n_pages = pages_tbl.num_rows
    pages = rd.from_arrow(pages_tbl).repartition(max(NUM_CPUS, 8))

    t0 = time.time()
    records = pages_to_records(pages).materialize()
    t_extract = time.time() - t0

    cfg = doc_config()
    t0 = time.time()
    blocks = block_records(records, cfg)
    # min_score=0 scores every candidate pair (pairs-scored metric), the
    # match filter is applied afterwards
    scores_all = score_pairs(
        candidate_pairs(
            blocks, n_buckets=2 * NUM_CPUS, max_block_size=cfg.max_block_size
        ),
        model=doc_model(),
        min_score=0.0,
        concurrency=(1, NUM_CPUS),
    ).materialize()
    t_score = time.time() - t0
    n_pairs = scores_all.count()

    t0 = time.time()
    matches = scores_all.filter(expr="score > 0.5")
    clusters = scores_to_clusters(matches, records).materialize()
    t_cluster = time.time() - t0
    n_rows = clusters.count()

    total = t_extract + t_score + t_cluster
    return {
        "sec": round(total, 3),
        "extract_sec": round(t_extract, 3),
        "block_score_sec": round(t_score, 3),
        "cluster_sec": round(t_cluster, 3),
        "pages": n_pages,
        "pairs_scored": n_pairs,
        "pairs_per_sec": round(n_pairs / t_score, 1) if t_score > 0 else 0,
        "pages_per_sec": round(n_pages / total, 1),
        "cluster_rows": n_rows,
    }


QUERY_NAMES = [
    "exact_dedup",
    "minhash_clusters",
    "simhash_signatures",
    "token_counts",
    "quality_score",
    "lang_id",
    "fingerprints",
    "top_customers",
    "pricing_summary",
    "event_type_counts",
    "gazette_top_orders",
    "ann_topk",
]


def run_queries() -> dict:
    import __ray_entry__ as entrymod

    out = {}
    qs = entrymod.queries()
    for name in QUERY_NAMES:
        t0 = time.time()
        res = qs[name](SF_DIR)
        # force execution
        if hasattr(res, "materialize"):
            res.materialize()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    _init_ray()
    h = headline()
    q = run_queries()
    print(
        json.dumps(
            {
                "metric": "dedupe_pages_wall",
                "value": h["sec"],
                "unit": "sec",
                "queries": q,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                **h,
            }
        )
    )
    import ray

    ray.shutdown()


def scaling() -> None:
    lo, hi = 8, 32
    results = {}
    for n in (hi, lo, hi):  # first hi run warms the page cache, untimed
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[n] = json.loads(out.strip().splitlines()[-1])
    t_lo = results[lo]["value"]
    t_hi = results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_8": t_lo,
                "sec_32": t_hi,
                "pairs_per_sec_8": results[lo]["pairs_per_sec"],
                "pairs_per_sec_32": results[hi]["pairs_per_sec"],
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
