"""Evaluation sweep harness: run the flagship over sample fractions x
blocking/model settings, recording a match_runs metrics row per run — the
reference's empirical sweep (/root/reference/run_tests.py:12-43,
run_tests_comb.py:22-41; metrics from data_load/pre_init_db.py:23-28)."""

from __future__ import annotations

import time

import pandas as pd
import ray.data

from ..stages.blocking import BlockingConfig
from ..stages.stats import cluster_run_metrics
from ..state.model import Model
from .dedupe_pages import dedupe_pages


def run_sweep(
    pages: "ray.data.Dataset",
    settings: dict[str, tuple[BlockingConfig, Model]],
    sample_fractions: tuple[float, ...] = (0.25, 0.5, 1.0),
    seed: int = 42,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """One metrics row per (setting, fraction): total clusters, avg/biggest
    cluster size, records, record/cluster ratio, runtime."""
    rows = []
    for frac in sample_fractions:
        sample = pages if frac >= 1.0 else pages.random_sample(frac, seed=seed)
        sample = sample.materialize()
        n = sample.count()
        for name, (cfg, model) in settings.items():
            t0 = time.time()
            clusters = dedupe_pages(
                sample, cfg=cfg, model=model, threshold=threshold
            )
            m = cluster_run_metrics(
                clusters,
                predicates=[repr(p) for p in cfg.predicates],
                run_seconds=None,
                settings_name=name,
            )
            m["run_time_s"] = round(time.time() - t0, 2)
            m["sample_fraction"] = frac
            m["sample_rows"] = n
            m["settings_file"] = name
            rows.append(m)
    return pd.DataFrame(rows)
