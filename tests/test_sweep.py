"""Sweep harness: settings x fractions -> match_runs metric rows."""

from __future__ import annotations

import ray.data as rd

from ny_campaign_finance_dedupe_ray import synth
from ny_campaign_finance_dedupe_ray.pipelines.sweep import run_sweep
from ny_campaign_finance_dedupe_ray.stages.blocking import default_config
from ny_campaign_finance_dedupe_ray.state.model import default_model


def test_run_sweep(fixture_tables):
    pages = rd.from_arrow(fixture_tables["pages"])
    out = run_sweep(
        pages,
        settings={"default": (default_config(), default_model())},
        sample_fractions=(0.5, 1.0),
    )
    assert len(out) == 2
    assert set(out["sample_fraction"]) == {0.5, 1.0}
    full = out[out["sample_fraction"] == 1.0].iloc[0]
    assert full["total_records"] == fixture_tables["pages"].num_rows
    assert full["total_clusters"] > 0
    assert full["run_time_s"] > 0
    assert full["settings_file"] == "default"
