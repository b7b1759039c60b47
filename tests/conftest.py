"""Session-scoped Ray fixture — one ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # NOTE: bench.py switches to ShuffleStrategy.HASH_SHUFFLE (2.5x faster at
    # 32 cpus); under the 4-cpu test session the hash-shuffle aggregator
    # actors starve the iterative pipelines, so tests keep the default.
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_tables():
    """Deterministic synthetic pages/labels/entities (seed 42, 300 entities)."""
    from ny_campaign_finance_dedupe_ray import synth

    return synth.generate(n_entities=300, seed=42)
