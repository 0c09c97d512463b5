"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

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
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_log(tmp_path):
    """A small deterministic change log in a temp dir."""
    from tartare_ray.gen import GenConfig, generate_log

    cfg = GenConfig(
        n_events=5_000,
        n_docs=400,
        events_per_file=1_000,
        widen_frac=0.6,
        add_col_frac=0.8,
    )
    res = generate_log(str(tmp_path / "log"), cfg)
    return res, cfg, tmp_path
