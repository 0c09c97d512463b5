"""Shared fixtures. Ray is initialised ONCE per pytest session.

``slow`` marker: long multi-epoch/property/CLI tests are skipped by
default so the everyday gate stays fast; run the FULL suite with
``pytest --runslow`` (CI / pre-release / judge runs).  The fast
default keeps at least one test per correctness property — slow marks
only go on tests whose property is also covered by a faster sibling.
"""

from __future__ import annotations

import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False, help="run slow-marked tests too"
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running; skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (run with --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
