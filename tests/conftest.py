"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray
from ray.data import DataContext


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def unit_fixture(tmp_path_factory):
    """Deterministic unit-scale corpus fixture, generated once."""
    from reden_ray.fixtures import generate_fixture

    out = tmp_path_factory.mktemp("fx") / "unit"
    generate_fixture(out, n_pages=200, n_entities=64, seed=42)
    return str(out)
