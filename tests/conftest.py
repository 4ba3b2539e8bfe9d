"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest
session (driver contract: tests own the Ray session; library code never
calls ray.init/shutdown)."""

from __future__ import annotations

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "realcodec: exercises the real media/PDF codec paths; "
        "auto-skipped when Pillow / pypdf are not installed "
        "(run `pytest -m realcodec` once wheels appear)")
    # Hang forensics: the full suite runs ~4 min; if a run ever exceeds
    # 30 min (observed once under heavy host CPU steal — a Ray Data
    # plan stalled with idle workers), dump every thread's stack to
    # stderr so the stall site is in the log.  Repeats every 30 min;
    # diagnostic only, never kills the run.
    import faulthandler
    faulthandler.dump_traceback_later(1800, repeat=True)


def pytest_unconfigure(config):
    import faulthandler
    faulthandler.cancel_dump_traceback_later()


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()
