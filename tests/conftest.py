"""Session-scoped Ray fixture — ONE ray.init per pytest session.

Library code never calls ray.init/shutdown (driver contract,
``__ray_entry__.py``); only this fixture, bench.py and CLI scripts own a
Ray session.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()
