import logging
import os

# must precede any import of __ray_entry__: the span-table oracle SQL
# embeds the docs-export path for this sf (driver default is sf0.01)
os.environ.setdefault("VV8RAY_ORACLE_SF", "/root/testdata/sf0.001")

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
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()
