import os

import pytest

from sparkgraph.session import get_spark

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkgraph-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def assets_dir():
    return ASSETS
