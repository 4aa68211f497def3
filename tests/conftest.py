import os

import pytest

from sparkgraph.session import get_spark

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    s = get_spark(
        "sparkgraph-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def assets_dir():
    return ASSETS
