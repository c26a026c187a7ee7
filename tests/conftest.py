from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from hyperloglog_spark.engine.session import get_spark

    s = get_spark(app_name="hll_spark_tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf001_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir() -> str:
    return "/root/testdata/sf0.01"
