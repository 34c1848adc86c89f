import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphscope_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    cpus = int(os.environ.get("SPARK_TEST_CPUS", "8"))
    s = get_spark("graphscope_spark_tests", cpus=cpus, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
