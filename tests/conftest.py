import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from deduplidog_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("deduplidog-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
