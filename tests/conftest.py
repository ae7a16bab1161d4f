import os
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from deduplidog_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "deduplidog-tests",
        shuffle_partitions=8,
        # catalog-table checkpoint tests use saveAsTable; keep the
        # warehouse out of the repo tree
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="wh_")},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
