import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SMOKE_SF = os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tsclust_spark.session import get_spark

    s = get_spark("tsclust-spark-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SMOKE_SF
