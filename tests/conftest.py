import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from spatial_spark.session import get_spark
    s = get_spark("spatial_spark_tests", cpus=4)
    yield s
    s.stop()


@pytest.fixture()
def ctx(spark, tmp_path):
    from spatial_spark.layer import SpatialContext
    return SpatialContext(spark, str(tmp_path / "warehouse"))


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
