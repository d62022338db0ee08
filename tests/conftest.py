import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from datum_spark.session import get_session

    s = get_session(app_name="datum_spark_tests")
    yield s


@pytest.fixture(scope="session")
def smoke_db(spark):
    import datum_spark

    return datum_spark.connect(f"file://{SF_SMOKE}", spark=spark)


@pytest.fixture()
def tmp_db(spark, tmp_path):
    import datum_spark

    return datum_spark.connect(str(tmp_path), spark=spark)
