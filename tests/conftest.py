import os

import pytest

from gfw_data_api_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(app_name="gfw-tests", shuffle_partitions=8)
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
