from __future__ import annotations

import pytest

from gcp_serverless_mapreduce_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("gcp-serverless-mapreduce-spark-tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark
    spark.stop()
