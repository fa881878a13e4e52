"""Shared Spark fixture — one local session for the whole test run."""

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from mahout_spark.session import get_spark

    s = get_spark("mahout_spark-tests",
                  master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                  shuffle_partitions=8)
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"
