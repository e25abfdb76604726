from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("DAMPR_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from dampr_spark.session import get_spark

    s = get_spark(app_name="dampr-spark-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
