from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

# Python workers must be able to import the test modules (mock fetchers
# shipped to executors by reference).
os.environ["PYTHONPATH"] = (
    "/root/repo:/root/repo/tests:" + os.environ.get("PYTHONPATH", "")
)

from op_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("op_etl_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
