from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incremental_dagster_delta_spark.session import get_spark  # noqa: E402

# sf0.01 is the driver's correctness gate scale; overridable for speed.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=8, shuffle_partitions=8, driver_memory="4g")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
