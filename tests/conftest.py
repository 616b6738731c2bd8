from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from beis_orp_data_service_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", shuffle_partitions=8)
    yield s
