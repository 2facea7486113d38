from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from mining_data_integration_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s
