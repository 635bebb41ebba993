import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_architecture_spark.session import SessionFactory

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = SessionFactory(
        app_name="lakehouse_tests",
        master="local[8]",
        shuffle_partitions=8,
    ).get_or_create()
    yield spark
    spark.stop()
