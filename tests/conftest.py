import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from inform_spark.session import get_spark

    spark = get_spark(
        app_name="inform-spark-tests",
        master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[*]"),
        shuffle_partitions=32,
    )
    yield spark
