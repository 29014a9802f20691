import pytest

from wikifrontier.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(master="local[4]", app_name="wikifrontier-tests", shuffle_partitions=8)
    yield spark
    spark.stop()
