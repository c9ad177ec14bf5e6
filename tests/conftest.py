import pytest

from pyspark_etl_twitter_spark.session import get_session

SF_TINY = "/root/testdata/sf0.001"
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    session = get_session(
        app_name="pyspark_etl_twitter_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield session
    session.stop()
