import pytest


@pytest.fixture(scope="session")
def spark():
    from kapra_spark.session import get_spark

    s = get_spark("kapra_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
