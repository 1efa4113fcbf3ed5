import pytest


@pytest.fixture(scope="session")
def spark():
    from pyhctsa_spark.session import get_spark

    s = get_spark("pyhctsa_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
