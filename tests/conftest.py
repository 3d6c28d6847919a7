import pytest


@pytest.fixture(scope="session")
def spark():
    from htrc_ingester_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=4)
    yield s
