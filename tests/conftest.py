import pytest

from chronon_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="chronon_spark_tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
