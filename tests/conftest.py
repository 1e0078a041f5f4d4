import pytest

from entityresolution_capstone_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ercs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/ercs-test-warehouse"},
    )
    yield s
    s.stop()
