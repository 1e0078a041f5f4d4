import pytest

from entityresolution_capstone_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ercs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": "/tmp/ercs-test-warehouse",
            # one JVM serves the whole 150+-test session; persisted frontiers
            # and localCheckpoint blocks accumulate faster than the
            # ContextCleaner's GC-driven release, and the 1g default heap
            # OOMs near the end of the suite
            "spark.driver.memory": "12g",
        },
    )
    yield s
    s.stop()
