import pytest

from geospark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="geospark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield s
