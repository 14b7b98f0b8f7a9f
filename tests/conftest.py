import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kafka_connect_sse_spark.session import get_spark

    s = get_spark(app_name="kcss-tests", shuffle_partitions=4)
    yield s
    s.stop()
