import pytest

from haskellpagerank_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session: tests verify semantics, not throughput
    return get_spark(app_name="hpr-tests", cores=4, shuffle_partitions=4)
