from __future__ import annotations

import pytest

from distributed_classification_system_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dcs_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
