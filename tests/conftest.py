from __future__ import annotations

import pytest

from corporate_knowledge_extractor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ckg-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.execution.pyspark.udf.faulthandler.enabled": "true"},
    )
    yield s
