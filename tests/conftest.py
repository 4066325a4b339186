import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_graph_algorithms_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.default.parallelism": "8",
            "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024 * 1024),
        },
    )
    yield s
