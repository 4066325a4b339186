"""Driver contract for the spark-graft builder (PySpark target).

``entry``     — flagship PageRank on the sf0.001 customer→supplier graph.
``queries``   — one entry per implemented operator (SURVEY.md §2 +
                training-data pipeline ops), each ``(spark, sf_dir) → DataFrame``.
``oracle_sql``— DuckDB-equivalent ANSI SQL per query (omitted for the
                genuinely non-SQL-expressible / approximate entries,
                which get the weaker rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neo4j_graph_algorithms_spark import driver_queries as dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return dq.q_pagerank_cs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(dq.ORACLES)
