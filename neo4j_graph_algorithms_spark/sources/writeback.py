"""Write-back sink — the reference's ``Exporter`` re-expressed.

Reference: ``core/.../write/Exporter.java:47-50,269`` — algorithm
results are written back as node properties in parallel batches
(10k-100k rows).  Here "the store" is a table/path, "a node property"
is a column, and parallel batched writes are what a distributed
``DataFrame.write`` does natively; ``MERGE INTO``-style upsert becomes
a left join + overwrite (or a real ``MERGE INTO`` when the target is an
Iceberg/Delta table — gated on catalog support at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_node_property(
    vertices: DataFrame,
    result: DataFrame,
    property_name: str,
    value_col: str | None = None,
    default=None,
) -> DataFrame:
    """Return ``vertices`` with ``property_name`` joined on from
    ``result`` ``(id, value)`` — the write-mode procs' effect
    (``writeProperty`` / ``partitionProperty``), lazily."""
    cols = [c for c in result.columns if c != "id"]
    vcol = value_col or cols[0]
    prop = result.select("id", F.col(vcol).alias(property_name))
    out = vertices.join(prop, "id", "left")
    if default is not None:
        out = out.withColumn(
            property_name, F.coalesce(F.col(property_name), F.lit(default))
        )
    return out


def write_node_property(
    vertices: DataFrame,
    result: DataFrame,
    property_name: str,
    path: str,
    value_col: str | None = None,
    default=None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Materialize the updated vertex table to ``path`` (parquet).
    Distributed, batched, parallel — the Exporter semantics
    (``Exporter.java:49-50``: MIN/MAX batch 10k/100k) without the
    hand-rolled thread pool."""
    out = with_node_property(vertices, result, property_name, value_col, default)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def merge_node_property_sql(
    target_table: str, source_view: str, property_name: str, value_col: str = "value"
) -> str:
    """The ``MERGE INTO`` statement used when the vertex table lives in
    an Iceberg/Delta catalog (executed via ``spark.sql`` by callers
    whose session has the catalog configured)."""
    return (
        f"MERGE INTO {target_table} t USING {source_view} s ON t.id = s.id "
        f"WHEN MATCHED THEN UPDATE SET t.{property_name} = s.{value_col}"
    )
