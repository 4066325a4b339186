"""Graph loading/projection — the reference's GraphLoader surface
re-expressed as DataFrame filters.

Reference (``core/.../core/GraphLoader.java``): ``withLabel`` /
``withRelationshipType`` / ``withDirection`` / ``withRelationshipWeights
/ withDefaultWeight`` / ``withSort`` / ``asUndirected`` /
``withAccumulateWeights`` — all load-time projections of the Neo4j
store.  Here the "store" is any vertex/edge DataFrame pair, and each
knob is a filter/union/groupBy the Catalyst optimizer pushes into the
scan (label/type predicates reach the parquet reader as PushedFilters).

Cypher projection (``HeavyCypherGraphFactory.java``) — "run any two
statements producing ``id`` and ``source,target[,weight]`` rows" — is
native here: pass any DataFrames/SQL you like; this loader is only the
declarative convenience path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph

OUTGOING = "OUTGOING"
INCOMING = "INCOMING"
BOTH = "BOTH"


def load_graph(
    vertices: DataFrame | None,
    edges: DataFrame,
    label: str | None = None,
    relationship_type: str | None = None,
    direction: str = BOTH,
    weight_property: str | None = None,
    default_weight: float = 1.0,
    accumulate_weights: bool = False,
    undirected_dedup: bool = True,
) -> Graph:
    """Project a subgraph the way ``GraphLoader`` does.

    ``vertices``: ``(id, label?, ...)``; ``edges``: ``(src, dst, type?,
    weight-or-named-property?)``.  ``label``/``relationship_type`` filter;
    ``direction`` BOTH materializes both orientations (reference default,
    ``GraphLoader.java:68``); weights come from ``weight_property`` with
    ``default_weight`` for missing values.
    """
    v = vertices
    if label is not None:
        if v is None or "label" not in v.columns:
            raise ValueError("label filter requires a vertex DataFrame with a 'label' column")
        v = v.filter(F.col("label") == label)
    e = edges
    if relationship_type is not None and "type" in e.columns:
        e = e.filter(F.col("type") == relationship_type)

    wcol = weight_property if weight_property and weight_property in e.columns else None
    sel = [F.col("src"), F.col("dst")]
    if wcol:
        sel.append(F.coalesce(F.col(wcol).cast("double"), F.lit(default_weight)).alias("weight"))
    e = e.select(*sel)

    if v is not None:
        vids = v.select(F.col(v.columns[0]).cast("long").alias("id"))
        e = (
            e.join(vids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(vids.withColumnRenamed("id", "dst"), "dst", "left_semi")
        )

    g = Graph(e, vertices=v, default_weight=default_weight)
    if accumulate_weights:
        g = g.accumulate_weights()
    if direction == INCOMING:
        g = g.reverse()
    elif direction == BOTH:
        g = g.undirected(dedup=undirected_dedup)
    return g


def read_edges(
    spark,
    path: str,
    fmt: str | None = None,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    **options,
) -> DataFrame:
    """Read an edge table from any Spark-supported format into the
    canonical ``(src, dst[, weight])`` shape.

    ``fmt`` in {parquet, orc, csv, json, text}; inferred from the path
    suffix when omitted.  ``text`` parses whitespace-separated
    ``src dst [weight]`` edge-list lines ('#' comments skipped) — the
    SNAP/webgraph interchange format — entirely with JVM expressions.
    CSV defaults to header=true with schema inference unless options
    override.  Everything else is a plain ``spark.read``: column
    pruning and predicate pushdown stay with the source."""
    if fmt is None:
        suffix = path.rstrip("/").rsplit(".", 1)[-1].lower()
        fmt = suffix if suffix in {"parquet", "orc", "csv", "json", "txt", "text", "tsv"} else "parquet"
    fmt = {"txt": "text", "tsv": "csv"}.get(fmt, fmt)
    if fmt == "text":
        lines = spark.read.text(path)
        toks = F.split(F.trim(F.col("value")), r"\s+")
        parsed = (
            lines.filter(~F.col("value").rlike(r"^\s*(#|$)"))
            .select(
                toks.getItem(0).cast("long").alias("src"),
                toks.getItem(1).cast("long").alias("dst"),
                toks.getItem(2).cast("double").alias("weight"),
            )
        )
        return parsed if weight is not None else parsed.select("src", "dst")
    if fmt == "csv":
        options = {"header": "true", "inferSchema": "true", **options}
    df = spark.read.format(fmt).options(**options).load(path)
    sel = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight is not None and weight in df.columns:
        sel.append(F.col(weight).cast("double").alias("weight"))
    return df.select(*sel)
