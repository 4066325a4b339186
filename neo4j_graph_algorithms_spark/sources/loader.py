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
