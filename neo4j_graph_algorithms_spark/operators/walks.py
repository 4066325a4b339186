"""Random-walk sampling — the graph-embedding input pipeline op.

Beyond the reference's procedure surface (walk sampling arrived with
node2vec/DeepWalk-era tooling); included because walk corpora are the
standard bridge from a link graph to embedding training data.

Determinism by construction: the step choice is
``md5(walk_id ':' step ':' current)`` reduced mod degree — no RNG
state, so walks reproduce across runs/engines bit-for-bit and the
DuckDB oracle replays them exactly.  ``seed`` is mixed into the hash
for independent corpora.

Spark shape: one sorted-adjacency row per vertex (the walk needs
indexed neighbor selection, so rows are unsalted — a degree-d hub
carries a d-element array; cap corpus hubs upstream if d·8B exceeds a
comfortable row size), then ``walk_length`` supersteps of
``walks ⋈ adjacency`` with ``element_at`` — one join per step, no
shuffle of the adjacency side (both sides hash-partitioned on the
current vertex).  Walks at dead ends (no out-neighbors in the chosen
direction) terminate early.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import truncate_lineage


@dataclass
class WalkResult:
    steps: DataFrame               # (walk_id long, step int, vertex long)
    walk_length: int
    walks_per_node: int


def random_walks(
    graph: Graph,
    walk_length: int = 8,
    walks_per_node: int = 1,
    seed: int = 0,
    direction_both: bool = True,
) -> WalkResult:
    """``(walk_id, step, vertex)`` — ``walks_per_node`` deterministic
    walks from every vertex; ``walk_id = vertex * walks_per_node + j``.
    Step 0 is the start vertex; a walk emits fewer than
    ``walk_length + 1`` rows iff it hits a dead end."""
    e = graph.edges.select("src", "dst")
    if direction_both:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.dropDuplicates(["src", "dst"])
    adj = truncate_lineage(
        e.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nb"))
    )

    cur = graph.vertices.select("id").select(
        F.explode(
            F.array(*[F.col("id") * walks_per_node + j for j in range(walks_per_node)])
        ).alias("walk_id"),
        F.col("id").alias("vertex"),
    )
    cur = truncate_lineage(cur)
    out = [cur.select("walk_id", F.lit(0).alias("step"), "vertex")]

    for step in range(1, walk_length + 1):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(int(seed)),
                        F.col("walk_id"),
                        F.lit(step),
                        F.col("vertex"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        nxt = (
            cur.join(adj.withColumnRenamed("src", "vertex").hint("SHUFFLE_HASH"), "vertex")
            .select(
                "walk_id",
                F.element_at(F.col("nb"), (h % F.size("nb") + 1).cast("int")).alias(
                    "vertex"
                ),
            )
        )
        nxt = truncate_lineage(nxt)
        cur = nxt
        # every level stays checkpointed (NOT retired): the final union
        # reads all of them; ownership passes to the caller with the
        # result, like msbfs's per-level frontiers
        out.append(cur.select("walk_id", F.lit(step).alias("step"), "vertex"))

    steps = out[0]
    for lvl in out[1:]:
        steps = steps.unionByName(lvl)
    return WalkResult(
        steps=steps, walk_length=walk_length, walks_per_node=walks_per_node
    )
