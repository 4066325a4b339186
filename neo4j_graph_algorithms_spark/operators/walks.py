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

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import truncate_lineage


@dataclass
class WalkResult:
    steps: DataFrame               # (walk_id long, step int, vertex long)
    walk_length: int
    walks_per_node: int
    _levels: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the per-step checkpoint RDDs backing ``steps``.
        Call ONLY after every read of ``steps`` has been materialized —
        locally-checkpointed levels cannot be recomputed.  Consumers
        that derive-and-materialize (e.g. ``sample_subgraph``) call
        this to keep the cache footprint at O(1) walks."""
        if not self._levels:
            return
        from ..plans.checkpoint import SuperstepCache

        c = SuperstepCache(self._levels[0].sparkSession)
        c.track(*self._levels)
        c.release()
        self._levels = []


def random_walks(
    graph: Graph,
    walk_length: int = 8,
    walks_per_node: int = 1,
    seed: int = 0,
    direction_both: bool = True,
    start_vertices: DataFrame | None = None,
) -> WalkResult:
    """``(walk_id, step, vertex)`` — ``walks_per_node`` deterministic
    walks from every vertex; ``walk_id = vertex * walks_per_node + j``.
    Step 0 is the start vertex; a walk emits fewer than
    ``walk_length + 1`` rows iff it hits a dead end.
    ``start_vertices`` (an ``(id)`` DataFrame) restricts walk origins
    to a seed set — the subgraph-sampling input."""
    e = graph.edges.select("src", "dst")
    if direction_both:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.dropDuplicates(["src", "dst"])
    adj = truncate_lineage(
        e.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nb"))
    )

    starts = (
        graph.vertices.select("id")
        if start_vertices is None
        else start_vertices.select("id")
    )
    cur = starts.select(
        F.explode(
            F.array(*[F.col("id") * walks_per_node + j for j in range(walks_per_node)])
        ).alias("walk_id"),
        F.col("id").alias("vertex"),
    )
    cur = truncate_lineage(cur)
    levels = [adj, cur]
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
        levels.append(cur)
        # every level stays checkpointed (NOT retired): the final union
        # reads all of them; ownership passes to the caller with the
        # result (release() hands it back), like msbfs's frontiers
        out.append(cur.select("walk_id", F.lit(step).alias("step"), "vertex"))

    steps = out[0]
    for lvl in out[1:]:
        steps = steps.unionByName(lvl)
    return WalkResult(
        steps=steps, walk_length=walk_length, walks_per_node=walks_per_node,
        _levels=levels,
    )


def node2vec_walks(
    graph: Graph,
    walk_length: int = 8,
    walks_per_node: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    weight_scale: int = 12,
    seed: int = 0,
    direction_both: bool = True,
) -> WalkResult:
    """Second-order (node2vec) biased walks — ``(walk_id, step, vertex)``.

    Step t ≥ 2 chooses the next vertex with probability proportional to
    the node2vec bias α over the candidates ``N(cur)`` (Grover &
    Leskovec 2016): α = 1/p for returning to ``prev``, 1 for candidates
    adjacent to ``prev``, 1/q otherwise.  Step 1 is uniform (no
    ``prev`` yet).  Edge weights are not used (unweighted node2vec).

    **Deterministic exact weighted choice, no RNG**: biases are
    quantized to integers ``W_back = max(1, round(weight_scale/p))``,
    ``W_common = weight_scale``, ``W_far = max(1, round(weight_scale/
    q))``, and candidate c draws ``W(c)`` md5 keys
    ``md5(seed:walk:step:cur:c:i)``; the walk moves to the candidate
    holding the overall minimum key.  Each key is an iid uniform draw,
    so c wins with probability exactly ``W(c)/ΣW`` — sampling is
    proportional to the quantized bias *by construction*, and the
    choice replays bit-for-bit in any engine with md5 + lexicographic
    string compare (the DuckDB oracle does).

    Spark shape: the step join of :func:`random_walks` plus one more
    hash join per step (``prev``'s sorted neighbor array, for the
    α-class test via ``array_contains``); the key draws are a nested
    ``transform``/``sequence`` higher-order expression — whole-stage
    codegen, no Python.  Per-step cost is O(Σ_cand W(cand)) md5s per
    walk; keep ``weight_scale`` small (p, q are quantized to
    ``weight_scale / W`` anyway) and cap corpus hubs upstream as for
    :func:`random_walks`.
    """
    w_back = max(1, round(weight_scale / p))
    w_common = int(weight_scale)
    w_far = max(1, round(weight_scale / q))

    e = graph.edges.select("src", "dst")
    if direction_both:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.dropDuplicates(["src", "dst"])
    adj = truncate_lineage(
        e.groupBy("src").agg(F.sort_array(F.collect_list("dst")).alias("nb"))
    )

    def key_expr(step: int, cand, weight):
        # min of `weight` iid md5 draws for this candidate — candidate
        # wins the global argmin with probability weight/sum(weights)
        return F.array_min(
            F.transform(
                F.sequence(F.lit(0), weight - 1),
                lambda i: F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(int(seed)),
                        F.col("walk_id"),
                        F.lit(step),
                        F.col("vertex"),
                        cand,
                        i,
                    )
                ),
            )
        )

    start = graph.vertices.select("id").select(
        F.explode(
            F.array(*[F.col("id") * walks_per_node + j for j in range(walks_per_node)])
        ).alias("walk_id"),
        F.col("id").alias("vertex"),
    )
    out = [start.select("walk_id", F.lit(0).alias("step"), "vertex")]

    # step 1: uniform (one draw per candidate)
    cur = (
        start.join(adj.withColumnRenamed("src", "vertex").hint("SHUFFLE_HASH"), "vertex")
        .select(
            "walk_id",
            F.col("vertex").alias("prev"),
            F.array_min(
                F.transform(
                    "nb",
                    lambda c: F.struct(
                        key_expr(1, c, F.lit(1)).alias("k"), c.alias("v")
                    ),
                )
            )["v"].alias("vertex"),
        )
    )
    cur = truncate_lineage(cur)
    levels = [adj, cur]
    out.append(cur.select("walk_id", F.lit(1).alias("step"), "vertex"))

    for step in range(2, walk_length + 1):
        with_nb = (
            cur.join(adj.withColumnRenamed("src", "vertex").hint("SHUFFLE_HASH"), "vertex")
            .join(
                adj.select(
                    F.col("src").alias("prev"), F.col("nb").alias("nb_prev")
                ).hint("SHUFFLE_HASH"),
                "prev",
            )
        )
        nxt = with_nb.select(
            "walk_id",
            F.col("vertex").alias("new_prev"),
            F.array_min(
                F.transform(
                    "nb",
                    lambda c: F.struct(
                        key_expr(
                            step,
                            c,
                            F.when(c == F.col("prev"), F.lit(w_back))
                            .when(F.array_contains("nb_prev", c), F.lit(w_common))
                            .otherwise(F.lit(w_far)),
                        ).alias("k"),
                        c.alias("v"),
                    ),
                )
            )["v"].alias("vertex"),
        ).select("walk_id", F.col("new_prev").alias("prev"), "vertex")
        nxt = truncate_lineage(nxt)
        cur = nxt
        levels.append(cur)
        # levels stay checkpointed for the final union, like random_walks
        out.append(cur.select("walk_id", F.lit(step).alias("step"), "vertex"))

    steps = out[0]
    for lvl in out[1:]:
        steps = steps.unionByName(lvl)
    return WalkResult(
        steps=steps, walk_length=walk_length, walks_per_node=walks_per_node,
        _levels=levels,
    )
