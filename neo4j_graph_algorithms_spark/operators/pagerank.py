"""PageRank — delta-push power iteration as a superstep DataFrame loop.

Reference semantics (``algo/src/main/java/org/neo4j/graphalgo/impl/
PageRank.java``, proc ``PageRankProc.java:52-56``):

- non-normalized Google formula ``PR(v) = (1-d) + d·Σ PR(u)/outdeg(u)``
  over in-neighbors u (``doc/pagerank.adoc:16-18``);
- init ``rank = delta = 1-d`` (``PageRank.java:416,444-453``);
- each iteration every node with ``delta>0`` pushes ``delta/outdeg`` to
  its out-neighbors (``PageRank.java:455-481``); the received sum is
  scaled by d and added: ``rank += d·Σ; delta = d·Σ``
  (``PageRank.java:505-517``);
- **dangling nodes do not redistribute mass and nothing is normalized**
  (guarded by ``tests/.../impl/PageRankWikiTest.java:131-141``);
- fixed iteration count by default (no convergence test in the
  reference, ``PageRank.java:159-164``); we additionally support
  ``tolerance`` for the north rule's "supersteps to 1e-6 convergence".
- the reference quantizes messages to ``int(100_000·x)``
  (``PageRank.java:54,464``) as a lock-free-accumulation trick; shuffle
  aggregation makes that unnecessary — we keep float64, which *improves*
  on reference precision while staying inside its test tolerances.

Spark shape per superstep (SURVEY.md §2.2):

    msgs  = edges ⋈ frontier(src)  →  groupBy(dst).sum(delta/outdeg)
    state = state ⟕ msgs           →  rank += d·msg ; delta = d·msg

Scale notes (the part that must survive 10^12 edges):

- **co-partitioning = one shuffle per superstep**: edges are persisted
  hash-partitioned by ``src`` and state by ``id`` on the same partition
  count, so the scatter join reuses both partitionings with no
  exchange; the only shuffle is the gather ``groupBy(dst)`` — the
  reference's all-to-all score transpose (``PageRank.java:55-83``),
  which no engine can elide.  The msgs→state join is likewise
  exchange-free (groupBy leaves msgs partitioned on the join key).
- the gather is map-side combined (partial aggregation), so hub
  in-degree skew collapses before the exchange — one partial per map
  partition, not one row per edge;
- both superstep joins carry a per-plan SHUFFLE_HASH hint: without
  stats on checkpointed state, Catalyst's fallback is sort-merge —
  which would re-sort the FULL edge set every superstep.  SHJ streams
  edges unsorted against a per-partition hash map of the small side.
  ``broadcast_frontier_rows`` (opt-in, default off) switches the
  scatter to a broadcast join below that frontier size — it saves
  nothing over the co-partitioned SHJ (both touch every edge
  partition) but is kept for A/B measurement;
- per-superstep driver work is minimized: lineage is cut with a *lazy*
  localCheckpoint and the only materializing job is the aggregate
  (max-delta + active count in tolerance mode, active count alone in
  fixed mode), which is also what makes retiring the previous
  superstep's checkpoint RDD safe.  Both modes can batch it across k
  supersteps (``aggregate_interval`` / ``tolerance_check_interval``)
  — one driver job amortized over k lazily-checkpointed levels;
- durable resume + metrics via ``SuperstepCheckpointer``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import os as _os

from ..graph import Graph
from ..plans.checkpoint import (
    SuperstepCache,
    SuperstepCheckpointer,
    aqe_suspended,
    shuffle_partitions_override,
    skew_ratio,
    truncate_lineage,
)

#: per-partition hash-build budget for the superstep joins (bytes).
#: A LongHashedRelation build that outgrows the task memory grant
#: fails hard ("Can't acquire N bytes memory to build hash relation");
#: 128 MiB stays far under any sane task grant while never triggering
#: at bench scale.  Override via SPARK_GRAFT_SHJ_BUILD_TARGET.
_SHJ_BUILD_TARGET = int(
    _os.environ.get("SPARK_GRAFT_SHJ_BUILD_TARGET", str(128 << 20))
)


@dataclass
class PageRankResult:
    scores: DataFrame              # (id long, score double)
    iterations_ran: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)
    damping: float = 0.85
    load_millis: int = 0
    compute_millis: int = 0
    write_millis: int = 0

    def stats(self) -> DataFrame:
        """One-row write-mode YIELD parity — ``(nodes, iterations,
        dampingFactor, loadMillis, computeMillis, writeMillis)``
        (``PageRankProc.java`` write mode / ``results/PageRankScore.Stats``)."""
        return self.scores.sparkSession.createDataFrame(
            [
                (
                    self.scores.count(),
                    self.iterations_ran,
                    self.damping,
                    self.load_millis,
                    self.compute_millis,
                    self.write_millis,
                )
            ],
            "nodes long, iterations long, damping_factor double, "
            "load_millis long, compute_millis long, write_millis long",
        )


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    max_iterations: int = 20,
    tolerance: float | None = None,
    checkpointer: SuperstepCheckpointer | None = None,
    checkpoint_interval: int = 1,
    broadcast_frontier_rows: int | None = None,
    collect_skew_metric: bool = False,
    adaptive: bool = False,
    storage: str = "edges",
    hub_degree: int = 100_000,
    aggregate_interval: int = 4,
    weighted: bool = False,
    source_nodes: list[int] | None = None,
    tolerance_check_interval: int = 1,
) -> PageRankResult:
    """Run PageRank; defaults mirror ``PageRankProc.java:52-56``
    (damping 0.85, 20 iterations, unweighted, OUTGOING edges).

    Beyond-reference variants (GDS-era surface, same delta-push loop):

    - ``weighted=True``: a node pushes ``delta · w(s,t) / W(s)`` with
      ``W(s)`` its total outgoing weight (requires ``storage='edges'``).
    - ``source_nodes``: personalized PageRank — the (1-d) teleport mass
      starts (and implicitly restarts) only at the given sources; all
      other vertices init at 0.  Scores are the non-normalized
      source-seeded recurrence, reference-style.

    ``storage`` picks the scatter-side layout:

    - ``"edges"`` (default): flat ``(src, dst, outdeg)`` rows — the
      better choice when the frontier is a tiny fraction of vertices.
    - ``"adjacency"``: salted CSR-style adjacency blocks
      ``(src, dsts array<long>, degree)`` — the reference's CSR
      (``HugeGraphFactory.java:360-395``) as the north rule asks.  The
      per-superstep join touches one row per (active) vertex instead of
      one per edge; hubs above ``hub_degree`` are split across salted
      rows so one row never carries an unbounded array.

    ``adaptive=False`` suspends AQE for the superstep loop (restored
    after, refcounted across overlapping runs): the loop's joins are
    exchange-free by co-partitioning, so AQE only adds per-stage
    replanning latency; its skew-join splitting has nothing to split
    here (the gather is an aggregation, absorbed by map-side partial
    agg).  Pass ``adaptive=True`` to leave AQE on — e.g. when the edge
    build is part of this job's plan and skewed.

    ``aggregate_interval``: in fixed-iteration mode, run the
    materializing active-count aggregate every k supersteps instead of
    every superstep — one driver job amortized over k lazily-
    checkpointed levels (bit-identical results; ~35% lower superstep
    latency at k=3-4 on small inputs).  Forced to 1 in tolerance mode
    (the convergence test needs every superstep's max-delta), with a
    checkpointer (durable saves are per superstep batch anyway), or
    when ``broadcast_frontier_rows`` is set (the decision needs a
    per-superstep frontier size).

    ``tolerance_check_interval``: in tolerance mode, test convergence
    (the materializing max-delta aggregate) every k supersteps instead
    of every superstep.  The run may overshoot the minimal stopping
    point by up to k-1 supersteps — ``iterations_ran`` counts the
    supersteps actually applied, and the returned scores are at least
    as converged (delta shrinks monotonically under power iteration).
    Periodic convergence checks are the standard trade at cluster
    scale: k-1 cheap extra supersteps against k× fewer driver
    round-trips.  Default 1 preserves exact minimal-stop semantics."""
    with aqe_suspended(graph.spark, enabled=adaptive):
        return _run(
            graph,
            damping,
            max_iterations,
            tolerance,
            checkpointer,
            checkpoint_interval,
            broadcast_frontier_rows,
            collect_skew_metric,
            storage,
            hub_degree,
            aggregate_interval,
            weighted,
            source_nodes,
            tolerance_check_interval,
        )


def article_rank(
    graph: Graph,
    damping: float = 0.85,
    max_iterations: int = 20,
    tolerance: float | None = None,
    storage: str = "edges",
    hub_degree: int = 100_000,
    aggregate_interval: int = 4,
    tolerance_check_interval: int = 1,
    adaptive: bool = False,
    checkpointer: SuperstepCheckpointer | None = None,
    checkpoint_interval: int = 1,
) -> PageRankResult:
    """ArticleRank (beyond-reference; GDS-era surface) — the PageRank
    recurrence with the push divisor ``outdeg(u) + avg_outdeg`` instead
    of ``outdeg(u)``, damping low-out-degree nodes' influence:

        AR_0(v)     = 1-d
        AR_{k+1}(v) = (1-d) + d·Σ_{(u,v)∈E} AR_k(u) / (outdeg(u) + ō)

    with ``ō = Σ outdeg / |{u: outdeg(u)>0}|`` (exact integer sum and
    count, divided once in float64 — engine and SQL oracle compute the
    identical double).  The recurrence is linear, so the same delta-push
    superstep loop applies unchanged — one scatter join + one gather
    exchange per superstep, SHJ-hinted, lazily checkpointed (module
    header).  Same result/stats surface as :func:`pagerank`."""
    row = (
        graph.edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum("d").alias("s"), F.count(F.lit(1)).alias("n"))
        .first()
    )
    offset = float(row["s"]) / float(row["n"]) if row["n"] else 0.0
    with aqe_suspended(graph.spark, enabled=adaptive):
        return _run(
            graph,
            damping,
            max_iterations,
            tolerance,
            checkpointer,
            checkpoint_interval,
            None,
            False,
            storage,
            hub_degree,
            aggregate_interval,
            False,
            None,
            tolerance_check_interval,
            outdeg_offset=offset,
        )


def _run_edges_fold(
    graph: Graph,
    damping: float,
    max_iterations: int,
    tolerance: float | None,
    aggregate_interval: int,
    weighted: bool,
    source_nodes: list[int] | None,
    tolerance_check_interval: int,
    outdeg_offset: float,
    set_shuffle_partitions=None,
) -> PageRankResult:
    """The hot-path superstep loop (storage='edges', no checkpointer):
    **message-fold PageRank** — there is NO per-superstep |V|-row state
    join or state cache write at all.

    Key identity: ``delta_t(v) = d·msg_t(v)`` and ``rank(v) = init(v) +
    Σ_t d·msg_t(v)`` added in superstep order, so the gather output
    *is* the whole superstep state: ``msgs_t`` (≤ active vertices rows)
    directly yields the next frontier (its ``push = d·msg/outdeg``; the
    destination's out-degree rides the edge table and is gathered with
    a free ``max`` — constant per dst), and ranks are reconstructed at
    each check boundary by ONE order-preserving fold per batch:
    ``collect_list(struct(t, msg))`` → ``array_sort`` →
    ``aggregate(acc + d·msg)`` seeded with the previous rank.  The fold
    reproduces the sequential ``rank += d·msg_t`` recurrence
    bit-for-bit (same addends, same order — absent supersteps add
    exactly 0.0, an FP identity), so results hash-match the unrolled
    SQL oracle and the state-join loop.

    Per superstep this leaves exactly: one co-partitioned scatter join
    (SHUFFLE_HASH, zero exchange), one map-side-combined gather
    exchange, one ≤|active|-row lazy checkpoint.  Per k-superstep batch:
    ONE driver job — the lazily-checkpointed fold (which carries the
    batch-final msg as a ``last_msg`` column) is executed by the stats
    aggregate, so one k·|V|-row fold exchange + one |V|-row rank cache
    write replace the old k |V|-row joins and k |V|-row state cache
    writes, at the old loop's one-job-per-batch dispatch cost.
    Measured ~25% lower superstep latency on the 20M-edge north input;
    the single-job fold keeps small latency-bound graphs at parity with
    the state-join loop (the two-job version was 2x slower there).
    """
    spark = graph.spark
    d = float(damping)
    alpha = 1.0 - d
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    t_load0 = time.time()

    # Evaluate the user's edge subtree EXACTLY ONCE: the edge DataFrame
    # is arbitrary SQL (projections, joins — at 100 TB the expensive
    # scan), and out-degree / odeg-join / vertex derivation would each
    # re-run it.  Persist the src-partitioned base first; everything
    # below reads the cache, and the base is released once the final
    # decorated edge table is materialized.
    cols = ["src", "dst", "weight"] if weighted else ["src", "dst"]
    base = graph.edges.select(*cols)
    if not graph.src_partitioned:
        base = base.repartition(n_part, "src")
    base = base.persist()
    base.count()

    out_deg = base.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if weighted:
        wsum = base.groupBy("src").agg(F.sum("weight").alias("wsum"))
        edges = (
            base.join(wsum, "src")
            .select("src", "dst", (F.col("weight") / F.col("wsum")).alias("share"))
        )
    else:
        # each edge row carries its DESTINATION's out-degree so the
        # gather hands the next frontier everything it needs (msg +
        # odeg) with zero extra joins; dangling dsts get odeg 0 and
        # fall out of the frontier (they absorb rank, push nothing)
        edges = (
            base.join(
                out_deg.select(
                    F.col("src").alias("dst"), F.col("outdeg").alias("odeg")
                ),
                "dst",
                "left",
            )
            .select("src", "dst", F.coalesce("odeg", F.lit(0)).alias("odeg"))
        )
    # vertex set from the cached base (graph.vertices would re-run the
    # user subtree when no explicit vertex table was provided);
    # materialized (eager truncation) BEFORE the loop partitioning is
    # fixed so |V| can size it — see the build-side guard below
    if graph._vertices is not None:  # noqa: SLF001
        verts = graph.vertices
    elif graph.symmetrized:
        verts = base.select(F.col("src").alias("id")).distinct()
    else:
        verts = (
            base.select(F.col("src").alias("id"))
            .union(base.select(F.col("dst").alias("id")))
            .distinct()
        )
    verts = truncate_lineage(verts.repartition(n_part, "id"))
    n_vertices = verts.count()
    cache = SuperstepCache(spark)
    cache.track(verts)  # retired once ranks/frontier adopt below

    # ------------------------------------------------------------------
    # Build-side memory guard (found by the 160M-edge / 2-partition
    # criterion leg, which died with "Can't acquire 1073741824 bytes
    # memory to build hash relation"): the superstep scatter join
    # builds a per-partition hash of the FRONTIER (up to |V| rows), and
    # the per-batch fold join builds one of the k-level message arrays
    # (|V| rows × ~(8 + 24k) bytes).  Neither scales with executor
    # count — only with |V|/n_part — so partitions==cores on a narrow
    # cluster, or any 100-TB run with conservatively few partitions,
    # eventually exceeds a task's memory grant.  Two mechanisms, both
    # plan-level (results bit-identical):
    #   1. floor n_part so the frontier hash build stays under
    #      _SHJ_BUILD_TARGET bytes per partition (~48 B/row in
    #      LongHashedRelation) — partition sizing, the fix the brief
    #      prescribes ("size shuffle partitions so partitions fit");
    #   2. when the fold's array build would still exceed the target,
    #      switch THAT join to sort-merge (MERGE hint): it
    #      sorts-and-spills instead of failing a 1 GB+ allocation —
    #      the same degrade-gracefully shape as the dedup tier's
    #      corpus-sized joins.
    # At bench scales (|V| ≤ 5M, 32 partitions) neither triggers, so
    # the measured north plans are unchanged.
    # ------------------------------------------------------------------
    shj_target = int(_SHJ_BUILD_TARGET)
    needed = -(-n_vertices * 48 // shj_target)  # ceil
    if needed > n_part:
        n_part = int(needed)
        if set_shuffle_partitions is not None:
            # the per-superstep groupBy exchanges read the session
            # conf; raise it too (restore-guaranteed by the caller's
            # shuffle_partitions_override) so gather output partitioning
            # keeps matching the edge table — the SHUFFLE_HASH scatter
            # join stays zero-exchange
            set_shuffle_partitions(n_part)
    edges = edges.repartition(n_part, "src").persist()
    edges.count()

    def denom(col):
        return col + F.lit(outdeg_offset) if outdeg_offset else col

    if source_nodes is not None:
        srcs = spark.createDataFrame([(int(v),) for v in source_nodes], "id long")
        seeded = srcs.withColumn("seeded", F.lit(True))
        ranks = verts.join(seeded, "id", "left").select(
            "id",
            F.when(F.col("seeded"), F.lit(alpha)).otherwise(F.lit(0.0)).alias("rank"),
        )
        starts = srcs
    else:
        ranks = verts.select("id", F.lit(alpha).alias("rank"))
        starts = verts.select("id")
    ranks = truncate_lineage(ranks.repartition(n_part, "id"))
    if weighted:
        frontier = starts.select(F.col("id").alias("src"), F.lit(alpha).alias("delta"))
    else:
        # inner join: vertices without out-edges push nothing
        frontier = starts.join(out_deg.withColumnRenamed("src", "id"), "id").select(
            F.col("id").alias("src"),
            (F.lit(alpha) / denom(F.col("outdeg"))).alias("push"),
        )
    frontier = truncate_lineage(frontier)
    base.unpersist()  # every downstream read now hits `edges`/the inits
    cache.track(ranks, frontier)
    load_millis = int(1000 * (time.time() - t_load0))
    t_compute0 = time.time()

    interval = max(
        1, int(tolerance_check_interval if tolerance is not None else aggregate_interval)
    )
    # fold-join strategy by estimated per-partition build bytes (guard
    # mechanism 2 above); at bench scale this stays SHUFFLE_HASH
    fold_hint = (
        "MERGE"
        if n_vertices * (8 + 24 * interval) // n_part > shj_target
        else "SHUFFLE_HASH"
    )
    metrics: list[dict] = []
    batch: list[tuple[int, DataFrame]] = []
    converged = False
    it = 0
    msgs = None
    while it < max_iterations:
        it += 1
        t0 = time.time()
        contrib = F.col("delta") * F.col("share") if weighted else F.col("push")
        aggs = [F.sum(contrib).alias("msg")]
        if not weighted:
            aggs.append(F.max("odeg").alias("odeg"))
        msgs = (
            edges.join(frontier.hint("SHUFFLE_HASH"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(*aggs)
        )
        msgs = truncate_lineage(msgs, eager=False)
        batch.append((it, msgs))
        if weighted:
            frontier = msgs.filter(F.col("msg") != 0.0).select(
                F.col("id").alias("src"), (F.lit(d) * F.col("msg")).alias("delta")
            )
        else:
            frontier = msgs.filter(
                (F.col("msg") != 0.0) & (F.col("odeg") > 0)
            ).select(
                F.col("id").alias("src"),
                ((F.lit(d) * F.col("msg")) / denom(F.col("odeg"))).alias("push"),
            )
        iter_metrics: dict = {"algorithm": "pagerank"}
        if it % interval == 0 or it >= max_iterations:
            # fold the batch into ranks, in superstep order (bit-exact),
            # carrying the batch-FINAL level's msg as a column so ONE
            # lazily-checkpointed aggregate both materializes the whole
            # batch (each msgs level caches as it computes) and yields
            # the convergence stats — one driver job per batch, not the
            # former stats-job + eager-fold pair (2x on latency-bound
            # small graphs where the job dispatch is the whole cost)
            tagged = None
            lvl_cols = ["msg"] if weighted else ["msg", "odeg"]
            for t, m in batch:
                part = m.select("id", F.lit(t).alias("t"), *lvl_cols)
                tagged = part if tagged is None else tagged.unionByName(part)
            arr_aggs = [F.collect_list(F.struct("t", "msg")).alias("am")]
            if not weighted:
                # odeg is constant per vertex; max over the levels that
                # carried it reproduces it for the frontier rebuild
                arr_aggs.append(F.max("odeg").alias("odeg"))
            arr = tagged.groupBy("id").agg(*arr_aggs)
            folded = ranks.join(arr.hint(fold_hint), "id", "left").select(
                "id",
                F.when(F.col("am").isNull(), F.col("rank"))
                .otherwise(
                    F.aggregate(
                        F.array_sort("am"),
                        F.col("rank"),
                        lambda acc, x: acc + F.lit(d) * x["msg"],
                    )
                )
                .alias("rank"),
                # the level-`it` msg, null when this vertex received
                # nothing in the batch-final superstep (F.get: null on
                # empty/missing — ANSI-safe, unlike element_at)
                F.get(
                    F.filter("am", lambda x: x["t"] == F.lit(it)), 0
                )["msg"].alias("last_msg"),
                *([] if weighted else [F.col("odeg")]),
            )
            folded = truncate_lineage(folded, eager=False)
            stats = folded.agg(
                F.max(F.abs(F.lit(d) * F.col("last_msg"))).alias("max_delta"),
                F.sum(
                    F.when(F.col("last_msg") != 0.0, 1).otherwise(0)
                ).alias("active"),
            ).first()
            iter_metrics.update(
                max_delta=float(stats["max_delta"] or 0.0),
                active_vertices=int(stats["active"] or 0),
            )
            ranks = folded.select("id", "rank")
            # Rebuild the frontier from the TRUNCATED folded state, not
            # from the batch's last msgs level: RDD.doCheckpoint only
            # truncates the first checkpoint-marked RDD it reaches from
            # the job's final RDD (spark.checkpoint.checkpointAllMarked-
            # Ancestors defaults false), so the lazily-marked msgs
            # levels below `folded` never truncate — a frontier chained
            # on msgs accumulates unbounded lineage across batches
            # (StackOverflowError past ~100 supersteps).  Same rows,
            # same expression, so results are unchanged: last_msg IS
            # the batch-final msg and odeg rides the fold.
            if weighted:
                frontier = folded.filter(F.col("last_msg") != 0.0).select(
                    F.col("id").alias("src"),
                    (F.lit(d) * F.col("last_msg")).alias("delta"),
                )
            else:
                frontier = folded.filter(
                    (F.col("last_msg") != 0.0) & (F.col("odeg") > 0)
                ).select(
                    F.col("id").alias("src"),
                    ((F.lit(d) * F.col("last_msg")) / denom(F.col("odeg"))).alias(
                        "push"
                    ),
                )
            # adopt everything (retiring the previous batch), then
            # immediately retire this batch's folded intermediates —
            # the next superstep reads only `folded`
            cache.track(folded, *(m for _, m in batch))
            cache.track(folded)
            batch = []
            iter_metrics["wall_ms"] = int(1000 * (time.time() - t0))
            metrics.append(iter_metrics)
            if tolerance is not None and iter_metrics["max_delta"] < tolerance:
                converged = True
                break
            if iter_metrics["active_vertices"] == 0:
                converged = True
                break
        else:
            iter_metrics["wall_ms"] = int(1000 * (time.time() - t0))
            metrics.append(iter_metrics)

    edges.unpersist()
    scores = ranks.select("id", F.col("rank").alias("score"))
    return PageRankResult(
        scores=scores,
        iterations_ran=it,
        converged=converged,
        metrics=metrics,
        damping=d,
        load_millis=load_millis,
        compute_millis=int(1000 * (time.time() - t_compute0)),
    )


def _run(
    graph: Graph,
    damping: float,
    max_iterations: int,
    tolerance: float | None,
    checkpointer: SuperstepCheckpointer | None,
    checkpoint_interval: int,
    broadcast_frontier_rows: int,
    collect_skew_metric: bool,
    storage: str,
    hub_degree: int,
    aggregate_interval: int = 4,
    weighted: bool = False,
    source_nodes: list[int] | None = None,
    tolerance_check_interval: int = 1,
    outdeg_offset: float = 0.0,
) -> PageRankResult:
    if weighted and storage != "edges":
        raise ValueError("weighted PageRank requires storage='edges'")
    if (
        storage == "edges"
        and checkpointer is None
        and broadcast_frontier_rows is None
        and not collect_skew_metric
    ):
        # hot path: message-fold loop (no per-superstep state join);
        # bit-identical results, ~25% lower superstep latency.  The
        # state-join loop below remains for durable checkpoint/resume
        # (needs per-superstep (rank, delta) rows), the broadcast
        # A/B knob, the skew metric, and adjacency storage.
        with shuffle_partitions_override(graph.spark) as set_np:
            return _run_edges_fold(
                graph,
                damping,
                max_iterations,
                tolerance,
                aggregate_interval,
                weighted,
                source_nodes,
                tolerance_check_interval,
                outdeg_offset,
                set_shuffle_partitions=set_np,
            )
    spark = graph.spark
    t_load0 = time.time()
    d = float(damping)
    alpha = 1.0 - d
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    # Scatter-side layout — weight is ignored in the reference modes
    # (PageRank loads withoutRelationshipWeights, PageRankProc.java:147);
    # weighted=True pushes delta*w/W(s) instead of delta/outdeg.
    if storage == "adjacency":
        edges = (
            graph.adjacency(hub_degree=hub_degree, sort_neighbors=False)
            .select("src", "dsts", "degree")
            .repartition(n_part, "src")
            .persist()
        )
    elif storage == "edges":
        if weighted:
            wsum = graph.edges.groupBy("src").agg(F.sum("weight").alias("wsum"))
            edges = (
                graph.edges.select("src", "dst", "weight")
                .join(wsum, "src")
                .select("src", "dst", (F.col("weight") / F.col("wsum")).alias("share"))
            )
        else:
            # unweighted: the edge table is just (src, dst) — outdeg
            # lives in the STATE (one column), so the per-superstep
            # push delta/outdeg is computed ONCE PER FRONTIER VERTEX
            # instead of once per edge, and the persisted scatter side
            # is a third smaller.  Bit-stable vs the unrolled SQL
            # oracle: the per-edge contribution is the identical
            # double (same operands — division, not a reciprocal),
            # only computed |V| instead of |E| times.
            edges = graph.edges.select("src", "dst")
        if graph.src_partitioned:
            # bucketed edge table (sources/graph_store.py): the scan is
            # already HashPartitioning(src, n) — the degree groupBy and
            # join plan with zero edge-side Exchange, and the persisted
            # layout co-partitions the superstep scatter join exactly
            # like the explicit repartition would.
            edges = edges.persist()
        else:
            edges = edges.repartition(n_part, "src").persist()
    else:
        raise ValueError(f"storage must be 'adjacency' or 'edges', got {storage!r}")
    edges.count()  # materialize once; reused every superstep

    metrics: list[dict] = []
    start_iter = 0
    state = None
    if checkpointer is not None:
        last = checkpointer.latest_iteration()
        if last is not None:
            state = checkpointer.load(last, ["state"])["state"]
            start_iter = last
            metrics = checkpointer.metrics()

    # unweighted edge storage: outdeg lives in the state (one int
    # column carried through the update join) so the push delta/outdeg
    # is computed once per frontier VERTEX, not once per edge, and the
    # persisted scatter side stays a 2-column (src, dst) table
    deg_in_state = storage == "edges" and not weighted
    if state is None:
        if source_nodes is not None:
            srcs = spark.createDataFrame(
                [(int(v),) for v in source_nodes], "id long"
            )
            state = graph.vertices.join(
                srcs.withColumn("seeded", F.lit(True)), "id", "left"
            ).select(
                "id",
                F.when(F.col("seeded"), F.lit(alpha)).otherwise(F.lit(0.0)).alias("rank"),
                F.when(F.col("seeded"), F.lit(alpha)).otherwise(F.lit(0.0)).alias("delta"),
            )
        else:
            state = graph.vertices.select(
                F.col("id"),
                F.lit(alpha).alias("rank"),
                F.lit(alpha).alias("delta"),
            )
    if deg_in_state and "outdeg" not in state.columns:
        # fresh init, or resumed from a pre-outdeg checkpoint: attach
        # the out-degree column (same expression either way)
        out_deg = graph.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("outdeg")
        )
        state = state.join(out_deg, "id", "left").select(
            "id", "rank", "delta", F.coalesce("outdeg", F.lit(0)).alias("outdeg")
        )
    cache = SuperstepCache(spark)
    state = truncate_lineage(state.repartition(n_part, "id"))  # eager
    cache.track(state)
    load_millis = int(1000 * (time.time() - t_load0))
    t_compute0 = time.time()

    converged = False
    it = start_iter
    active_rows = None  # unknown until first aggregate
    agg_interval = max(1, int(aggregate_interval))
    tol_interval = max(1, int(tolerance_check_interval))
    if checkpointer is not None or broadcast_frontier_rows is not None:
        agg_interval = tol_interval = 1
    if tolerance is not None:
        # tolerance mode batches by the convergence-check cadence; the
        # fixed-mode active-count batching knob does not apply
        agg_interval = 1
    pending: list[DataFrame] = []
    while it < max_iterations:
        it += 1
        t0 = time.time()
        if deg_in_state:
            denom = (
                F.col("outdeg") + F.lit(outdeg_offset)
                if outdeg_offset
                else F.col("outdeg")
            )
            frontier = (
                state.filter((F.col("delta") != 0.0) & (F.col("outdeg") > 0))
                .select(
                    F.col("id").alias("src"),
                    (F.col("delta") / denom).alias("push"),
                )
            )
        else:
            frontier = state.filter(F.col("delta") != 0.0).select(
                F.col("id").alias("src"), F.col("delta")
            )
        if (
            broadcast_frontier_rows is not None
            and active_rows is not None
            and active_rows <= broadcast_frontier_rows
        ):
            frontier = F.broadcast(frontier)
        else:
            # SHUFFLE_HASH, not the stats-blind SMJ default: edges
            # stream UNSORTED against a per-partition frontier hash map
            # — an SMJ here re-sorts the full edge set every superstep.
            # Per-plan hint, so no session-conf races (ADVICE r1).
            frontier = frontier.hint("SHUFFLE_HASH")
        if storage == "adjacency":
            denom = (
                F.col("degree") + F.lit(outdeg_offset)
                if outdeg_offset
                else F.col("degree")
            )
            msgs = (
                edges.join(frontier, "src")
                .select(
                    F.explode("dsts").alias("dst"),
                    (F.col("delta") / denom).alias("contrib"),
                )
                .groupBy("dst")
                .agg(F.sum("contrib").alias("msg"))
            )
        else:
            contrib = F.col("delta") * F.col("share") if weighted else F.col("push")
            msgs = (
                edges.join(frontier, "src")
                .groupBy("dst")
                .agg(F.sum(contrib).alias("msg"))
            )
        msgs = msgs.hint("SHUFFLE_HASH")  # build msgs, stream state — no sorts
        keep = [state["outdeg"]] if deg_in_state else []
        new_state = (
            state.join(msgs, state["id"] == msgs["dst"], "left")
            .select(
                state["id"],
                (state["rank"] + F.lit(d) * F.coalesce(msgs["msg"], F.lit(0.0))).alias("rank"),
                (F.lit(d) * F.coalesce(msgs["msg"], F.lit(0.0))).alias("delta"),
                *keep,
            )
        )
        iter_metrics: dict = {"algorithm": "pagerank"}
        if checkpointer is not None and it % checkpoint_interval == 0:
            stats = new_state.agg(
                F.max(F.abs(F.col("delta"))).alias("max_delta"),
                F.sum(F.abs(F.col("delta"))).alias("l1_delta"),
                F.sum(F.when(F.col("delta") != 0.0, 1).otherwise(0)).alias("active"),
            ).first()
            iter_metrics.update(
                max_delta=float(stats["max_delta"] or 0.0),
                l1_delta=float(stats["l1_delta"] or 0.0),
                active_vertices=int(stats["active"] or 0),
                wall_ms=int(1000 * (time.time() - t0)),
            )
            if collect_skew_metric:
                flat = edges.join(frontier.select("src"), "src")
                if storage == "adjacency":
                    flat = flat.select(F.explode("dsts").alias("dst"))
                iter_metrics["skew_ratio"] = skew_ratio(flat, "dst")
            new_state = checkpointer.save(it, {"state": new_state}, iter_metrics)["state"]
        else:
            # lazy lineage cut; in fixed-iteration mode the materializing
            # aggregate runs every ``agg_interval`` supersteps — one
            # driver job amortized over the batch (each batched
            # superstep's lazy checkpoint still caches during that job,
            # so per-level state is resident and retirement stays safe;
            # results are bit-identical, measured ~35% faster at k=3).
            new_state = truncate_lineage(new_state, eager=False)
            pending.append(new_state)
            if tolerance is not None:
                if it % tol_interval == 0 or it >= max_iterations:
                    stats = new_state.agg(
                        F.max(F.abs(F.col("delta"))).alias("max_delta"),
                        F.sum(F.when(F.col("delta") != 0.0, 1).otherwise(0)).alias("active"),
                    ).first()
                    iter_metrics.update(
                        max_delta=float(stats["max_delta"] or 0.0),
                        active_vertices=int(stats["active"] or 0),
                    )
            elif it % agg_interval == 0 or it >= max_iterations:
                row = new_state.agg(
                    F.sum(F.when(F.col("delta") != 0.0, 1).otherwise(0)).alias("active")
                ).first()
                iter_metrics["active_vertices"] = int(row["active"] or 0)
            iter_metrics["wall_ms"] = int(1000 * (time.time() - t0))
        if "active_vertices" in iter_metrics or checkpointer is not None:
            # the batch is materialized: adopt every level of it, retire
            # the previous batch's checkpoints
            cache.track(*(pending or [new_state]))
            pending = []
        metrics.append(iter_metrics)
        active_rows = iter_metrics.get("active_vertices", active_rows)
        state = new_state
        if tolerance is not None and iter_metrics.get("max_delta", tolerance) < tolerance:
            converged = True
            break
        if active_rows == 0:
            converged = True
            break

    edges.unpersist()
    scores = state.select(F.col("id"), F.col("rank").alias("score"))
    return PageRankResult(
        scores=scores,
        iterations_ran=it,
        converged=converged,
        metrics=metrics,
        damping=d,
        load_millis=load_millis,
        compute_millis=int(1000 * (time.time() - t_compute0)),
    )
