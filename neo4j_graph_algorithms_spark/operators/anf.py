"""Approximate neighborhood function (ANF) — reachable-set sizes and
effective diameter without APSP.

Beyond the reference's surface (its only distance tooling is exact
MS-BFS APSP, quadratic output), but THE canonical link-graph statistic
at 10^12-edge scale: "what fraction of pairs are within t hops" /
"what is the effective diameter" cannot be answered by exact traversal
at that size.  ANF (Palmer, Gibbons & Faloutsos, KDD 2002) and its
HyperBall refinement (Boldi & Vigna) answer it with per-vertex
Flajolet–Martin sketches: a k-replica bitmask per vertex, one
bitwise-OR gather per distance level — the same superstep join +
aggregate plan as WCC, so the 10^12-edge cost model is identical (one
map-side-combined exchange per level; bit_or partials collapse hub
skew the way sum() does for PageRank).

**Determinism = oracle-checkable approximation.**  The sketch bit for
(vertex, replica) is the trailing-zero count of a md5-derived integer
— no RNG — so the *approximate* estimates are exact, replayable
numbers: the DuckDB oracle computes the identical sketches with the
identical bit arithmetic and matches the estimates bit-for-bit (after
the queries' standard 6-decimal rounding).  Accuracy follows the FM
analysis (stddev ≈ 0.78/√k relative); determinism does not change the
estimator's distribution over seeds.

Reference tie-in: masks generalize the ω-packed bitmask gather of the
MS-BFS kernel (``operators/msbfs.py``, ``MultiSourceBFS.java``) — same
``bit_or`` dataflow, but each bit is a sketch register instead of one
exact source, which is exactly the exact→approximate trade that makes
the plan size-independent of |reachable set|.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCache, truncate_lineage

PHI = 0.77351  # Flajolet–Martin bias correction


@dataclass
class AnfResult:
    per_vertex: DataFrame          # (id long, reachable_estimate double)
    nf: list = field(default_factory=list)  # [{distance, nf_estimate}]
    distances_ran: int = 0
    converged: bool = False

    def effective_diameter(self, q: float = 0.9) -> float:
        """Smallest (interpolated) t with NF(t) ≥ q·NF(max) — the ANF
        paper's effective-diameter definition."""
        if not self.nf:
            return float("nan")
        target = q * self.nf[-1]["nf_estimate"]
        prev_t, prev_v = 0.0, 0.0
        for row in self.nf:
            t, v = float(row["distance"]), row["nf_estimate"]
            if v >= target:
                if v == prev_v:
                    return t
                return prev_t + (target - prev_v) / (v - prev_v) * (t - prev_t)
            prev_t, prev_v = t, v
        return float(self.nf[-1]["distance"])


def _init_mask(r: int, seed: int):
    """1 << trailing_zeros(md5-derived 60-bit integer) — the FM
    register bit for replica r (identical arithmetic in the oracle)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(int(seed)), F.lit(r), F.col("id"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    pos = F.least(F.bit_count((h.bitwiseAND(-h)) - 1), F.lit(62))
    # 1 << pos; F.shiftleft needs a literal shift, but 2.0**pos is an
    # exact double for every pos <= 62, so the cast back is exact too
    return F.pow(F.lit(2.0), pos).cast("long")


def _lowest_zero_pos(m):
    """Position of the lowest ZERO bit of mask m (the FM 'R' stat)."""
    y = F.bitwise_not(m)
    return F.bit_count((y.bitwiseAND(-y)) - 1)


def _estimate(cols: list[str]):
    mean_b = sum(_lowest_zero_pos(F.col(c)) for c in cols) / float(len(cols))
    return F.pow(F.lit(2.0), mean_b) / F.lit(PHI)


def neighborhood_function(
    graph: Graph,
    max_distance: int = 16,
    replicas: int = 8,
    seed: int = 0,
    direction_both: bool = True,
) -> AnfResult:
    """Per-vertex reachable-set-size estimates and the neighborhood
    function ``NF(t) = Σ_v |{u : d(v,u) ≤ t}|`` for t = 0..convergence.

    One superstep per distance level: gather ``bit_or`` of neighbor
    masks over the edge join, OR into the vertex's own masks.  Masks
    are absorbing, so the loop stops when a level changes nothing (the
    true diameter has been passed) or at ``max_distance``.  The per-
    level materializing aggregate doubles as the NF(t) readout (sum of
    estimates) and the convergence test (count of changed vertices) —
    one driver job per level, like WCC's fixpoint check.
    """
    k = int(replicas)
    cols = [f"m{r}" for r in range(k)]
    spark = graph.spark
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    # ONE evaluation of the user's edge subtree: persist the raw
    # projection, build the (optionally doubled) message table and the
    # vertex set off that cache — the union + vertex derivation were
    # re-running arbitrary user SQL up to 4x.
    base = graph.edges.select("src", "dst").persist()
    base.count()
    e = base
    if direction_both:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.dropDuplicates(["src", "dst"]).repartition(n_part, "dst").persist()
    e.count()
    if graph._vertices is not None:  # noqa: SLF001
        verts = graph.vertices
    else:
        verts = (
            base.select(F.col("src").alias("id"))
            .union(base.select(F.col("dst").alias("id")))
            .distinct()
        )

    state = verts.select(
        "id", *[_init_mask(r, seed).alias(c) for r, c in enumerate(cols)]
    )
    state = truncate_lineage(state.repartition(n_part, "id"))
    cache = SuperstepCache(spark)
    cache.track(state)
    base.unpersist()  # message table persisted, state checkpointed

    row0 = state.agg(F.sum(_estimate(cols)).alias("nf")).first()
    nf = [{"distance": 0, "nf_estimate": float(row0["nf"])}]

    converged = False
    t = 0
    while t < max_distance:
        t += 1
        msgs = (
            e.join(
                state.select(F.col("id").alias("dst"), *cols).hint("SHUFFLE_HASH"),
                "dst",
            )
            .groupBy("src")
            .agg(*[F.bit_or(c).alias(f"g{r}") for r, c in enumerate(cols)])
        ).hint("SHUFFLE_HASH")
        gathered = [
            F.coalesce(msgs[f"g{r}"], F.lit(0)) for r in range(k)
        ]
        # `chg` rides along in the checkpointed row (one int) so ONE
        # materializing aggregate per level yields both the NF(t)
        # readout and the fixpoint test — the WCC pattern.
        new_state = state.join(msgs, state["id"] == msgs["src"], "left").select(
            state["id"],
            *[
                state[c].bitwiseOR(g).alias(c)
                for c, g in zip(cols, gathered)
            ],
            (
                sum(
                    F.when(state[c].bitwiseOR(g) != state[c], 1).otherwise(0)
                    for c, g in zip(cols, gathered)
                )
                > 0
            )
            .cast("int")
            .alias("chg"),
        )
        new_state = truncate_lineage(new_state, eager=False)
        row = new_state.agg(
            F.sum("chg").alias("changed"),
            F.sum(_estimate(cols)).alias("nf"),
        ).first()
        cache.track(new_state)
        state = new_state
        if int(row["changed"] or 0) == 0:
            # nothing reached further: NF(t) == NF(t-1), diameter passed
            converged = True
            t -= 1
            break
        nf.append({"distance": t, "nf_estimate": float(row["nf"])})

    per_vertex = state.select(
        "id", _estimate(cols).alias("reachable_estimate")
    )
    e.unpersist()
    return AnfResult(
        per_vertex=per_vertex, nf=nf, distances_ran=t, converged=converged
    )
