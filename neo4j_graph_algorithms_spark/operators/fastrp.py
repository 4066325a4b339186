"""FastRP node embeddings — very-sparse random projection + mean
propagation (Chen, Sultornsanee, Zhang & Skiena 2019; GDS-era
``gds.fastRP`` shape; the reference has no embedding surface).

The embedding-at-scale recipe: project each node to a d-dimensional
very-sparse random vector, then propagate L rounds of neighbor-mean
smoothing and return a weighted sum of the (per-node L2-normalized)
rounds.  Equivalent to projecting powers of the normalized adjacency
matrix — the structural signal node2vec walks sample stochastically —
at the cost of L superstep joins, no walks, no training.

**Determinism = oracle-checkable embeddings.**  The init value for
(node, dim) is drawn from md5(seed:dim:id) — bucket h mod 6 → +√3 /
−√3 / 0 (Achlioptas/Li very-sparse projection, s = 3), scaled 1/√d —
no RNG state, so the driver query's DuckDB oracle replays every float
of every embedding with the identical arithmetic.

Spark shape (the ``operators/eigenvector.py`` discipline, but with
**zero global aggregates**): embeddings are d double columns, one
``groupBy(dst).avg`` gather per round (map-side combined — hub in-
degree collapses before the exchange), and the per-round L2
normalization is *per node* (a row-local expression, no driver job).
The only materializing actions are the lazy-checkpoint adoptions every
``check_interval`` rounds — FastRP is fixed-round (L = len(weights)),
so there is no convergence test at all.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCache, aqe_suspended, truncate_lineage


@dataclass
class FastRPResult:
    embeddings: DataFrame          # (id long, e0..e{d-1} double)
    dim: int
    iterations_ran: int
    metrics: list[dict] = field(default_factory=list)

    def as_array(self) -> DataFrame:
        """``(id, embedding array<double>)`` — the similarity-search
        input shape (``functions/similarity.py``)."""
        cols = [f"e{j}" for j in range(self.dim)]
        return self.embeddings.select(
            "id", F.array(*cols).alias("embedding")
        )


def _init_component(j: int, seed: int, inv_sqrt_d: float):
    """±√3/√d with probability 1/6 each, else 0 — bucket = (60-bit
    md5(seed:j:id)) mod 6; identical arithmetic in the SQL oracle."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(int(seed)), F.lit(j), F.col("id"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    b = F.pmod(h, F.lit(6))
    v = math.sqrt(3.0) * inv_sqrt_d
    return (
        F.when(b == 0, F.lit(v)).when(b == 1, F.lit(-v)).otherwise(F.lit(0.0))
    )


def fastrp(
    graph: Graph,
    embedding_dim: int = 64,
    iteration_weights: tuple = (0.0, 1.0, 1.0),
    seed: int = 0,
    direction_both: bool = True,
    check_interval: int = 2,
    weighted: bool = False,
) -> FastRPResult:
    """d-dimensional embeddings after ``len(iteration_weights)`` rounds
    of neighbor-mean propagation; round l's per-node-normalized state
    contributes ``iteration_weights[l]`` to the output sum.

    ``direction_both=True`` (default) symmetrizes the edge set first —
    embeddings of an undirected neighborhood; ``False`` propagates
    along in-edges only (dst gathers from src).  ``weighted=True``
    replaces the neighbor mean with the weight-weighted mean
    ``Σ w·x / Σ w`` (GDS relationship-weight semantics); the plan is
    unchanged — still one map-side-combined gather per round."""
    d = int(embedding_dim)
    xcols = [f"x{j}" for j in range(d)]
    ecols = [f"e{j}" for j in range(d)]
    weights = [float(w) for w in iteration_weights]
    spark = graph.spark
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    inv_sqrt_d = 1.0 / math.sqrt(float(d))

    with aqe_suspended(spark):
        # ONE evaluation of the user's edge subtree: persist the raw
        # projection; message table and vertex set derive from the cache
        ecols_in = ["src", "dst"] + (["weight"] if weighted else [])
        base = graph.edges.select(*ecols_in).persist()
        base.count()
        e = base
        if direction_both:
            e = e.union(
                e.select(
                    F.col("dst").alias("src"),
                    F.col("src").alias("dst"),
                    *(["weight"] if weighted else []),
                )
            )
        e = e.dropDuplicates(["src", "dst"]).repartition(n_part, "src").persist()
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
            "id",
            *[_init_component(j, seed, inv_sqrt_d).alias(c) for j, c in enumerate(xcols)],
            *[F.lit(0.0).alias(c) for c in ecols],
        )
        state = truncate_lineage(state.repartition(n_part, "id"))
        cache = SuperstepCache(spark)
        cache.track(state)
        base.unpersist()  # message table persisted, state checkpointed

        metrics: list[dict] = []
        k = max(1, int(check_interval))
        pending: list[DataFrame] = []
        it = 0
        for w in weights:
            it += 1
            t0 = time.time()
            msgs = (
                e.join(
                    state.select(F.col("id").alias("src"), *xcols).hint(
                        "SHUFFLE_HASH"
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(
                    *(
                        [
                            (
                                F.sum(F.col("weight") * F.col(c))
                                / F.sum("weight")
                            ).alias(f"g{j}")
                            for j, c in enumerate(xcols)
                        ]
                        if weighted
                        else [
                            F.avg(c).alias(f"g{j}")
                            for j, c in enumerate(xcols)
                        ]
                    )
                )
                .hint("SHUFFLE_HASH")
            )
            joined = state.join(msgs, state["id"] == msgs["dst"], "left")
            g = [F.coalesce(msgs[f"g{j}"], F.lit(0.0)) for j in range(d)]
            nrm = F.sqrt(sum(gj * gj for gj in g))
            xn = [
                F.when(nrm > 0.0, gj / nrm).otherwise(F.lit(0.0)) for gj in g
            ]
            state = joined.select(
                state["id"],
                *[xnj.alias(c) for xnj, c in zip(xn, xcols)],
                *[
                    (state[ec] + F.lit(w) * xnj).alias(ec)
                    for ec, xnj in zip(ecols, xn)
                ],
            )
            state = truncate_lineage(state, eager=False)
            pending.append(state)
            if it % k == 0 or it == len(weights):
                state.count()  # materialize the batch
                cache.track(*pending)
                pending = []
                metrics.append(
                    {
                        "algorithm": "fastrp",
                        "iteration": it,
                        "wall_ms": int(1000 * (time.time() - t0)),
                    }
                )
        e.unpersist()
    return FastRPResult(
        embeddings=state.select("id", *ecols),
        dim=d,
        iterations_ran=it,
        metrics=metrics,
    )
