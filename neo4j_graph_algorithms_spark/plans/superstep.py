"""Public superstep-fixpoint primitive — write custom iterative graph
algorithms with the engine's own loop discipline.

Every iterative operator in this engine (PageRank, WCC, label
propagation, SCC, k-core, Louvain, ANF, …) is the same loop wearing a
different step function: transform the state DataFrame, cut its
lineage so the plan stays constant-size, materialize once per check
boundary, retire the previous superstep's cached checkpoint, stop at a
fixpoint, optionally persist every state durably so the run resumes
mid-algorithm (the reference has no public analogue — its
``Algorithm`` base class, ``core/.../Algorithm.java:28-58``, is
termination/progress plumbing only; users cannot bring their own
superstep).

``superstep_fixpoint`` extracts that loop.  The caller supplies only
the per-superstep transformation; the engine supplies everything that
makes it survive 10^12 edges: lazy lineage truncation (constant-size
plans instead of exponentially growing ones), ``SuperstepCache``
checkpoint retirement (O(1)-supersteps cache footprint), batched
convergence checks (one driver job per ``check_interval`` lazily
cached levels), AQE suspension around the loop, and optional durable
``SuperstepCheckpointer`` saves with resume.

Contract for ``step(state, iteration) -> DataFrame``:

- must return a DataFrame with the same id/user columns plus a boolean
  ``changed`` column (name configurable);
- must be a *pure plan builder* — called once per superstep, no
  actions inside;
- when ``check_interval > 1`` the step must be **idempotent at the
  fixpoint** (a superstep applied to converged state changes nothing)
  — the same requirement the built-in operators document for their
  batched checks.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import (
    SuperstepCache,
    SuperstepCheckpointer,
    aqe_suspended,
    truncate_lineage,
)


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations_ran: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def superstep_fixpoint(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iterations: int = 100,
    changed_col: str = "changed",
    check_interval: int = 1,
    checkpointer: SuperstepCheckpointer | None = None,
    checkpoint_interval: int = 1,
    partition_cols: list[str] | None = None,
    algorithm: str = "custom",
) -> SuperstepResult:
    """Iterate ``step`` until no row has ``changed_col`` true (or
    ``max_iterations``).  Returns the final state WITHOUT the
    ``changed`` column.

    ``partition_cols``: hash-partition the initial state on these
    columns (e.g. ``["id"]``) so a co-partitioned step plan stays
    exchange-free on the state side, like the built-in operators.
    """
    spark = state.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    with aqe_suspended(spark):
        metrics: list[dict] = []
        start_iter = 0
        if checkpointer is not None:
            last = checkpointer.latest_iteration()
            if last is not None:
                state = checkpointer.load(last, ["state"])["state"]
                start_iter = last
                metrics = checkpointer.metrics()
        if partition_cols:
            state = state.repartition(n_part, *partition_cols)
        cache = SuperstepCache(spark)
        state = truncate_lineage(state)
        cache.track(state)

        it = start_iter
        k = max(1, int(check_interval)) if checkpointer is None else 1
        pending: list[DataFrame] = []
        converged = False
        user_cols = [c for c in state.columns if c != changed_col]
        while it < max_iterations:
            it += 1
            t0 = time.time()
            nxt = step(state.select(*user_cols), it)
            if changed_col not in nxt.columns:
                raise ValueError(
                    f"step() must return a '{changed_col}' boolean column; "
                    f"got {nxt.columns}"
                )
            if checkpointer is not None and it % checkpoint_interval == 0:
                nxt = checkpointer.save(
                    it, {"state": nxt}, {"algorithm": algorithm}
                )["state"]
            else:
                nxt = truncate_lineage(nxt, eager=False)
            pending.append(nxt)
            state = nxt
            if it % k == 0 or it >= max_iterations:
                changed = nxt.filter(F.col(changed_col)).count()
                cache.track(*pending)  # batch materialized by the count
                pending = []
                metrics.append(
                    {
                        "algorithm": algorithm,
                        "iteration": it,
                        "changed": int(changed),
                        "wall_ms": int(1000 * (time.time() - t0)),
                    }
                )
                if changed == 0:
                    converged = True
                    break
    return SuperstepResult(
        state=state.select(*user_cols),
        iterations_ran=it,
        converged=converged,
        metrics=metrics,
    )
