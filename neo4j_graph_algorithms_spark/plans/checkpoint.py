"""Per-superstep checkpoint + metrics so iterative runs resume mid-algorithm.

Two jobs, one mechanism (SURVEY.md §7 risk register):

1. **Lineage truncation.**  An iterative DataFrame loop grows an
   unbounded logical plan; ``truncate_lineage`` breaks it every
   superstep (``localCheckpoint(eager=True)``) — on a cluster, with a
   durable ``checkpoint_dir``, a parquet round-trip instead.
2. **Resume.**  With a ``SuperstepCheckpointer`` the state DataFrames of
   every k-th superstep land in a durable table
   (``{dir}/{algo}/{run_id}/iter=NNNN/{name}``, parquet here; Iceberg
   when its catalog jars are on the classpath — gated import-try) plus a
   ``metrics.jsonl`` row per superstep (messages sent, delta-norm, skew
   ratio, wall ms — the north rule's per-partition lineage + metrics).
   A rerun with the same dir/run_id restarts from the last *committed*
   iteration (commit marker written after the data), not from scratch.

The reference has no such machinery (its runs are single-process,
minutes-long); at 10^12 edges a 40-superstep PageRank **will** lose an
executor, so resumability is a first-class design input, not a bolt-on.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def _checkpoint_storage_level():
    """Storage level for superstep checkpoints — SERIALIZED by default.

    ``localCheckpoint``'s implicit level stores one UnsafeRow object
    per row; at 5M vertices × several live levels that is tens of
    millions of small heap objects per superstep batch, and -Xlog:gc
    runs showed 32% of a 32-core leg's wall in G1 pauses
    (BENCH/BASELINE.md).  Serialized storage packs each cached
    partition into a handful of large byte buffers instead: measured
    on the identical 20M-edge north run, total GC pause time fell
    148.9 s → 28.5 s (5.2×) and the cached footprint 4.6 GB → 0.9 GB
    (5×), results bit-identical — so it is the default, and the cache
    density matters even more at executor-scale heaps.
    ``SPARK_GRAFT_CKPT_STORAGE`` overrides: ``deser`` (or ``default``)
    restores the per-row-object level, any ``StorageLevel`` attribute
    name picks that level.
    """
    name = os.environ.get("SPARK_GRAFT_CKPT_STORAGE", "").strip().lower()
    from pyspark.storagelevel import StorageLevel

    # PySpark-4 naming: MEMORY_AND_DISK is the *serialized* level and
    # MEMORY_AND_DISK_DESER the per-row-object one (localCheckpoint's
    # implicit default).  Keep the unambiguous _ser alias.
    if not name or name == "memory_and_disk_ser":
        return StorageLevel.MEMORY_AND_DISK
    if name in ("default", "deser", "memory_and_disk_deser"):
        return None
    return getattr(StorageLevel, name.upper())


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Break lineage without durable storage (single-run loops)."""
    level = _checkpoint_storage_level()
    if level is None:
        return df.localCheckpoint(eager=eager)
    return df.localCheckpoint(eager=eager, storageLevel=level)


def checkpoint_rdd_id(df: DataFrame) -> int | None:
    """Id of the checkpoint RDD backing a ``localCheckpoint``-ed
    DataFrame (its analyzed plan is a ``LogicalRDD``), else None."""
    try:
        plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
        if plan.getClass().getName().endswith(".LogicalRDD"):
            return int(plan.rdd().id())
    except Exception:
        return None
    return None


# AQE (spark.sql.adaptive.enabled) is session-global; iterative
# operators suspend it for their superstep loops (the loops' joins are
# exchange-free by co-partitioning, so AQE only adds replanning
# latency).  The save/restore is guarded by a refcounted lock so
# nested/concurrent operator runs on one session restore the ORIGINAL
# value exactly once — never each other's intermediate state.  Note the
# conf stays off for any query that overlaps the suspension window;
# that is inherent to a session-global knob and documented here.
_AQE_LOCK = threading.Lock()
_AQE_STATE: dict[int, tuple[int, str]] = {}  # session hash -> (depth, saved)


@contextmanager
def shuffle_partitions_override(spark: SparkSession):
    """Yield a setter for ``spark.sql.shuffle.partitions`` whose effect
    is guaranteed to be rolled back when the block exits — the
    restore-safe way for an operator to raise the session's partition
    count mid-run (e.g. the fold engine's build-side memory floor,
    which learns |V| only after the load phase has begun).  The setter
    may be called zero or more times; the ORIGINAL value is restored
    exactly once."""
    saved = spark.conf.get("spark.sql.shuffle.partitions", "200")

    def set_np(n: int) -> None:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(n)))

    try:
        yield set_np
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


@contextmanager
def aqe_suspended(spark: SparkSession, enabled: bool = False):
    if enabled:  # caller asked to leave AQE alone
        yield
        return
    key = id(spark)
    with _AQE_LOCK:
        depth, saved = _AQE_STATE.get(key, (0, None))
        if depth == 0:
            saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        _AQE_STATE[key] = (depth + 1, saved)
    try:
        yield
    finally:
        with _AQE_LOCK:
            depth, saved = _AQE_STATE[key]
            if depth == 1:
                spark.conf.set("spark.sql.adaptive.enabled", saved)
                del _AQE_STATE[key]
            else:
                _AQE_STATE[key] = (depth - 1, saved)


class SuperstepCache:
    """Retires stale per-superstep checkpoint RDDs.

    ``localCheckpoint`` caches its RDD and never releases it, so an
    iterative loop accumulates one ~|V|-row cached RDD per superstep;
    past ~10 supersteps the cache churn degrades superstep time 2-3x
    (measured) and eventually forces eviction storms.  ``track(*dfs)``
    reads the checkpoint RDD id straight off each DataFrame's
    ``LogicalRDD`` plan and unpersists the previously tracked ids —
    steady-state cache footprint is O(1) supersteps, and RDDs persisted
    by concurrent jobs are never touched (no registry diffing).

    Contract: call ``track`` only after the new state has been
    materialized by an action (count/agg/save) — a locally-checkpointed
    RDD cannot be recomputed once its predecessor is unpersisted.
    """

    def __init__(self, spark: SparkSession):
        self._sc = spark.sparkContext._jsc.sc()  # noqa: SLF001
        self._live: set[int] = set()

    def track(self, *dfs: DataFrame) -> None:
        """Adopt the checkpoint RDDs of ``dfs`` (materialized!) as the
        live superstep state; unpersist the previous live set."""
        new = {rid for df in dfs if (rid := checkpoint_rdd_id(df)) is not None}
        stale = self._live - new
        if stale:
            it = self._sc.getPersistentRDDs().iterator()
            while it.hasNext():
                e = it.next()
                if e._1() in stale:
                    e._2().unpersist(False)
        self._live = new

    def release(self) -> None:
        """Unpersist everything currently tracked."""
        self.track()


class SuperstepCheckpointer:
    """Durable superstep state + metrics for one algorithm run."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str,
        algorithm: str,
        run_id: str = "default",
        keep_last: int = 2,
    ):
        self.spark = spark
        self.root = os.path.join(checkpoint_dir, algorithm, run_id)
        self.keep_last = keep_last
        os.makedirs(self.root, exist_ok=True)
        self._metrics_path = os.path.join(self.root, "metrics.jsonl")

    # ---------------------------------------------------------------- #
    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.root, f"iter={iteration:05d}")

    def _commit_marker(self, iteration: int) -> str:
        return os.path.join(self._iter_dir(iteration), "_COMMITTED")

    def latest_iteration(self) -> int | None:
        """Largest committed iteration, or None."""
        if not os.path.isdir(self.root):
            return None
        its = []
        for name in os.listdir(self.root):
            if name.startswith("iter=") and os.path.exists(
                os.path.join(self.root, name, "_COMMITTED")
            ):
                its.append(int(name.split("=", 1)[1]))
        return max(its) if its else None

    def save(
        self,
        iteration: int,
        state: dict[str, DataFrame],
        metrics: dict | None = None,
    ) -> dict[str, DataFrame]:
        """Persist state DataFrames; returns them re-read (lineage cut).

        Data is written first, the commit marker last, so a crash
        mid-write leaves an uncommitted (ignored) iteration.
        """
        d = self._iter_dir(iteration)
        t0 = time.time()
        part_stats: dict[str, dict] = {}
        for name, df in state.items():
            path = os.path.join(d, name)
            df.write.mode("overwrite").parquet(path)
            # per-partition lineage record: one parquet part per task
            # partition — sizes expose write skew without re-reading
            sizes = sorted(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.startswith("part-")
            )
            if sizes:
                part_stats[name] = {
                    "partitions": len(sizes),
                    "bytes_total": int(sum(sizes)),
                    "bytes_max": int(sizes[-1]),
                    "bytes_skew": round(
                        sizes[-1] / (sum(sizes) / len(sizes)), 3
                    ),
                }
        row = {
            "iteration": iteration,
            "write_ms": int(1000 * (time.time() - t0)),
            "partition_stats": part_stats,
            **(metrics or {}),
        }
        with open(self._metrics_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        with open(self._commit_marker(iteration), "w") as fh:
            fh.write("ok")
        self._gc(iteration)
        return self.load(iteration, list(state))

    def load(self, iteration: int, names: list[str]) -> dict[str, DataFrame]:
        d = self._iter_dir(iteration)
        return {n: self.spark.read.parquet(os.path.join(d, n)) for n in names}

    def metrics(self) -> list[dict]:
        if not os.path.exists(self._metrics_path):
            return []
        with open(self._metrics_path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def _gc(self, current: int) -> None:
        """Drop committed iterations older than ``keep_last``."""
        keep = {current - k for k in range(self.keep_last)}
        for name in os.listdir(self.root):
            if not name.startswith("iter="):
                continue
            it = int(name.split("=", 1)[1])
            if it not in keep and os.path.exists(
                os.path.join(self.root, name, "_COMMITTED")
            ):
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)


def skew_ratio(df: DataFrame, key: str = "dst") -> float:
    """max/mean key-group size — the per-superstep skew metric."""
    from pyspark.sql import functions as F

    row = (
        df.groupBy(key)
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("av"))
        .first()
    )
    if row is None or not row["av"]:
        return 1.0
    return float(row["mx"]) / float(row["av"])
