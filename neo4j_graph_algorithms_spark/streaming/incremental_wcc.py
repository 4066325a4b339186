"""Streaming incremental connected components.

The reference computes WCC from scratch on every ``CALL algo.unionFind``
(``impl/GraphUnionFind.java:41-106``); there is no incremental or
streaming path anywhere in it.  A continuously-ingesting link graph
wants the components table *maintained*, not recomputed — this module
keeps ``(id, set_id)`` current over an edge stream with per-batch work
proportional to the batch, not the graph:

1. **Contract**: map each new edge's endpoints to their current
   ``set_id`` (one bucket-pruned lookup against the components table;
   unseen vertices seed ``set_id = id``).  Edges inside one component
   vanish; what survives is a tiny graph over *component ids*.
2. **Solve**: run the engine's min-label WCC fixpoint on that
   contracted graph — supersteps bounded by the batch's merge diameter,
   scanning only batch-derived rows.
3. **Relabel lazily**: merges are recorded in a small, fully
   path-compressed **redirects** table (``old_set → new_set``) instead
   of eagerly rewriting every member row.  Because every stored
   ``set_id`` resolves (directly or through one redirect hop) to the
   min member id of its component, the maintained view is bit-identical
   to batch ``wcc`` over the accumulated edge set (asserted in tests).

State layout (the 100-TB design — per-batch I/O is O(touched), never
O(|V|)):

- ``base_b{B}/k={K}/`` — the big ``(id, set_id)`` relation, hash
  bucketed into ``n_buckets`` fixed buckets by
  ``pmod(xxhash64(id), n_buckets)``.  A micro-batch reads and rewrites
  ONLY the buckets containing its own vertices (bucket pruning by
  path); every other bucket's current version is carried forward by
  reference in the manifest.
- ``redirects_b{B}/`` — the ``(old_set, new_set)`` merge log, bounded
  by the number of roots ever merged since the last compaction and
  kept **fully compressed** (every ``new_set`` is a live root, so one
  broadcast hash join resolves any stale stored label).  When it grows
  past ``max_redirects`` the batch folds it into the base relation
  (one full rewrite, amortized) and starts an empty log.
- ``manifest_b{B}.json`` — the commit point: which version of each
  bucket and of the redirects log is current, plus per-batch metrics
  (buckets rewritten, merges, redirect rows).  Written last; a
  replayed batch rebuilds from the latest manifest *before* its own id
  and overwrites its own outputs — idempotent, resume-safe, and the
  per-batch lineage record the engine's checkpoint contract asks for.

Read path (:meth:`IncrementalWccSink.components`): scan the current
bucket versions + one broadcast left join against the redirects log —
exchange-free on the big side.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import Graph
from ..operators.wcc import wcc
from ..plans.checkpoint import truncate_lineage

_MANIFEST_RE = re.compile(r"^manifest_b(\d+)\.json$")
_VERSION_DIR_RE = re.compile(r"^(?:base|redirects)_b(\d+)$")


def incremental_wcc_batch(
    components: DataFrame | None,
    new_edges: DataFrame,
    max_iterations: int = 100,
) -> DataFrame:
    """One micro-batch update: fold ``new_edges (src, dst)`` into the
    ``(id, set_id)`` table and return the new table.  DataFrame →
    DataFrame, usable without streaming (e.g. nightly delta loads).
    Batch-bounded intermediates (batch labels, merge graph, relabel
    mapping) are materialized eagerly — cheap, they are batch-sized —
    so the returned plan references ``components`` exactly ONCE and
    only through map-side broadcast joins: the history-sized side is
    never shuffled, sorted, or re-derived, and chaining n folds lazily
    stays linear in n."""
    spark = new_edges.sparkSession
    if components is None:
        components = spark.createDataFrame([], "id long, set_id long")

    batch_vertices = (
        new_edges.select(F.col("src").cast("long").alias("id"))
        .unionByName(new_edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
    )
    # label lookup with the BATCH side broadcast (same shape as
    # IncrementalWccSink's bucket read): the components table — the
    # history-sized side — is scanned once and map-side joined, never
    # shuffled or sorted; everything exchanged below is batch-bounded.
    # The batch-bounded intermediates are lineage-cut (cheap — they are
    # batch-sized) so repeated references below, and across chained
    # folds, never re-expand the history-sized subtree: the returned
    # table references `components` exactly once, keeping an n-fold
    # lazy composition linear in n.
    seen = truncate_lineage(
        components.join(F.broadcast(batch_vertices), "id")  # (id, set_id)
    )
    unseen = truncate_lineage(
        batch_vertices.join(F.broadcast(seen.select("id")), "id", "left_anti")
        .select("id", F.col("id").alias("set_id"))
    )
    lab = seen.unionByName(unseen)

    # contracted edge list over component ids — the only graph the
    # fixpoint sees; its size is bounded by the batch, not the history
    s1 = lab.select(F.col("id").alias("src"), F.col("set_id").alias("s1"))
    s2 = lab.select(F.col("id").alias("dst"), F.col("set_id").alias("s2"))
    contracted = truncate_lineage(
        new_edges.select(F.col("src").cast("long").alias("src"),
                         F.col("dst").cast("long").alias("dst"))
        .join(F.broadcast(s1), "src")
        .join(F.broadcast(s2), "dst")
        .select("s1", "s2")
        .filter(F.col("s1") != F.col("s2"))
        .distinct()
    )

    # grow the table with the batch's unseen vertices first
    grown = components.unionByName(unseen)

    if contracted.isEmpty():
        return grown

    # the merge graph is batch-bounded: below 10^6 merge edges the
    # in-process union-find endgame replaces the superstep loop
    mapping = truncate_lineage(
        wcc(Graph.from_edges(contracted, src="s1", dst="s2"),
            max_iterations=max_iterations, local_finish_edges=1_000_000)
        .components.select(
            F.col("id").alias("set_id"), F.col("set_id").alias("new_set")
        )
    )
    # merges are bounded by the batch → broadcast relabel, map-side
    # over the history-sized table (mirror of the sink's redirect log)
    return grown.join(F.broadcast(mapping), "set_id", "left").select(
        "id", F.coalesce("new_set", F.col("set_id")).alias("set_id")
    )


class IncrementalWccSink:
    """``foreachBatch`` sink maintaining the components table under
    ``state_dir`` (bucketed parquet + redirect log + manifest; see the
    module docstring for the layout and the O(touched) contract).

    ``n_buckets`` fixes the base relation's hash-bucket count on first
    write (later opens read it back from the manifest; defaults to the
    session's shuffle-partition count).  ``max_redirects`` bounds the
    merge log: past it, the batch compacts the log into the base
    relation (the only full rewrite, amortized over many batches)."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        n_buckets: int | None = None,
        max_redirects: int = 100_000,
    ):
        self.spark = spark
        self.state_dir = state_dir
        if n_buckets is None:
            n_buckets = int(
                spark.conf.get("spark.sql.shuffle.partitions", "200")
            )
        self.n_buckets = int(n_buckets)
        self.max_redirects = int(max_redirects)
        os.makedirs(state_dir, exist_ok=True)

    # ---- manifest / paths -------------------------------------------

    def _manifest_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.state_dir):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def manifest(self, before_batch: int | None = None) -> dict | None:
        """Latest committed manifest (optionally: latest strictly
        before ``before_batch`` — what a replayed batch rebuilds
        from)."""
        versions = self._manifest_versions()
        if before_batch is not None:
            versions = [v for v in versions if v < before_batch]
        if not versions:
            return None
        with open(
            os.path.join(self.state_dir, f"manifest_b{versions[-1]}.json")
        ) as f:
            return json.load(f)

    def _bucket_path(self, version: int, k: int) -> str:
        return os.path.join(self.state_dir, f"base_b{version}", f"k={k}")

    def _read_buckets(self, man: dict | None, ks: list[int]) -> DataFrame:
        """Rows of the given buckets at their current versions."""
        empty = self.spark.createDataFrame([], "id long, set_id long")
        if man is None:
            return empty
        paths = [
            self._bucket_path(int(man["buckets"][str(k)]), k)
            for k in ks
            if str(k) in man["buckets"]
        ]
        if not paths:
            return empty
        return self.spark.read.schema("id long, set_id long").parquet(*paths)

    def _read_redirects(self, man: dict | None) -> DataFrame:
        empty = self.spark.createDataFrame([], "old_set long, new_set long")
        if man is None or int(man.get("redirects", -1)) < 0:
            return empty
        return self.spark.read.schema("old_set long, new_set long").parquet(
            os.path.join(self.state_dir, f"redirects_b{man['redirects']}")
        )

    # ---- read path ---------------------------------------------------

    def components(self, before_batch: int | None = None) -> DataFrame | None:
        """Current ``(id, set_id)`` view: bucket scan + one broadcast
        join against the redirect log — no exchange on the big side."""
        man = self.manifest(before_batch=before_batch)
        if man is None:
            return None
        ks = sorted(int(k) for k in man["buckets"])
        base = self._read_buckets(man, ks)
        red = self._read_redirects(man)
        return base.join(
            F.broadcast(red), base.set_id == red.old_set, "left"
        ).select("id", F.coalesce("new_set", "set_id").alias("set_id"))

    # ---- write path --------------------------------------------------

    def __call__(self, new_edges: DataFrame, batch_id: int) -> None:
        B = int(batch_id)
        spark = self.spark
        man = self.manifest(before_batch=B)
        n = int(man["n_buckets"]) if man else self.n_buckets
        bucket_of = lambda c: F.pmod(F.xxhash64(c), F.lit(n))  # noqa: E731

        verts = (
            new_edges.select(F.col("src").cast("long").alias("id"))
            .unionByName(new_edges.select(F.col("dst").cast("long").alias("id")))
            .distinct()
        )
        verts = truncate_lineage(verts)  # batch-bounded
        ks = sorted(
            r["k"]
            for r in verts.select(bucket_of(F.col("id")).alias("k"))
            .distinct()
            .collect()
        )
        cur = self._read_buckets(man, ks)  # touched buckets only
        redirects = truncate_lineage(self._read_redirects(man))

        # labels for batch vertices: bucket-pruned broadcast-semi
        # lookup (seen) + anti against the (batch-bounded) seen set
        # (unseen) + redirect resolution — nothing graph-sized shuffles
        seen = truncate_lineage(
            cur.join(F.broadcast(verts), "id", "left_semi")
        )
        unseen = truncate_lineage(
            verts.join(F.broadcast(seen.select("id")), "id", "left_anti")
        )
        lab = (
            seen.unionByName(unseen.select("id", F.col("id").alias("set_id")))
            .join(F.broadcast(redirects), F.col("set_id") == F.col("old_set"), "left")
            .select("id", F.coalesce("new_set", "set_id").alias("set_id"))
        )
        lab = truncate_lineage(lab)

        # contract + solve over component ids (batch-bounded)
        s1 = lab.select(F.col("id").alias("src"), F.col("set_id").alias("s1"))
        s2 = lab.select(F.col("id").alias("dst"), F.col("set_id").alias("s2"))
        contracted = (
            new_edges.select(F.col("src").cast("long").alias("src"),
                             F.col("dst").cast("long").alias("dst"))
            .join(F.broadcast(s1), "src")
            .join(F.broadcast(s2), "dst")
            .select("s1", "s2")
            .filter(F.col("s1") != F.col("s2"))
            .distinct()
        )
        if contracted.isEmpty():
            mapping = spark.createDataFrame([], "set_id long, new_set long")
        else:
            mapping = (
                wcc(Graph.from_edges(contracted, src="s1", dst="s2"))
                .components.select(
                    F.col("id").alias("set_id"), F.col("set_id").alias("new_set")
                )
                .filter(F.col("set_id") != F.col("new_set"))
            )
        mapping = truncate_lineage(mapping)
        n_merges = mapping.count()

        if n_merges == 0 and unseen.isEmpty() and man is not None:
            # nothing to write: commit a manifest that carries every
            # version forward (idempotent no-op batch)
            prev_red = (man.get("metrics") or {}).get("redirect_rows", 0)
            self._write_manifest(B, n, man["buckets"], int(man["redirects"]),
                                 {"buckets_rewritten": 0, "merges": 0,
                                  "redirect_rows": int(prev_red),
                                  "compacted": False})
            return

        # compose the redirect log through this batch's merges so it
        # stays fully compressed (one join resolves any stale label):
        # existing old_set → (possibly re-merged) root, plus the new
        # merges themselves.  Keys are always dead roots, so the union
        # is duplicate-free by construction.
        m_old = mapping.select(
            F.col("set_id").alias("m_old"), F.col("new_set").alias("m_new")
        )
        new_redirects = (
            redirects.join(
                F.broadcast(m_old), redirects.new_set == F.col("m_old"), "left"
            )
            .select(
                "old_set", F.coalesce("m_new", "new_set").alias("new_set")
            )
            .unionByName(
                mapping.select(
                    F.col("set_id").alias("old_set"), F.col("new_set")
                )
            )
        )
        new_redirects = truncate_lineage(new_redirects)
        n_redirects = new_redirects.count()
        compact = n_redirects > self.max_redirects

        # rewritten bucket rows: ALL rows the touched buckets already
        # held (not just the batch's vertices) + the inserts, fully
        # resolved through the post-merge redirect log
        updated = (
            cur.unionByName(unseen.select("id", F.col("id").alias("set_id")))
            .join(
                F.broadcast(new_redirects),
                F.col("set_id") == F.col("old_set"),
                "left",
            )
            .select("id", F.coalesce("new_set", "set_id").alias("set_id"))
        )
        if compact:
            # fold the log into the base relation: rewrite every
            # bucket (the one amortized full pass), empty log after
            untouched_ks = (
                sorted(int(k) for k in man["buckets"] if int(k) not in set(ks))
                if man
                else []
            )
            rest = (
                self._read_buckets(man, untouched_ks)
                .join(
                    F.broadcast(new_redirects),
                    F.col("set_id") == F.col("old_set"),
                    "left",
                )
                .select("id", F.coalesce("new_set", "set_id").alias("set_id"))
            )
            updated = updated.unionByName(rest)
            write_ks = sorted(set(ks) | set(untouched_ks))
            new_redirects = spark.createDataFrame(
                [], "old_set long, new_set long"
            )
        else:
            write_ks = ks

        (
            updated.withColumn("k", bucket_of(F.col("id")))
            .repartition(max(1, len(write_ks)), "k")
            .write.mode("overwrite")
            .partitionBy("k")
            .parquet(os.path.join(self.state_dir, f"base_b{B}"))
        )
        new_redirects.repartition(1).write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"redirects_b{B}")
        )
        buckets = dict(man["buckets"]) if man else {}
        for k in write_ks:
            buckets[str(k)] = B
        self._write_manifest(
            B, n, buckets, B,
            {
                "buckets_rewritten": len(write_ks),
                "merges": int(n_merges),
                "redirect_rows": 0 if compact else int(n_redirects),
                "compacted": bool(compact),
            },
        )

    def _write_manifest(
        self, B: int, n: int, buckets: dict, redirects_version: int,
        metrics: dict,
    ) -> None:
        payload = {
            "batch_id": B,
            "n_buckets": int(n),
            "buckets": {str(k): int(v) for k, v in buckets.items()},
            "redirects": int(redirects_version),
            "metrics": metrics,
        }
        tmp = os.path.join(self.state_dir, f".manifest_b{B}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, os.path.join(self.state_dir, f"manifest_b{B}.json"))

    # ---- lifecycle ----------------------------------------------------

    def vacuum(self) -> list[str]:
        """Delete version directories and manifests no longer reachable
        from the latest manifest; returns what was removed.  Safe to
        run any time after the stream's checkpoint has advanced past
        the batches being dropped (a replay of batch B needs the
        manifest chain only back to the latest one before B)."""
        man = self.manifest()
        if man is None:
            return []
        live = {int(v) for v in man["buckets"].values()}
        live.add(int(man["batch_id"]))
        if int(man.get("redirects", -1)) >= 0:
            live.add(int(man["redirects"]))
        removed = []
        for name in os.listdir(self.state_dir):
            m = _VERSION_DIR_RE.match(name)
            if m and int(m.group(1)) not in live:
                shutil.rmtree(os.path.join(self.state_dir, name))
                removed.append(name)
                continue
            m = _MANIFEST_RE.match(name)
            if m and int(m.group(1)) != int(man["batch_id"]):
                os.remove(os.path.join(self.state_dir, name))
                removed.append(name)
        return removed


def streaming_incremental_wcc(
    edges: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    n_buckets: int | None = None,
    max_redirects: int = 100_000,
):
    """Attach the incremental-WCC sink to a streaming edge DataFrame;
    returns the (started) StreamingQuery.  ``state_dir`` holds the
    bucketed components state (module docstring); ``checkpoint_dir``
    is the stream's own offset log."""
    sink = IncrementalWccSink(
        edges.sparkSession, state_dir,
        n_buckets=n_buckets, max_redirects=max_redirects,
    )
    return (
        edges.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
