"""Near-dup tier scale smoke — the LSH pipeline driven at 1-5M docs.

Usage: python tools/neardup_scale_smoke.py [n_docs] [cores]

Deterministic synthetic corpus (md5/xxhash-derived, no RNG, no Python
UDFs anywhere):

- every doc is 40 words from a 5000-word vocabulary, words keyed on
  ``xxhash64(base_id, position)``;
- 20% of docs (``id % 5 == 1``) are near-duplicates of the previous
  doc with exactly one position mutated — the planted recall target
  (trigram Jaccard ≈ 35/41 ≈ 0.85, above the 0.8 verify threshold);
- every 997th doc carries the IDENTICAL hot text — a ~1k-doc flood
  that lands in one LSH bucket per band and must be cut by the
  ``max_band_df`` hub guard (exact duplicates belong to
  ``dedup_exact``, not LSH).

Pipeline timed end-to-end at scale: ``minhash_lsh_candidates``
(guarded) → exact-Jaccard verification of the candidate pairs →
``near_dup_clusters`` (WCC + canonical survivor).  Also reported:
band-bucket skew (max/p99/mean bucket size) and whether/where the
guard fired.  Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graph_algorithms_spark.functions import dedup as dd  # noqa: E402
from neo4j_graph_algorithms_spark.functions.textstats import shingle_rows  # noqa: E402
from neo4j_graph_algorithms_spark.plans.checkpoint import truncate_lineage  # noqa: E402
from neo4j_graph_algorithms_spark.session import get_spark  # noqa: E402

VOCAB = 5000
WORDS = 40
MUT_MOD = 5          # id % 5 == 1 → near-dup of id-1
HOT_MOD = 997        # id % 997 == 0 → identical hot text
MAX_BAND_DF = 500    # hub guard: buckets above this are cut


def synthetic_docs(spark, n: int):
    base = F.when(F.col("id") % MUT_MOD == 1, F.col("id") - 1).otherwise(F.col("id"))
    mut_pos = F.pmod(F.xxhash64(F.col("id")), F.lit(WORDS))
    word = lambda k: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(base * WORDS + k, F.lit(17)), F.lit(VOCAB))
    )
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda k: F.when(
            (F.col("id") % MUT_MOD == 1) & (k == mut_pos),
            F.concat(F.lit("m"), F.col("id")),
        ).otherwise(word(k)),
    )
    hot = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(WORDS - 1)), lambda k: F.lit("hotword"))
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % HOT_MOD == 0, hot)
        .otherwise(F.concat_ws(" ", words))
        .alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        app_name="neardup_smoke", cores=cores, shuffle_partitions=2 * cores
    )
    docs = truncate_lineage(synthetic_docs(spark, n).repartition(2 * cores))
    n_docs = docs.count()
    report: dict = {"n_docs": n_docs, "cores": cores}

    # ---- band-bucket skew (the quantity the guard bounds) -----------
    t0 = time.time()
    sigs = dd.minhash_signatures(docs, num_hashes=16)
    rows = 4
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]
            )
        ).alias("band_hash")
        for b in range(4)
    ]
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[F.struct(F.lit(b).alias("band"), band_cols[b]) for b in range(4)]
            )
        ).alias("bh"),
    ).select("id", "bh.band", "bh.band_hash")
    bs = banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("df"))
    skew = bs.agg(
        F.max("df").alias("max_df"),
        F.expr("percentile_approx(df, 0.99)").alias("p99_df"),
        F.round(F.avg("df"), 3).alias("mean_df"),
        F.sum(F.when(F.col("df") > MAX_BAND_DF, 1).otherwise(0)).alias(
            "buckets_over_guard"
        ),
        F.sum(
            F.when(F.col("df") > MAX_BAND_DF, F.col("df") * (F.col("df") - 1) / 2)
            .otherwise(0)
        ).cast("long").alias("pairs_suppressed_by_guard"),
    ).first()
    report["band_skew"] = {k: (float(v) if v is not None else None) for k, v in skew.asDict().items()}
    report["t_band_skew_s"] = round(time.time() - t0, 1)

    # ---- candidates (guard ON) --------------------------------------
    t0 = time.time()
    cands = truncate_lineage(
        dd.minhash_lsh_candidates(docs, max_band_df=MAX_BAND_DF)
    )
    report["n_candidates"] = cands.count()
    report["t_candidates_s"] = round(time.time() - t0, 1)

    # ---- exact-Jaccard verification of the candidate pairs ----------
    t0 = time.time()
    sh = shingle_rows(docs, "text", "doc_id", 3).dropDuplicates(["id", "s"])
    sh = truncate_lineage(sh)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("nsh"))
    # MERGE on both unbounded sides: the candidate table grows with
    # the corpus and must never be broadcast
    inter = (
        sh.alias("a")
        .join(cands.hint("MERGE"), F.col("a.id") == F.col("id_a"))
        .join(
            # the b-side is the FULL shingle table — unpinned, the
            # planner broadcast all ~38M rows (driver OOM); a
            # shuffled-hash build also exceeded task memory — MERGE
            # sorts and spills
            sh.alias("b").hint("MERGE"),
            (F.col("b.id") == F.col("id_b")) & (F.col("a.s") == F.col("b.s")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # MERGE: sizes is one row per doc (1M+) — corpus-sized; a spilling
    # sort-merge build, never a broadcast
    verified = truncate_lineage(
        inter.join(
            sizes.select(F.col("id").alias("id_a"), F.col("nsh").alias("na"))
            .hint("MERGE"),
            "id_a",
        )
        .join(
            sizes.select(F.col("id").alias("id_b"), F.col("nsh").alias("nb"))
            .hint("MERGE"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("j"),
        )
        .filter(F.col("j") >= 0.8)
        .select("id_a", "id_b")
    )
    report["n_verified_pairs"] = verified.count()
    report["t_verify_s"] = round(time.time() - t0, 1)

    # ---- transitive clustering --------------------------------------
    t0 = time.time()
    clusters = dd.near_dup_clusters(verified)
    report["n_clustered_docs"] = clusters.count()
    report["n_clusters"] = clusters.filter(F.col("keep")).count()
    report["t_cluster_s"] = round(time.time() - t0, 1)

    # ---- recall sanity on the planted pairs -------------------------
    # Verifiable planted pairs only: a doc with id % 5 == 1 is a true
    # near-dup of id-1 UNLESS the hot-text override replaced either
    # side (id % 997 == 0 → the doc itself is hot text, not a
    # mutation; (id-1) % 997 == 0 → the base shows hot text while the
    # mutated doc keeps the word recipe, Jaccard ≈ 0).  Counting those
    # in the denominator would cap recall below 1.0 structurally and
    # mask a real regression of the same size.
    planted = (
        spark.range(n_docs)
        .filter(
            (F.col("id") % MUT_MOD == 1)
            & (F.col("id") % HOT_MOD != 0)
            & ((F.col("id") - 1) % HOT_MOD != 0)
        )
        .count()
    )
    found_planted = verified.filter(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_b") % MUT_MOD == 1)
    ).count()
    report["planted_pairs"] = planted
    report["planted_found"] = found_planted
    report["planted_recall"] = round(found_planted / max(planted, 1), 4)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
