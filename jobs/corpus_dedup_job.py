"""spark-submit job: tiered corpus deduplication over a documents table.

    spark-submit --py-files dist/neo4j_graph_algorithms_spark.zip \
        jobs/corpus_dedup_job.py \
        --docs /data/documents --id-col doc_id --text-col text \
        --out /data/deduped \
        [--jaccard-threshold 0.8] [--report /data/dedup_report]

Pipeline (cheap → robust, each tier prunes the next tier's input —
the shape that holds at 100 TB):

1. **exact**: md5 hash-groupBy; only min-id survivors continue.
2. **MinHash + LSH**: banded signatures → bucket self-join candidate
   pairs (never all-pairs).
3. **n-gram Jaccard verify**: exact similarity on candidates only;
   pairs ≥ threshold collapse to their min-id representative via
   connected components over the duplicate-pair graph (transitive
   closure — A≈B≈C keeps exactly one of the three).

Outputs the surviving rows; ``--report`` additionally writes the
removed-id → kept-id mapping for lineage.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.functions import dedup as dd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--out", required=True)
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("corpus_dedup_job").getOrCreate()
    docs = (
        spark.read.parquet(args.docs)
        if "/" in args.docs or args.docs.endswith(".parquet")
        else spark.table(args.docs)
    )

    # tier 1: exact
    exact_survivors = dd.dedup_exact(docs, args.text_col, args.id_col)

    # tier 2+3: LSH candidates, Jaccard-verified on the survivors only
    near_pairs = dd.ngram_jaccard_pairs(
        exact_survivors,
        args.text_col,
        args.id_col,
        threshold=args.jaccard_threshold,
    ).select("id_a", "id_b")

    # transitive closure: groups of near-dups keep one representative
    drop = dd.near_dup_clusters(near_pairs).filter(~F.col("keep"))

    kept = exact_survivors.join(
        drop.select(F.col("doc_id").alias(args.id_col)), args.id_col, "left_anti"
    )
    kept.write.mode("overwrite").parquet(args.out)

    if args.report:
        exact_map = (
            dd.exact_duplicates(docs, args.text_col, args.id_col)
            .filter(F.col("dup_count") > 1)
            .select(F.col("text_hash"), F.col("keep_id"))
        )
        near_map = drop.select(
            F.col("doc_id").alias("removed_id"),
            F.col("cluster_id").alias("kept_id"),
        )
        near_map.write.mode("overwrite").parquet(args.report + "/near_dups")
        exact_map.write.mode("overwrite").parquet(args.report + "/exact_groups")

    n_in, n_out = docs.count(), kept.count()
    print(f"dedup: {n_in} -> {n_out} rows ({n_in - n_out} removed)")


if __name__ == "__main__":
    main()
