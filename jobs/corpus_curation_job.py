"""spark-submit job: end-to-end training-corpus curation.

    spark-submit --py-files dist/neo4j_graph_algorithms_spark.zip \\
        jobs/corpus_curation_job.py \\
        --docs /data/documents --out /data/curated \\
        [--id-col doc_id] [--text-col text] \\
        [--langs en] [--min-tokens 16] [--max-mean-token-len 12] \\
        [--min-stopword-ratio 0.01] \\
        [--jaccard-threshold 0.8] \\
        [--probes /data/eval_probes] [--max-contaminated-frac 0.05] \\
        [--splits 0.98,0.01,0.01] [--salt corpus-v1] \\
        [--report /data/curation_report]

The standard LLM-corpus curation funnel, each stage an engine
operator, each stage pruning the next stage's input (the composition
that holds at 100 TB — nothing corpus-sized is ever shuffled except
the one (doc, term-stats) aggregate and the dedup tiers' bounded
candidate joins):

1. **quality gate** (`textstats.quality_stats`): drop docs below
   ``min_tokens``, above ``max_mean_token_len``, or below
   ``min_stopword_ratio`` — the C4/Gopher-style cheap filters, one
   codegen'd scan.
1b. **repetition gate** (`textstats.repetition_stats`, enabled by
   ``--max-dup2gram-frac`` / ``--max-top3gram-frac``): drop
   template/boilerplate pages by duplicated-2-gram / top-3-gram
   occurrence fraction — the Gopher repetition rules.
2. **language filter** (`textstats.language_id`): keep ``--langs``.
3. **dedup** (`dedup.dedup_exact` → `ngram_jaccard_pairs` →
   `near_dup_clusters`): exact survivors, LSH-pruned verified near-dup
   pairs, transitive collapse to one canonical doc per cluster.
4. **decontamination** (`dedup.contamination_report` against a
   broadcast probe set): drop docs whose contaminated 13-gram
   fraction exceeds ``--max-contaminated-frac``.
4b. **LM fluency gate** (`textstats.lm_perplexity`, enabled by
   ``--max-perplexity``): drop docs whose bigram-LM perplexity —
   trained on the surviving corpus — exceeds the threshold (the
   CCNet-style filter).
5. **deterministic splits** (`sampling.hash_split`): md5-bucket
   train/val/test assignment — retry/repartition-stable, survives
   corpus growth.

``--report`` writes one row per stage: rows in, rows out, drop count
— the curation funnel's lineage record.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.functions import dedup as dd
from neo4j_graph_algorithms_spark.functions import sampling as smp
from neo4j_graph_algorithms_spark.functions import textstats as ts
from neo4j_graph_algorithms_spark.plans.checkpoint import truncate_lineage


def _read(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.parquet(path)
        if "/" in path or path.endswith(".parquet")
        else spark.table(path)
    )


def curate(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 16,
    max_mean_token_len: float = 12.0,
    min_stopword_ratio: float = 0.0,
    jaccard_threshold: float = 0.8,
    max_dup2gram_frac: float | None = None,
    max_top3gram_frac: float | None = None,
    probes: DataFrame | None = None,
    max_contaminated_frac: float = 0.05,
    max_perplexity: float | None = None,
    splits: dict[str, float] | None = None,
    salt: str = "corpus-v1",
) -> tuple[DataFrame, list[dict]]:
    """Run the curation funnel in-process; returns ``(curated_docs_with_
    split_column, funnel_report_rows)``.  ``main()`` is the spark-submit
    wrapper around this; bench.py times this callable directly."""
    idc, txt = id_col, text_col
    funnel: list[dict] = []
    # running survivor count: each stage's rows_out is the next stage's
    # rows_in, so the funnel needs exactly ONE count per stage — and the
    # survivor set is lineage-cut before counting so later stages (and
    # the final write) never re-run the upstream funnel (without the cut
    # every .count() would cascade through tokenize + the dedup joins:
    # O(stages^2) corpus scans at the 100-TB scale this job targets).
    n_cur = docs.count()

    def stage(name: str, after: DataFrame) -> DataFrame:
        nonlocal n_cur
        after = truncate_lineage(after)
        n_in, n_out = n_cur, after.count()
        funnel.append({"stage": name, "rows_in": n_in, "rows_out": n_out,
                       "dropped": n_in - n_out})
        # stderr: callers (bench.py) reserve stdout for machine output
        print(f"{name}: {n_in} -> {n_out} ({n_in - n_out} dropped)", file=sys.stderr)
        n_cur = n_out
        return after

    # 1. quality gate
    q = ts.quality_stats(docs, txt, idc)
    ok = q.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("mean_token_len") <= max_mean_token_len)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    ).select(F.col(idc))
    cur = stage("quality", docs.join(ok, idc, "left_semi"))

    # 1b. repetition gate (Gopher/MassiveText template-page rules)
    if max_dup2gram_frac is not None or max_top3gram_frac is not None:
        ns = tuple(
            n
            for n, thr in ((2, max_dup2gram_frac), (3, max_top3gram_frac))
            if thr is not None
        )
        rep = ts.repetition_stats(cur, txt, idc, ns=ns)
        bad = F.lit(False)
        if max_dup2gram_frac is not None:
            bad = bad | (F.col("dup2gram_frac") > max_dup2gram_frac)
        if max_top3gram_frac is not None:
            bad = bad | (F.col("top3gram_frac") > max_top3gram_frac)
        drop = rep.filter(bad).select(F.col("doc_id").alias(idc))
        cur = stage("repetition", cur.join(drop, idc, "left_anti"))

    # 2. language filter
    lid = ts.language_id(cur, txt, idc).filter(F.col("lang_pred").isin(list(langs)))
    cur = stage("language", cur.join(lid.select(idc), idc, "left_semi"))

    # 3. dedup: exact -> verified near-dup clusters -> canonical survivor
    exact = dd.dedup_exact(cur, txt, idc)
    cur = stage("dedup_exact", exact)
    pairs = dd.ngram_jaccard_pairs(
        cur, txt, idc, threshold=jaccard_threshold
    ).select("id_a", "id_b")
    drop = dd.near_dup_clusters(pairs).filter(~F.col("keep"))
    cur = stage(
        "dedup_near",
        cur.join(drop.select(F.col("doc_id").alias(idc)), idc, "left_anti"),
    )

    # 4. decontamination vs broadcast eval probes
    if probes is not None:
        rep = dd.contamination_report(cur, probes, text_col=txt, id_col=idc)
        dirty = rep.filter(
            F.col("contaminated_frac") > max_contaminated_frac
        ).select(F.col("doc_id").alias(idc))
        cur = stage("decontamination", cur.join(dirty, idc, "left_anti"))

    # 4b. LM fluency gate (CCNet-style), trained on the survivors so the
    # model reflects the cleaned distribution, not the junk it removed
    if max_perplexity is not None:
        ppl = ts.lm_perplexity(cur, txt, idc)
        wild = ppl.filter(F.col("perplexity") > max_perplexity).select(
            F.col("doc_id").alias(idc)
        )
        cur = stage("perplexity", cur.join(wild, idc, "left_anti"))

    # 5. deterministic train/val/test assignment
    if splits is None:
        splits = {"train": 0.98, "val": 0.01, "test": 0.01}
    out = smp.hash_split(cur, splits, id_col=idc, salt=salt)
    return out, funnel


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--min-tokens", type=int, default=16)
    ap.add_argument("--max-mean-token-len", type=float, default=12.0)
    ap.add_argument("--min-stopword-ratio", type=float, default=0.0)
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--max-dup2gram-frac", type=float, default=None)
    ap.add_argument("--max-top3gram-frac", type=float, default=None)
    ap.add_argument("--probes", default=None)
    ap.add_argument("--max-contaminated-frac", type=float, default=0.05)
    ap.add_argument("--max-perplexity", type=float, default=None)
    ap.add_argument("--splits", default="0.98,0.01,0.01")
    ap.add_argument("--salt", default="corpus-v1")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("corpus_curation_job").getOrCreate()
    w = [float(x) for x in args.splits.split(",")]
    names = ["train", "val", "test"] if len(w) == 3 else [str(i) for i in range(len(w))]
    out, funnel = curate(
        spark,
        _read(spark, args.docs),
        id_col=args.id_col,
        text_col=args.text_col,
        langs=tuple(x.strip() for x in args.langs.split(",") if x.strip()),
        min_tokens=args.min_tokens,
        max_mean_token_len=args.max_mean_token_len,
        min_stopword_ratio=args.min_stopword_ratio,
        jaccard_threshold=args.jaccard_threshold,
        max_dup2gram_frac=args.max_dup2gram_frac,
        max_top3gram_frac=args.max_top3gram_frac,
        probes=_read(spark, args.probes) if args.probes else None,
        max_contaminated_frac=args.max_contaminated_frac,
        max_perplexity=args.max_perplexity,
        splits=dict(zip(names, w)),
        salt=args.salt,
    )
    out.write.mode("overwrite").partitionBy("split").parquet(args.out)

    if args.report:
        spark.createDataFrame(funnel).coalesce(1).write.mode("overwrite").json(
            args.report
        )
    print("funnel:", json.dumps(funnel))


if __name__ == "__main__":
    main()
