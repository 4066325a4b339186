"""Deterministic synthetic source-repository table.

Schema (BASELINE.json ``input_hint``):
``(repo string, path string, commit string, lang string, content string)``

Generated fully distributed from ``spark.range`` — every column is a
deterministic function of the row id, so any scale factor reproduces
bit-identically with no driver-side materialization and no RNG state.
Each file imports a pseudo-random (but deterministic) set of modules
provided by other repos, giving a power-law-ish repo→repo link graph
for the north-rule algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synthetic_repo_files(
    spark: SparkSession,
    n_repos: int = 100,
    files_per_repo: int = 20,
    max_imports: int = 4,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row per file.  File f belongs to repo ``f // files_per_repo``
    and defines module ``m{repo}_{idx}`` at ``src/m{repo}_{idx}.<ext>``;
    its imports reference modules of hash-picked other repos.  Language
    cycles py/java/js to exercise the per-language extractors.
    """
    n_files = n_repos * files_per_repo
    df = spark.range(0, n_files, 1, num_partitions or spark.sparkContext.defaultParallelism)
    rid = (F.col("id") / files_per_repo).cast("long")
    idx = F.col("id") % files_per_repo
    lang = F.element_at(
        F.array(F.lit("python"), F.lit("java"), F.lit("javascript")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    module = F.concat_ws("_", F.concat(F.lit("m"), rid), idx)
    ext = F.element_at(
        F.array(F.lit("py"), F.lit("java"), F.lit("js")), (F.col("id") % 3 + 1).cast("int")
    )

    # deterministic import targets: j-th import of file f references
    # module m{(f*31 + j*17 + 7) % n_repos}_{(f*13 + j*5) % files_per_repo}
    n_imports = (F.col("id") % (max_imports + 1)).cast("int")
    jseq = F.sequence(F.lit(0), n_imports - 1)
    jseq = F.when(n_imports > 0, jseq).otherwise(F.array().cast("array<int>"))
    tgt_mod = F.transform(
        jseq,
        lambda j: F.concat_ws(
            "_",
            F.concat(F.lit("m"), ((F.col("id") * 31 + j * 17 + 7) % n_repos).cast("long")),
            ((F.col("id") * 13 + j * 5) % files_per_repo).cast("long"),
        ),
    )
    import_lines = F.when(
        F.col("lang") == "python",
        F.transform(F.col("mods"), lambda m: F.concat(F.lit("import "), m)),
    ).when(
        F.col("lang") == "java",
        F.transform(F.col("mods"), lambda m: F.concat(F.lit("import "), m, F.lit(";"))),
    ).otherwise(
        F.transform(
            F.col("mods"),
            lambda m: F.concat(F.lit("const x = require('"), m, F.lit("');")),
        )
    )
    body = F.concat(
        F.lit("// module "), F.col("module"), F.lit("\n"),
        F.concat_ws("\n", F.col("imports")), F.lit("\n"),
        F.lit("function body_"), F.col("id").cast("string"), F.lit("() { return "),
        F.col("id").cast("string"), F.lit("; }\n"),
    )
    out = (
        df.select(
            "id",
            rid.alias("rid"),
            idx.alias("idx"),
            lang.alias("lang"),
            module.alias("module"),
            ext.alias("ext"),
            tgt_mod.alias("mods"),
        )
        .withColumn("imports", import_lines)
        .withColumn("content", body)
        .select(
            F.concat(F.lit("repo-"), F.col("rid")).alias("repo"),
            F.concat(F.lit("src/"), F.col("module"), F.lit("."), F.col("ext")).alias("path"),
            F.substring(F.sha2(F.concat(F.lit("commit:"), F.col("id")), 256), 1, 12).alias(
                "commit"
            ),
            "lang",
            "content",
        )
    )
    return out
