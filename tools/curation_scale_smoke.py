"""Curation-funnel scale smoke — jobs/corpus_curation_job.curate at 1M+ docs.

Usage: python tools/curation_scale_smoke.py [n_docs] [cores]

Drives the full 7-stage funnel (quality → repetition → language →
exact dedup → near-dup clusters → decontamination → perplexity →
splits) on the same deterministic synthetic corpus as
``neardup_scale_smoke.py`` (reused from there): 20% planted one-word
near-dups, a ~0.1% identical hot-text flood.  The bench times this
composition at 5k docs (sf0.1); this smoke proves the composition —
one stage's survivors feeding the next, every stage lineage-cut —
holds at 200x that, with the funnel report and wall per stage.

Expected shape: repetition drops the hot flood (dup-2gram ≈ 1.0 on a
single repeated word), near-dup collapses the planted mutation pairs,
decontamination drops the docs whose text the probe set carries.
Results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from neardup_scale_smoke import synthetic_docs  # noqa: E402
from neo4j_graph_algorithms_spark.plans.checkpoint import truncate_lineage  # noqa: E402
from neo4j_graph_algorithms_spark.session import get_spark  # noqa: E402

from jobs.corpus_curation_job import curate  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        app_name="curation_smoke", cores=cores, shuffle_partitions=2 * cores
    )
    docs = truncate_lineage(synthetic_docs(spark, n).repartition(2 * cores))
    n_docs = docs.count()
    # probe set: 20 clean docs' own texts — their (and their near-dups')
    # 13-gram overlap is 100%, so decontamination must drop survivors
    # that match
    probes = docs.filter("doc_id % 5000 = 2").limit(20).select("doc_id", "text")
    t0 = time.time()
    curated, funnel = curate(
        spark,
        docs,
        langs=("unknown",),          # the synthetic vocab is no natural language
        min_tokens=5,
        max_dup2gram_frac=0.25,      # kills the hot flood (dup-2gram = 1.0)
        probes=probes,
        max_contaminated_frac=0.5,
        max_perplexity=50_000.0,     # generous: exercise the stage, keep survivors
    )
    n_out = curated.count()
    wall = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "cores": cores,
                "survivors": n_out,
                "wall_s": wall,
                "funnel": funnel,
            }
        )
    )


if __name__ == "__main__":
    main()
