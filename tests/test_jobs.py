"""End-to-end job smoke tests: the spark-submit entry points run
against tiny parquet inputs and produce the documented outputs."""

import json
import os
import sys

import pytest


@pytest.fixture()
def tiny_corpus(spark, tmp_path):
    rows = []
    for i in range(40):
        text = f"the quick brown fox number {i} jumps over the lazy dog " * 3
        rows.append((i, text))
    # exact duplicates
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1]))
    # junk that the quality gate should drop
    rows.append((200, "x"))
    rows.append((201, ""))
    # non-English
    rows.append((300, "der hund ist nicht mit der katze und das haus " * 4))
    # pure template/boilerplate page for the repetition gate
    # (top3gram_frac = 1.0 — every trigram is "spam spam spam")
    rows.append((305, "spam " * 40))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    probes = spark.createDataFrame([(0, rows[5][1])], "doc_id long, text string")
    ppath = str(tmp_path / "probes")
    probes.write.parquet(ppath)
    return path, ppath


def test_corpus_curation_job(spark, tiny_corpus, tmp_path, monkeypatch):
    docs_path, probes_path = tiny_corpus
    out = str(tmp_path / "curated")
    rep = str(tmp_path / "report")
    import jobs.corpus_curation_job as job

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "corpus_curation_job.py",
            "--docs", docs_path,
            "--out", out,
            "--probes", probes_path,
            "--min-tokens", "5",
            "--max-top3gram-frac", "0.5",
            "--max-contaminated-frac", "0.5",
            "--max-perplexity", "1000000",
            "--report", rep,
            "--splits", "0.8,0.1,0.1",
        ],
    )
    job.main()

    curated = spark.read.parquet(out)
    ids = {r["doc_id"] for r in curated.collect()}
    # quality gate dropped the junk docs
    assert 200 not in ids and 201 not in ids
    # language filter dropped the German doc
    assert 300 not in ids
    # exact dedup kept the min-id survivor of each duplicate pair
    assert 0 in ids and 100 not in ids
    assert 1 in ids and 101 not in ids
    # repetition gate dropped the template page
    assert 305 not in ids
    # decontamination dropped the probe-identical doc
    assert 5 not in ids
    # splits partitioned and complete
    assert {r["split"] for r in curated.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }
    # funnel report: rows_out of each stage equals rows_in of the next
    files = [f for f in os.listdir(rep) if f.endswith(".json")]
    rows = []
    for f in files:
        with open(os.path.join(rep, f)) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    stages = {r["stage"]: r for r in rows}
    order = [
        "quality", "repetition", "language", "dedup_exact", "dedup_near",
        "decontamination", "perplexity",
    ]
    assert set(stages) == set(order)
    for a, b in zip(order, order[1:]):
        assert stages[a]["rows_out"] == stages[b]["rows_in"]
    # the template page fell at the repetition gate specifically
    assert stages["repetition"]["dropped"] == 1
    # the wide-open perplexity threshold dropped nothing (gate exercised,
    # drop semantics unit-tested in test_functions)
    assert stages["perplexity"]["dropped"] == 0
    assert stages["perplexity"]["rows_out"] == curated.count()
