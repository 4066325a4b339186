"""Deterministic hash split / sample semantics."""

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.functions import sampling as smp


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_hash_split_partitions_everything(spark, ids):
    out = smp.hash_split(ids, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    # expected 1600/200/200; allow generous hash tolerance
    assert 1480 < counts["train"] < 1720
    assert 130 < counts["val"] < 270
    assert 130 < counts["test"] < 270


def test_hash_split_deterministic_and_salt_sensitive(spark, ids):
    a = dict(smp.hash_split(ids, {"a": 0.5, "b": 0.5}).collect())
    b = dict(smp.hash_split(ids, {"a": 0.5, "b": 0.5}).collect())
    assert a == b
    c = dict(smp.hash_split(ids, {"a": 0.5, "b": 0.5}, salt="other").collect())
    assert a != c


def test_hash_split_weights_normalized(spark, ids):
    frac = dict(smp.hash_split(ids, {"x": 8, "y": 2}).collect())
    ref = dict(smp.hash_split(ids, {"x": 0.8, "y": 0.2}).collect())
    assert frac == ref


def test_hash_sample_nested_and_stable(spark, ids):
    s10 = {r["doc_id"] for r in smp.hash_sample(ids, 0.10).collect()}
    s01 = {r["doc_id"] for r in smp.hash_sample(ids, 0.01).collect()}
    assert s01 <= s10  # same salt, growing fraction -> nested
    assert smp.hash_sample(ids, 0.0).count() == 0
    assert smp.hash_sample(ids, 1.0).count() == 2000
    assert {r["doc_id"] for r in smp.hash_sample(ids, 0.10).collect()} == s10


def test_stratified_sample_per_stratum(spark):
    rows = [(i, "hub" if i % 2 == 0 else "rare") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, kind string")
    out = smp.stratified_sample(
        df, {"hub": 0.1, "rare": 1.0}, strata_col="kind", id_col="doc_id"
    )
    counts = {r["kind"]: r["n"] for r in out.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts["rare"] == 2000  # kept whole
    assert 120 < counts["hub"] < 280  # ~10% of 2000
    # unlisted strata use default_fraction (0.0 -> dropped)
    df2 = df.withColumn("kind", F.lit("other"))
    assert smp.stratified_sample(
        df2, {"hub": 0.1}, strata_col="kind", id_col="doc_id"
    ).count() == 0


def test_validation_errors(spark, ids):
    with pytest.raises(ValueError):
        smp.hash_sample(ids, 1.5)
    with pytest.raises(ValueError):
        smp.hash_split(ids, {})
    with pytest.raises(ValueError):
        smp.stratified_sample(ids, {"a": 2.0}, strata_col="doc_id")


def test_pack_sequences_invariants(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(10 + i % 37))) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = smp.pack_sequences(df, budget=100, n_shards=4).collect()
    assert len(out) == 300
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard, rs in by_shard.items():
        # reconstruct the stream: offsets within a (shard, seq) are a
        # contiguous token stream cut every `budget` tokens
        rs = sorted(rs, key=lambda r: (r["seq"], r["tok_offset"]))
        stream = 0
        for r in rs:
            assert r["seq"] == stream // 100
            assert r["tok_offset"] == stream % 100
            stream += r["n_tokens"]
        total = sum(r["n_tokens"] for r in rs)
        assert stream == total
        # every sequence index up to the last is populated (no gaps)
        seqs = {r["seq"] for r in rs}
        assert seqs == set(range(max(seqs) + 1))


def test_pack_sequences_deterministic_and_growth_stable(spark):
    rows = [(i, "a b c d e f g h") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: (r["shard"], r["seq"], r["tok_offset"])
         for r in smp.pack_sequences(df, budget=32, n_shards=4).collect()}
    b = {r["doc_id"]: (r["shard"], r["seq"], r["tok_offset"])
         for r in smp.pack_sequences(df, budget=32, n_shards=4).collect()}
    assert a == b
    # shard assignment is per-id stable when the corpus grows
    grown = spark.createDataFrame(
        rows + [(1000 + i, "x y z") for i in range(50)],
        "doc_id long, text string",
    )
    g = {r["doc_id"]: r["shard"]
         for r in smp.pack_sequences(grown, budget=32, n_shards=4).collect()}
    for d, (shard, _, _) in a.items():
        assert g[d] == shard


def test_pack_sequences_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        smp.pack_sequences(df, budget=0)


def test_neighbor_sample_matches_brute_force(spark):
    """Engine picks = plain-python md5 ranking; fanout caps hold; each
    hop's sources are exactly the previous hop's distinct dsts."""
    import hashlib

    from neo4j_graph_algorithms_spark import Graph, neighbor_sample

    edges = [(s, d) for s in range(6) for d in range(6, 16) if (s * 7 + d) % 3 != 0]
    edges += [(d, dd) for d in range(6, 16) for dd in range(16, 20) if (d + dd) % 2 == 0]
    g = Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    out = neighbor_sample(g, seeds, fanouts=(3, 2)).collect()

    def rank(hop, s, d):
        return hashlib.md5(f"sage:{hop}:{s}:{d}".encode()).hexdigest()

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    expect = set()
    frontier = {0, 1, 2}
    for hop, fanout in enumerate((3, 2)):
        nxt = set()
        for s in sorted(frontier):
            picks = sorted(adj.get(s, []), key=lambda d: (rank(hop, s, d), d))[:fanout]
            for d in picks:
                expect.add((hop, s, d))
                nxt.add(d)
        frontier = nxt
    assert {(r["hop"], r["src"], r["dst"]) for r in out} == expect
    # per-src fanout cap per hop
    from collections import Counter

    c = Counter((r["hop"], r["src"]) for r in out)
    assert all(n <= (3 if hop == 0 else 2) for (hop, _), n in c.items())
    # deterministic across runs
    again = {(r["hop"], r["src"], r["dst"])
             for r in neighbor_sample(g, seeds, fanouts=(3, 2)).collect()}
    assert again == expect
    # validation
    with pytest.raises(ValueError):
        neighbor_sample(g, seeds, fanouts=())


def test_weighted_sample_aes_twin_and_growth_stable(spark):
    """weighted_sample replays the A-ES keys of a hashlib twin, keeps
    only positive weights, and is growth-stable (adding rows never
    changes a surviving row's key)."""
    import hashlib
    import math

    from neo4j_graph_algorithms_spark.functions.sampling import weighted_sample

    rows = [(i, float(w)) for i, w in enumerate([5.0, 1.0, 20.0, 0.0, -3.0, 8.0, 2.5, 13.0])]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, n=4, weight_col="w").collect()

    def key(i, w):
        u = (int(hashlib.md5(f"{i}:wsample".encode()).hexdigest()[:15], 16) % 1_000_000 + 0.5) / 1e6
        return round(math.log(u) / w, 9)

    expect = sorted(
        ((i, key(i, w)) for i, w in rows if w > 0),
        key=lambda t: (-t[1], t[0]),
    )[:4]
    assert [(r["doc_id"], r["sample_key"]) for r in got] == expect
    # zero/negative weights never sampled even with n > positives
    all_got = weighted_sample(df, n=100, weight_col="w").collect()
    assert {r["doc_id"] for r in all_got} == {i for i, w in rows if w > 0}
    # growth stability: new rows don't perturb surviving keys
    bigger = df.union(spark.createDataFrame([(100, 50.0), (101, 0.7)], "doc_id long, w double"))
    keys_before = {r["doc_id"]: r["sample_key"] for r in all_got}
    for r in weighted_sample(bigger, n=100, weight_col="w").collect():
        if r["doc_id"] in keys_before:
            assert r["sample_key"] == keys_before[r["doc_id"]]
