"""Scalar functions, catalog, dedup / similarity / text operators."""

import math

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.functions import (
    algo_list,
    dedup,
    is_finite,
    is_infinite,
    similarity,
    textstats,
)


def test_scalar_predicates(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("inf",),), (float("-inf"),), (float("nan"),), (None,)],
        "x double",
    )
    got = df.select(
        "x", is_finite(F.col("x")).alias("fin"), is_infinite(F.col("x")).alias("inf")
    ).collect()
    by = {(
        "None" if r["x"] is None else ("nan" if isinstance(r["x"], float) and math.isnan(r["x"]) else r["x"])
    ): r for r in got}
    assert by[1.0]["fin"] is True and by[1.0]["inf"] is False
    assert by[float("inf")]["fin"] is False and by[float("inf")]["inf"] is True
    assert by["nan"]["fin"] is False
    assert by["None"]["fin"] is None or by["None"]["fin"] is False


def test_algo_list_catalog(spark):
    df = algo_list(spark)
    names = {r["name"] for r in df.collect()}
    assert "algo.pageRank" in names and "algo.unionFind" in names
    filtered = algo_list(spark, "triangle")
    assert all("triangle" in r["name"] for r in filtered.collect())


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),          # near dup
        (3, "der hund ist nicht mit der katze und das haus"),
        (4, "le chat est dans la maison et pour les amis"),
        (5, "zzz qqq xxx"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = dedup.exact_duplicates(docs).collect()
    dup = [g for g in groups if g["dup_count"] > 1]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0
    kept = dedup.dedup_exact(docs)
    assert kept.count() == 6
    assert kept.filter(F.col("doc_id") == 1).count() == 0


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(docs).collect()}
    assert (0, 1) in pairs  # identical docs always collide
    # unrelated docs don't
    assert (3, 4) not in pairs and (0, 5) not in pairs


def test_minhash_lsh_max_band_df_guard(spark):
    # 30 identical docs form one mega-bucket in every band; the guard
    # drops buckets over the cap, so the identical flood produces NO
    # candidate pairs while a distinct near-dup pair elsewhere survives
    rows = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(30)]
    rows += [
        (100, "entirely different text about graph algorithms on spark clusters today"),
        (101, "entirely different text about graph algorithms on spark engines today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    guarded = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(docs, max_band_df=10).collect()
    }
    assert all(a >= 100 for a, _ in guarded)  # flood suppressed
    assert (100, 101) in guarded              # real near-dup kept
    unguarded = dedup.minhash_lsh_candidates(docs).count()
    assert unguarded >= 30 * 29 / 2           # without the guard: quadratic


def test_ngram_jaccard(spark, docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_df=10).collect()
    }
    assert out[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in out and out[(0, 2)] < 1.0


def test_repeated_spans_maximal_merge(spark, docs):
    # n=3, min_docs=2: docs 0/1 share every 3-gram (one full-doc span);
    # doc 2 shares its prefix ("the quick brown fox") and suffix
    # ("over the lazy dog") but not the middle — two separate maximal
    # spans with the gap preserved.
    rows = {
        (r["doc_id"], r["start"], r["end"], r["n_tokens"])
        for r in dedup.repeated_spans(docs, n=3, min_docs=2).collect()
    }
    assert rows == {
        (0, 0, 8, 9),
        (1, 0, 8, 9),
        (2, 0, 3, 4),   # hot 3-gram positions 0,1 → tokens 0..3
        (2, 5, 8, 4),   # hot 3-gram positions 5,6 → tokens 5..8
    }


def test_simhash_hamming(spark, docs):
    sh = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical simhash
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far
    assert sh[6] == 0  # empty doc


def test_token_and_quality(spark, docs):
    q = {r["doc_id"]: r for r in textstats.quality_stats(docs).collect()}
    assert q[0]["n_tokens"] == 9
    assert q[6]["n_tokens"] == 0 and q[6]["mean_token_len"] == 0.0
    assert q[0]["stopword_ratio"] > 0


def test_language_id(spark, docs):
    lang = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(docs).collect()}
    assert lang[0] == "en"
    assert lang[3] == "de"
    assert lang[4] == "fr"
    assert lang[5] == "unknown"


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [1.0, 0.01, 0.0]),  # closest to 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_tfidf_matches_hand_computation(spark, docs):
    out = {
        (r["doc_id"], r["term"]): r
        for r in textstats.tfidf(docs).collect()
    }
    # "quick" appears once in docs 0, 1, 2 -> df=3, N=7
    for d in (0, 1, 2):
        r = out[(d, "quick")]
        assert r["tf"] == 1 and r["df"] == 3
        assert r["tfidf"] == pytest.approx(math.log(7 / 3), abs=1e-6)
    # "the" appears twice in each of docs 0-2 -> tf=2
    assert out[(0, "the")]["tf"] == 2
    # "der" twice in doc 3 only: df=1 -> idf = ln(7)
    r = out[(3, "der")]
    assert r["tf"] == 2 and r["df"] == 1
    assert r["tfidf"] == pytest.approx(2 * math.log(7.0), abs=1e-6)
    # empty doc contributes no rows
    assert not any(k[0] == 6 for k in out)
    # min_df prunes rare terms
    pruned = textstats.tfidf(docs, min_df=2)
    assert not any(r["term"] == "der" for r in pruned.collect())


def test_bm25_matches_hand_computation(spark, docs):
    got = {r["doc_id"]: r["score"] for r in
           textstats.bm25_score(docs, ["fox", "katze"]).collect()}
    # reference BM25 (Lucene idf), computed independently in python
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox leaps over the lazy dog",
        3: "der hund ist nicht mit der katze und das haus",
        4: "le chat est dans la maison et pour les amis",
        5: "zzz qqq xxx",
    }
    toks = {d: t.split() for d, t in texts.items()}
    n, avgdl = 7, (9 + 9 + 9 + 10 + 10 + 3 + 0) / 7
    df = {"fox": 3, "katze": 1}

    def score(d):
        s = 0.0
        for term, dfv in df.items():
            tf = toks[d].count(term)
            if not tf:
                continue
            idf = math.log(1 + (n - dfv + 0.5) / (dfv + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl))
        return s

    assert set(got) == {0, 1, 2, 3}
    for d in got:
        assert got[d] == pytest.approx(score(d), abs=1e-6)
    # the doc matching the rarer term outscores the common-term docs
    assert got[3] > got[0]


def test_vocab_join_modes_identical(spark, docs):
    # broadcast_vocab=False pins a spilling sort-merge for unbounded
    # vocabularies — values must be identical to the broadcast default
    base = {tuple(r) for r in textstats.tfidf(docs).collect()}
    merged = {tuple(r) for r in textstats.tfidf(docs, broadcast_vocab=False).collect()}
    assert base == merged
    pb = {tuple(r) for r in textstats.pmi_bigrams(docs, min_count=1).collect()}
    pm = {
        tuple(r)
        for r in textstats.pmi_bigrams(docs, min_count=1, broadcast_vocab=False).collect()
    }
    assert pb == pm


def test_pmi_bigrams_collocation_ranking(spark, docs):
    out = {(r["w1"], r["w2"]): r for r in
           textstats.pmi_bigrams(docs, min_count=2).collect()}
    # "quick brown" is adjacent in docs 0-2 (3 times); "the quick" too
    assert out[("quick", "brown")]["pair_count"] == 3
    # exclusive pair ("quick","brown") has higher PMI than a pair
    # involving the high-frequency "the" (6 unigram occurrences)
    assert out[("quick", "brown")]["pmi"] > out[("the", "quick")]["pmi"]
    # hand-check one value: U=58 tokens... compute exactly
    import itertools
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox leaps over the lazy dog",
        "der hund ist nicht mit der katze und das haus",
        "le chat est dans la maison et pour les amis",
        "zzz qqq xxx",
    ]
    toks = [t.split() for t in texts]
    uni = {}
    for t in itertools.chain.from_iterable(toks):
        uni[t] = uni.get(t, 0) + 1
    U = sum(uni.values())
    bigs = {}
    for t in toks:
        for a, b in zip(t, t[1:]):
            bigs[(a, b)] = bigs.get((a, b), 0) + 1
    B = sum(bigs.values())
    expect = math.log((3 / B) / ((uni["quick"] / U) * (uni["brown"] / U)))
    assert out[("quick", "brown")]["pmi"] == pytest.approx(expect, abs=1e-6)


def test_lm_perplexity_matches_hand_computation(spark, docs):
    out = {r["doc_id"]: r for r in textstats.lm_perplexity(docs).collect()}
    # independent add-1 bigram LM in plain python
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox leaps over the lazy dog",
        3: "der hund ist nicht mit der katze und das haus",
        4: "le chat est dans la maison et pour les amis",
        5: "zzz qqq xxx",
    }
    toks = {d: t.split() for d, t in texts.items()}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    V = len(uni)

    def h(d):
        bs = list(zip(toks[d], toks[d][1:]))
        s = sum(math.log((big[p] + 1.0) / (uni[p[0]] + V)) for p in bs)
        return -s / len(bs)

    assert set(out) == {0, 1, 2, 3, 4, 5}  # empty doc 6 has no bigrams
    for d in out:
        assert out[d]["n_bigrams"] == len(toks[d]) - 1
        assert out[d]["cross_entropy"] == pytest.approx(h(d), abs=1e-6)
        assert out[d]["perplexity"] == pytest.approx(math.exp(h(d)), abs=1e-4)
    # duplicated fluent text scores lower (more probable) than the
    # one-off garbage doc
    assert out[0]["perplexity"] < out[5]["perplexity"]
    # held-out scoring: unseen bigrams back off to the smoothing mass
    held = spark.createDataFrame(
        [(9, "fox dans haus")], "doc_id long, text string"
    )
    r = textstats.lm_perplexity(held, train_df=docs).collect()[0]
    exp_h = -(
        math.log((big.get(("fox", "dans"), 0) + 1.0) / (uni["fox"] + V))
        + math.log((big.get(("dans", "haus"), 0) + 1.0) / (uni["dans"] + V))
    ) / 2
    assert r["cross_entropy"] == pytest.approx(exp_h, abs=1e-6)


def test_repetition_stats_hand_computation(spark):
    rows = [
        (0, "a b a b a b"),          # "a b" 3x of 5 bigrams, all dup'd except "b a"? no: b a appears 2x
        (1, "one two three four five"),  # all n-grams unique
        (2, "x"),                    # <2 tokens -> absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textstats.repetition_stats(df).collect()}
    assert set(out) == {0, 1}
    # doc 0 bigrams: ab ba ab ba ab -> counts {ab:3, ba:2}; top=3/5, dup=5/5
    assert out[0]["top2gram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert out[0]["dup2gram_frac"] == pytest.approx(1.0, abs=1e-6)
    # doc 0 trigrams: aba bab aba bab -> {aba:2, bab:2}; top=2/4, dup=1.0
    assert out[0]["top3gram_frac"] == pytest.approx(0.5, abs=1e-6)
    assert out[0]["dup3gram_frac"] == pytest.approx(1.0, abs=1e-6)
    # doc 1: everything unique
    assert out[1]["top2gram_frac"] == pytest.approx(1 / 4, abs=1e-6)
    assert out[1]["dup2gram_frac"] == 0.0
    assert out[1]["top4gram_frac"] == pytest.approx(1 / 2, abs=1e-6)
    # a doc with 2 tokens has bigram stats but NULL tri/quad stats
    short = spark.createDataFrame([(9, "p q")], "doc_id long, text string")
    r = textstats.repetition_stats(short).collect()[0]
    assert r["top2gram_frac"] == 1.0
    assert r["top3gram_frac"] is None and r["dup4gram_frac"] is None


def test_corpus_profile_exact_quantiles(spark, docs):
    out = {r["metric"]: r for r in textstats.corpus_profile(docs).collect()}
    assert set(out) == {
        "n_chars", "n_tokens", "mean_token_len", "space_ratio", "stopword_ratio"
    }
    # independent reference: numpy linear-interpolation quantiles over
    # the same per-doc token counts (7 docs incl. the empty one)
    import numpy as np

    n_tokens = [9, 9, 9, 10, 10, 3, 0]
    r = out["n_tokens"]
    assert r["n"] == 7
    assert r["mean"] == pytest.approx(np.mean(n_tokens), abs=1e-6)
    for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        assert r[col] == pytest.approx(
            float(np.quantile(n_tokens, p)), abs=1e-6
        ), (p, col)
    # approx path returns the same shape with sane values
    ap = {r["metric"]: r for r in textstats.corpus_profile(docs, approx=True).collect()}
    assert set(ap) == set(out)
    assert ap["n_tokens"]["n"] == 7
    assert 0 <= ap["n_tokens"]["p50"] <= 10


def test_string_ids_through_text_pipeline(spark):
    """The curation surface is id-type-agnostic: string doc ids flow
    through scoring, packing, and clustering without numeric casts."""
    df = spark.createDataFrame(
        [("docA", "the quick brown fox"), ("docB", "spam spam spam"),
         ("docC", "one two three four")],
        "doc_id string, text string",
    )
    assert {r["doc_id"] for r in textstats.lm_perplexity(df).collect()} == {
        "docA", "docB", "docC"
    }
    assert textstats.repetition_stats(df).count() == 3
    from neo4j_graph_algorithms_spark.functions import sampling as smp

    packed = smp.pack_sequences(df, budget=8, n_shards=2).collect()
    assert {r["doc_id"] for r in packed} == {"docA", "docB", "docC"}
    # near-dup clustering dense-remaps non-numeric ids through the
    # engine's IdMap; cluster_id = min ORIGINAL id, chain collapsed
    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docB", "docC")], "id_a string, id_b string"
    )
    out = {r["doc_id"]: r for r in dedup.near_dup_clusters(pairs).collect()}
    assert all(out[d]["cluster_id"] == "docA" for d in ("docA", "docB", "docC"))
    assert out["docA"]["keep"] and not out["docB"]["keep"]
    # empty pair table: no inference crash, empty result
    empty = spark.createDataFrame([], "id_a string, id_b string")
    assert dedup.near_dup_clusters(empty).collect() == []


def test_cosine_topk_exact(spark, vectors):
    out = similarity.cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["vec_id"] for r in rows] == [4, 1]
    assert rows[0]["sim"] > rows[1]["sim"] > 0.9


def test_embedding_near_duplicates_exact_vs_lsh(spark, vectors):
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_duplicates(
            vectors, threshold=0.99, use_lsh=False
        ).collect()
    }
    assert (0, 4) in exact and (0, 2) not in exact
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_duplicates(
            vectors, threshold=0.99, use_lsh=True, num_planes=4, num_tables=4
        ).collect()
    }
    assert lsh <= exact  # LSH can only miss, never invent


def test_ivf_topk_recall_vs_exact(spark):
    from neo4j_graph_algorithms_spark.functions import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id < 10")
    exact = {(r["query_id"], r["vec_id"])
             for r in sim.cosine_topk(emb, queries, k=5).collect()}
    # probing every centroid must reproduce the exact result
    full = {(r["query_id"], r["vec_id"])
            for r in sim.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8).collect()}
    assert full == exact
    # partial probing is a subset-quality tradeoff: sane recall, valid rows
    part = sim.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3).collect()
    hit = sum(1 for r in part if (r["query_id"], r["vec_id"]) in exact)
    assert len(part) > 0 and hit / len(exact) > 0.3
    assert all(1 <= r["rank"] <= 5 for r in part)


def test_knn_graph_bridges_to_graph_ops(spark):
    """Embeddings → IVF kNN graph → WCC: two well-separated embedding
    clusters come out as two connected components of the mutual-kNN
    graph — the similarity→link-graph bridge end to end."""
    from neo4j_graph_algorithms_spark import Graph, wcc
    from neo4j_graph_algorithms_spark.functions import similarity as sim

    rows = []
    for i in range(12):  # cluster A around (1, 0, 0), cluster B around (0, 1, 0)
        rows.append((i, [1.0, 0.01 * i, 0.0]))
        rows.append((100 + i, [0.01 * i, 1.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    edges = sim.knn_graph(emb, k=3, n_centroids=4, nprobe=2, mutual=True)
    rows_out = edges.collect()
    assert rows_out, "mutual kNN graph is empty"
    # no cross-cluster edges: cosine between the clusters is ~0.01
    for r in rows_out:
        assert (r["src"] < 100) == (r["dst"] < 100), (r["src"], r["dst"])
        assert r["weight"] > 0.9

    comp = wcc(Graph.from_edges(edges)).components
    n_comp = comp.select("set_id").distinct().count()
    assert n_comp == 2


def test_scale_properties_all_scalers(spark):
    import math

    from neo4j_graph_algorithms_spark.functions import scaling

    df = spark.createDataFrame(
        [(0, 2.0), (1, 4.0), (2, 6.0), (3, 8.0)], "id long, x double"
    )
    mm = {r["id"]: r["x_scaled"]
          for r in scaling.scale_properties(df, ["x"], "minmax").collect()}
    assert mm == {0: 0.0, 1: pytest.approx(1 / 3), 2: pytest.approx(2 / 3), 3: 1.0}
    sd = {r["id"]: r["x_scaled"]
          for r in scaling.scale_properties(df, ["x"], "stdscore").collect()}
    assert sum(sd.values()) == pytest.approx(0.0)
    assert sd[3] == pytest.approx((8.0 - 5.0) / math.sqrt(5.0))
    mx = {r["id"]: r["x_scaled"]
          for r in scaling.scale_properties(df, ["x"], "max").collect()}
    assert mx[3] == 1.0 and mx[0] == 0.25
    lg = {r["id"]: r["x_scaled"]
          for r in scaling.scale_properties(df, ["x"], "log").collect()}
    assert lg[0] == pytest.approx(math.log1p(2.0))
    # degenerate: constant column -> zeros, not NaN/error
    c = spark.createDataFrame([(0, 5.0), (1, 5.0)], "id long, x double")
    z = {r["id"]: r["x_scaled"]
         for r in scaling.scale_properties(c, ["x"], "minmax").collect()}
    assert z == {0: 0.0, 1: 0.0}


def test_scale_properties_l2norm_rowwise(spark):
    from neo4j_graph_algorithms_spark.functions import scaling

    df = spark.createDataFrame([(0, 3.0, 4.0), (1, 0.0, 0.0)], "id long, a double, b double")
    out = {r["id"]: (r["a_scaled"], r["b_scaled"])
           for r in scaling.scale_properties(df, ["a", "b"], "l2norm").collect()}
    assert out[0] == (pytest.approx(0.6), pytest.approx(0.8))
    assert out[1] == (0.0, 0.0)


def test_simhash_near_pairs_exact_recall(spark, docs):
    # brute-force ground truth vs the banded join: pigeonhole bands
    # guarantee 100% recall within max_hamming, and the bit_count
    # filter guarantees 100% precision.
    d = docs.filter(F.length("text") > 0)
    sh = {r["id"]: r["simhash"] for r in dedup.simhash(d).collect()}
    for h in (2, 5):
        want = {
            (a, b, bin(sh[a] ^ sh[b]).count("1"))
            for a in sh for b in sh
            if a < b and bin(sh[a] ^ sh[b]).count("1") <= h
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dedup.simhash_near_pairs(d, max_hamming=h).collect()
        }
        assert got == want


@pytest.fixture(scope="module")
def contam(spark):
    probes = spark.createDataFrame(
        [
            (100, "what is the capital of france paris"),
            (101, "cooking pasta is fun always"),
            (102, "totally unmatched probe sentence here"),
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (0, "question what is the capital of france paris answer below"),
            (1, "the capital of spain is madrid not france"),
            (2, "completely unrelated text about cooking pasta is fun"),
            (3, "nothing shared anywhere in this one"),
        ],
        "doc_id long, text string",
    )
    return corpus, probes


def test_contamination_report(spark, contam):
    corpus, probes = contam
    rows = {
        r["doc_id"]: (
            r["contaminated_grams"],
            r["total_grams"],
            r["contaminated_frac"],
            r["probes_hit"],
        )
        for r in dedup.contamination_report(corpus, probes, n=3).collect()
    }
    assert set(rows) == {0, 1, 2}  # doc 3 is clean — absent
    assert rows[0] == (5, 8, pytest.approx(5 / 8), 1)
    assert rows[1] == (1, 6, pytest.approx(1 / 6), 1)
    assert rows[2] == (2, 6, pytest.approx(2 / 6), 1)


def test_contamination_report_no_broadcast_parity(spark, contam):
    corpus, probes = contam
    a = sorted(
        map(tuple, dedup.contamination_report(corpus, probes, n=3).collect())
    )
    b = sorted(
        map(
            tuple,
            dedup.contamination_report(
                corpus, probes, n=3, broadcast_probes=False
            ).collect(),
        )
    )
    assert a == b


def test_contamination_spans(spark, contam):
    corpus, probes = contam
    spans = {
        (r["doc_id"], r["start"], r["end"], r["n_tokens"])
        for r in dedup.contamination_spans(corpus, probes, n=3).collect()
    }
    # doc 0: probe 100's 5 grams hit positions 1-5 -> one span over
    # tokens 1..7; doc 1: single shared gram "the capital of" at 0;
    # doc 2: probe 101 grams at positions 4,5 -> tokens 4..7.
    assert spans == {(0, 1, 7, 7), (1, 0, 2, 3), (2, 4, 7, 4)}


def test_contamination_probe_overlap_multi(spark):
    # one doc hitting two distinct probes counts probes_hit = 2
    probes = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(7, "alpha beta gamma delta then epsilon zeta eta theta end")],
        "doc_id long, text string",
    )
    r = dedup.contamination_report(corpus, probes, n=3).collect()[0]
    assert r["probes_hit"] == 2 and r["contaminated_grams"] == 4


def test_near_dup_clusters_transitive(spark):
    # near-dup is not transitive: the pair list is a chain 1~2, 2~3
    # (no 1~3 pair) plus an isolated pair 10~11 — clustering must
    # still put {1,2,3} in one group with keep = min id.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup.near_dup_clusters(pairs).collect()
    }
    assert rows == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
    }
    # two-phase star contraction emits the identical partition
    rows2 = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in dedup.near_dup_clusters(pairs, two_phase=True).collect()
    }
    assert rows2 == rows


def test_funnel_first_touch_semantics(spark):
    from datetime import datetime as dt

    from neo4j_graph_algorithms_spark.functions import behavior

    rows = [
        # u1 completes the funnel in order
        (1, dt(2024, 1, 1, 10), "view"), (1, dt(2024, 1, 1, 11), "click"),
        (1, dt(2024, 1, 1, 12), "purchase"),
        # u2 clicked BEFORE first view -> stage 2 not reached
        (2, dt(2024, 1, 1, 9), "click"), (2, dt(2024, 1, 1, 10), "view"),
        # u3 stops after click
        (3, dt(2024, 1, 2, 8), "view"), (3, dt(2024, 1, 2, 9), "click"),
        # u4 never views
        (4, dt(2024, 1, 1, 8), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["stage"]: r for r in
           behavior.funnel(ev, ("view", "click", "purchase")).collect()}
    assert out[1]["users"] == 3 and out[1]["event_type"] == "view"
    assert out[2]["users"] == 2
    assert out[3]["users"] == 1
    with pytest.raises(ValueError):
        behavior.funnel(ev, ())


def test_retention_cohorts_weekly(spark):
    from datetime import datetime as dt

    from neo4j_graph_algorithms_spark.functions import behavior

    # 2024-01-01 is a Monday: W0=01-01, W1=01-08, W3=01-22
    rows = [
        (1, dt(2024, 1, 2), "view"), (1, dt(2024, 1, 9), "view"),    # W0, back W1
        (2, dt(2024, 1, 3), "view"),                                  # W0 only
        (3, dt(2024, 1, 10), "view"), (3, dt(2024, 1, 23), "view"),  # W1, back W3
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {(str(r["cohort"]), r["period"]): r
           for r in behavior.retention_cohorts(ev).collect()}
    assert out[("2024-01-01", 0)]["users"] == 2
    assert out[("2024-01-01", 0)]["retention"] == 1.0
    assert out[("2024-01-01", 1)]["users"] == 1
    assert out[("2024-01-01", 1)]["retention"] == 0.5
    assert out[("2024-01-08", 0)]["users"] == 1
    assert out[("2024-01-08", 2)]["users"] == 1
    assert len(out) == 4


def _md5_bucket(s: str, n: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n


def test_kmeans_python_twin(spark):
    """similarity.kmeans replicates a sequential-arithmetic Python twin
    bit-for-bit: md5-seeded centroids, 6-dp cosine argmax with
    centroid-id tie-break, exact scaled-integer means."""
    import hashlib
    import math

    from neo4j_graph_algorithms_spark.functions import similarity as sim

    vals = [
        [0.11, 0.93, 0.21, 0.05], [0.13, 0.91, 0.19, 0.07],
        [0.92, 0.08, 0.33, 0.41], [0.88, 0.12, 0.29, 0.44],
        [0.07, 0.22, 0.95, 0.61], [0.09, 0.18, 0.89, 0.58],
        [0.51, 0.49, 0.52, 0.48], [0.44, 0.56, 0.47, 0.53],
        [0.95, 0.91, 0.11, 0.08], [0.15, 0.12, 0.14, 0.97],
        [0.21, 0.17, 0.09, 0.91], [0.87, 0.85, 0.14, 0.12],
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vals)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in sim.kmeans(df, k=3, iterations=2).collect()
    }

    # ---- python twin (sequential double arithmetic, like Spark's
    # aggregate over the array) ----
    def scale(x):  # F.round HALF_UP at 1e6, via float32 like the column cast
        import struct

        x32 = struct.unpack("f", struct.pack("f", x))[0]
        v = x32 * 1e6
        return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))

    sv = {i: [scale(x) for x in v] for i, v in enumerate(vals)}
    cv = {i: [e / 1e6 for e in s] for i, s in sv.items()}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        na, nb = math.sqrt(na), math.sqrt(nb)
        return dot / (na * nb) if na > 0 and nb > 0 else 0.0

    cents = {
        i: cv[i]
        for i in sorted(cv, key=lambda j: hashlib.md5(str(j).encode()).hexdigest())[:3]
    }

    def assign(cents_d):
        out = {}
        for i in cv:
            best = min(
                cents_d, key=lambda c: (-round(cos(cv[i], cents_d[c]), 6), c)
            )
            out[i] = best
        return out

    for _ in range(2):
        a = assign(cents)
        nxt = {}
        for c in set(a.values()):
            members = [i for i in a if a[i] == c]
            dims = len(sv[members[0]])
            nxt[c] = [
                (float(sum(sv[i][d] for i in members)) / len(members)) / 1e6
                for d in range(dims)
            ]
        cents = nxt
    expect = assign(cents)
    assert got == expect


def test_semdedup_keep_lowest_id(spark):
    from neo4j_graph_algorithms_spark.functions import similarity as sim

    base = [0.9, 0.1, 0.2, 0.3]
    rows = [
        (0, base), (1, base), (5, base),            # identical triple
        (2, [0.1, 0.9, 0.1, 0.1]),
        (3, [0.1, 0.1, 0.9, 0.1]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in sim.semdedup(df, threshold=0.999, k=2).collect()}
    assert len(out) == 5
    # identical vectors always share a cluster -> only the lowest id kept
    assert out[0]["kept"] and not out[1]["kept"] and not out[5]["kept"]
    assert out[1]["cluster"] == out[0]["cluster"] == out[5]["cluster"]
    # the distinct vectors survive
    assert out[2]["kept"] and out[3]["kept"]


def test_dsir_weights_brute_force(spark):
    import math

    corpus = [
        (0, "spark join filter", "en"),
        (1, "spark join spark join", "en"),
        (2, "la table et la ligne", "fr"),
        (3, "filter scan merge", "en"),
        (4, "et la ligne et", "fr"),
        (5, "", "fr"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r
        for r in textstats.dsir_log_weights(
            df, df.filter(F.col("lang") == "en"), n_buckets=64
        ).collect()
    }

    def feats(text):
        toks = [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    B, k = 64, 1.0
    doc_f = {d: [_md5_bucket(f + ":dsir", B) for f in feats(t)] for d, t, _ in corpus}
    raw, tgt = {}, {}
    for d, t, lang in corpus:
        for b in doc_f[d]:
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    tot_r, tot_t = sum(raw.values()), sum(tgt.values())
    for d, t, _ in corpus:
        if not doc_f[d]:
            assert d not in got  # featureless docs are absent
            continue
        lw = sum(
            math.log((tgt.get(b, 0) + k) / (tot_t + k * B))
            - math.log((raw[b] + k) / (tot_r + k * B))
            for b in doc_f[d]
        )
        assert got[d]["n_features"] == len(doc_f[d])
        assert got[d]["log_weight"] == pytest.approx(lw, abs=1e-6)
    # english docs should score higher than french ones on average
    en = [got[d]["log_weight"] for d, _, lang in corpus if lang == "en" and d in got]
    fr = [got[d]["log_weight"] for d, _, lang in corpus if lang == "fr" and d in got]
    assert min(en) > max(fr)


def test_dsir_resample_top_n(spark):
    corpus = [
        (0, "spark join filter", "en"),
        (1, "la table et la ligne", "fr"),
        (2, "spark scan merge join", "en"),
        (3, "et la ligne et", "fr"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    tgt = df.filter(F.col("lang") == "en")
    out = textstats.dsir_resample(df, tgt, n=2, n_buckets=64).collect()
    assert len(out) == 2
    assert out[0]["score"] >= out[1]["score"]
    # deterministic across invocations
    out2 = textstats.dsir_resample(df, tgt, n=2, n_buckets=64).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in out2]


def test_cms_term_counts_brute_force(spark):
    """cms_term_counts replays a hashlib twin exactly and never
    undercounts (one-sided CMS error)."""
    import re as _re

    corpus = [
        (0, "spark spark spark join filter"),
        (1, "join spark merge join"),
        (2, "scan filter spark join merge merge"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["term"]: r["est_count"]
        for r in textstats.cms_term_counts(
            df, depth=4, width=8, min_estimate=2
        ).collect()
    }

    toks = [t for _, x in corpus for t in _re.split(r"[^a-z0-9]+", x.lower()) if t]
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    sketch = {}
    for t in toks:
        for j in range(4):
            b = _md5_bucket(f"{j}:{t}", 8)
            sketch[(j, b)] = sketch.get((j, b), 0) + 1
    expect = {}
    for t in exact:
        est = min(sketch[(j, _md5_bucket(f"{j}:{t}", 8))] for j in range(4))
        if est >= 2:
            expect[t] = est
    assert got == expect
    # one-sided error: estimates never undercount
    for t, e in got.items():
        assert e >= exact[t]


def test_fm_distinct_brute_force(spark):
    """fm_distinct replays a hashlib twin bit-for-bit (masks and
    estimator), and duplicate values never change a group's masks."""
    import hashlib
    import math

    rows = [
        ("en", "spark"), ("en", "join"), ("en", "spark"), ("en", "filter"),
        ("en", "merge"), ("fr", "la"), ("fr", "table"), ("fr", "la"),
    ]
    df = spark.createDataFrame(rows, "lang string, term string")
    got = {
        r["lang"]: r["est_distinct"]
        for r in textstats.fm_distinct(df, "lang", "term", replicas=16).collect()
    }

    def est(values):
        masks = [0] * 16
        for v in set(values):
            for r in range(16):
                h = int(hashlib.md5(f"0:{r}:{v}".encode()).hexdigest()[:15], 16)
                pos = min(((h & -h) - 1).bit_count(), 62)
                masks[r] |= 1 << pos
        s = 0
        for m in masks:
            nm = ~m
            s += ((nm & -nm) - 1).bit_count()
        return round(2.0 ** (s / 16.0) / 0.77351, 6)

    assert got["en"] == est([t for g, t in rows if g == "en"])
    assert got["fr"] == est([t for g, t in rows if g == "fr"])
    # duplicates are absorbed: repeating the corpus changes nothing
    doubled = df.union(df)
    got2 = {
        r["lang"]: r["est_distinct"]
        for r in textstats.fm_distinct(doubled, "lang", "term", replicas=16).collect()
    }
    assert got2 == got


def test_new_ops_partitioning_invariant(spark):
    """The determinism claims hold under physical layout changes:
    kmeans / semdedup / dsir / weighted_sample / cms return identical
    results regardless of partition count or row order."""
    from neo4j_graph_algorithms_spark.functions import sampling as smp
    from neo4j_graph_algorithms_spark.functions import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def stable(fn, frame, *parts):
        outs = []
        for p in parts:
            outs.append({tuple(r) for r in fn(frame.repartition(p)).collect()})
        assert outs[0] == outs[1], f"layout-dependent result from {fn}"
        return outs[0]

    stable(lambda d: sim.kmeans(d, k=5, iterations=2), emb, 2, 13)
    stable(lambda d: sim.semdedup(d, threshold=0.3, k=5), emb, 3, 11)
    stable(
        lambda d: textstats.dsir_log_weights(
            d, d.filter(F.col("lang") == "en"), n_buckets=128
        ),
        docs, 2, 9,
    )
    stable(lambda d: smp.weighted_sample(d, 20, "n_chars"), docs, 2, 7)
    stable(lambda d: textstats.cms_term_counts(d, width=128, min_estimate=50), docs, 2, 5)
    stable(
        lambda d: textstats.fm_distinct(
            textstats.term_rows(d).join(
                d.select(F.col("doc_id").cast("long").alias("doc_id"), "lang"), "doc_id"
            ),
            "lang", "term", replicas=8,
        ),
        docs, 2, 6,
    )


def test_dsir_subset_fast_path_equals_target_corpus(spark):
    """target_ids (subset fast path, one tokenize) == passing the
    subset as its own target corpus (two tokenizes)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sub = docs.filter(F.col("lang") == "de")
    slow = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in textstats.dsir_log_weights(docs, sub, n_buckets=256).collect()
    }
    fast = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in textstats.dsir_log_weights(
            docs, n_buckets=256, target_ids=sub.select("doc_id")
        ).collect()
    }
    assert fast == slow
    with pytest.raises(ValueError):
        textstats.dsir_log_weights(docs)  # neither target form
    with pytest.raises(ValueError):
        textstats.dsir_log_weights(docs, sub, target_ids=sub.select("doc_id"))
