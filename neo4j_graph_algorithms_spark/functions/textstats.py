"""Text analysis for a training-data pipeline: tokenization, quality
scoring, language-ID heuristic, document fingerprinting.

All JVM-side (``pyspark.sql.functions`` higher-order functions) — no
Python UDFs in the hot path, so the expressions stay inside whole-stage
codegen and scale linearly with input splits.  Shared definitions (kept
in sync with the DuckDB oracle SQL in ``driver_queries.py``):

- ``tokens(text)``: lowercase, split on ``[^a-z0-9]+``, drop empties.
- word 3-gram shingles over the token array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "and", "of", "to", "is", "in", "that", "it"]
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"]
FR_STOPWORDS = ["le", "la", "les", "et", "est", "dans", "que", "pour"]


def tokens(col: Column) -> Column:
    """Lowercase alnum tokens.  Shaped as regexp_replace + trim + split
    (plain codegen'd expressions) rather than split + a filter()
    higher-order lambda: HOF lambdas are CodegenFallback in Spark —
    interpreted per element — and tokenization is the hottest scalar
    path in the corpus pipeline (measured 5.8× faster this way)."""
    norm = F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: Column) -> Column:
    """Whitespace/punctuation token count, as long."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_piece_count(col: Column) -> Column:
    """BPE-flavored regex token count: words, digit runs, and isolated
    punctuation each count as one piece — a cheap `len(tokenize(text))`
    proxy when no tokenizer model is shippable."""
    pieces = F.filter(
        F.split(col, r"(?<=[a-zA-Z0-9])(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])(?=[a-zA-Z0-9])|\s+"),
        lambda x: F.trim(x) != F.lit(""),
    )
    return F.size(pieces).cast("long")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (space-joined); empty when < n tokens.

    Array-valued form (uses a transform() lambda — interpreted); for
    hot per-shingle paths prefer ``shingle_rows``, which builds the
    same shingles as exploded rows entirely inside codegen."""
    idx = F.sequence(F.lit(1), F.size(tok) - (n - 1))
    make = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok, (i + k).cast("int")) for k in range(n)]
        ),
    )
    return F.when(F.size(tok) >= n, make).otherwise(F.array().cast("array<string>"))


def shingle_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """``(id, pos, s)`` — one row per word n-gram shingle occurrence
    with its 0-based position (NOT deduplicated; add
    ``.dropDuplicates(["id", "s"])`` for set semantics).  Same shingle strings as ``shingles`` ∘ ``tokens``, but
    via slice + arrays_zip + explode + concat_ws — no higher-order
    lambdas, so the whole construction stays in whole-stage codegen
    (measured 5.8× over the transform() form on the documents table).
    Docs with fewer than ``n`` tokens produce no rows."""
    a = tokens(F.col(text_col))
    zipped = F.arrays_zip(
        *[F.slice(a, k + 1, F.size(a) - (n - 1)).alias(f"t{k}") for k in range(n)]
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.when(F.size(a) >= n, zipped)).alias("pos", "z"),
    ).select(
        "id",
        "pos",
        F.concat_ws(" ", *[f"z.t{k}" for k in range(n)]).alias("s"),
    )


def quality_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: char count, token count, mean token
    length, whitespace ratio, stopword ratio — the filter inputs of a
    C4/Gopher-style quality gate."""
    t = tokens(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("long")
    n_tokens = F.size(t).cast("long")
    token_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_spaces = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    ).cast("long")
    stop_hits = F.size(
        F.filter(t, lambda x: x.isin(EN_STOPWORDS))
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, F.round(token_chars / n_tokens, 6)).otherwise(0.0).alias("mean_token_len"),
        F.when(n_chars > 0, F.round(n_spaces / n_chars, 6)).otherwise(0.0).alias("space_ratio"),
        F.when(n_tokens > 0, F.round(stop_hits / n_tokens, 6)).otherwise(0.0).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID (en/de/fr/unknown) — the n-gram-free
    heuristic tier; deterministic CASE chain, identical to the oracle."""
    t = tokens(F.col(text_col))

    def hits(words):
        return F.size(F.filter(t, lambda x: x.isin(words))).cast("long")

    en, de, fr = hits(EN_STOPWORDS), hits(DE_STOPWORDS), hits(FR_STOPWORDS)
    lang = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )
    return df.select(
        F.col(id_col),
        en.alias("en_hits"),
        de.alias("de_hits"),
        fr.alias("fr_hits"),
        lang.alias("lang_pred"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: full-text sha256 prefix (exact identity) and
    min-shingle-hash (a 1-permutation minhash — shift-robust)."""
    t = tokens(F.col(text_col))
    sh = shingles(t, 3)
    return df.select(
        F.col(id_col),
        F.substring(F.sha2(F.col(text_col), 256), 1, 16).alias("content_fp"),
        F.array_min(F.transform(sh, F.md5)).alias("shingle_fp"),
    )


def term_rows(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, term)`` — one row per token occurrence.  The explode is
    corpus-sized but every consumer below immediately aggregates it with
    a map-side partial (``groupBy(term)`` / ``groupBy(doc, term)``), so
    the shuffle carries vocabulary-sized data, not corpus-sized."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """``(doc_id, term, tf, df, tfidf)`` — classic TF-IDF weights,
    ``tfidf = tf · ln(N / df)`` with N the corpus document count and
    ``df`` the number of distinct documents containing the term.

    100-TB shape: ONE corpus scan → codegen'd tokenize/explode →
    map-side-combined ``groupBy(doc, term)`` (the only corpus-sized
    shuffle, already collapsed to distinct (doc, term) pairs), and the
    ``tf`` result is lineage-cut so the vocabulary-sized ``df``
    aggregate and the final join both read it from (spillable
    serialized) cache instead of re-tokenizing the corpus.  No Python
    UDFs, no window functions, no global sort.

    ``broadcast_vocab``: the docfreq join side is vocabulary-sized —
    broadcast by default (vocab ≪ corpus).  Pass False for unbounded
    vocabularies (web-scale raw text, n-gram terms) to pin a spilling
    sort-merge instead; same contract as ``_probe_grams``'s
    ``broadcast_probes``.
    """
    from ..plans.checkpoint import truncate_lineage

    terms = term_rows(df, text_col, id_col)
    tf = truncate_lineage(
        terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.count()
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        docfreq = docfreq.filter(F.col("df") >= min_df)
    dfreq = F.broadcast(docfreq) if broadcast_vocab else docfreq.hint("MERGE")
    return (
        tf.join(dfreq, "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``(doc_id, score)`` — Okapi BM25 relevance of every document that
    contains at least one query term, using the Lucene idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` and
    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    100-TB shape: exactly TWO tokenizing corpus scans — one cheap
    global aggregate for (N, avgdl), one hit scan where the query-term
    filter is an ``isin`` on the exploded tokens (a literal in the
    codegen'd predicate — nothing survives except hits on the handful
    of query terms) with the doc length carried inline on each hit row
    (no third scan, no corpus-side join).  The only shuffles aggregate
    query-hit rows; per-term ``df``/idf is a broadcast-sized table
    (lineage-cut, so the hit scan runs once, not per consumer).
    """
    from ..plans.checkpoint import truncate_lineage

    qt = sorted(set(query_terms))
    docs = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens(F.col(text_col)).alias("t"),
    )
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t").cast("long")).alias("sum_dl"),
    ).first()
    n_docs = int(corpus["n_docs"])
    if n_docs == 0:  # avgdl undefined on an empty corpus
        return df.sparkSession.createDataFrame([], "doc_id long, score double")
    avgdl = float(corpus["sum_dl"]) / n_docs
    # hit rows carry dl (functionally dependent on doc_id) through the
    # aggregate — per_term needs no corpus-side join afterwards
    hits = truncate_lineage(
        docs.select(
            "doc_id", F.size("t").cast("long").alias("dl"), F.explode("t").alias("term")
        )
        .filter(F.col("term").isin(qt))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    per_term = hits.join(F.broadcast(docfreq), "term").select(
        "doc_id", (idf * (tf * F.lit(k1 + 1.0)) / denom).alias("part")
    )
    return per_term.groupBy("doc_id").agg(F.round(F.sum("part"), 6).alias("score"))


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """``(w1, w2, pair_count, pmi)`` — pointwise mutual information of
    adjacent token bigrams across the corpus (collocation / phrase
    mining, the `word2phrase` statistic):
    ``pmi = ln( (c_ab/B) / ((c_a/U)·(c_b/U)) )`` with B total bigram
    occurrences and U total token occurrences.

    100-TB shape: bigrams come from the same slice/arrays_zip
    construction as ``shingle_rows`` (whole-stage codegen, no lambda);
    both counting aggregates are map-side combined, so the exchanges
    carry vocab- and vocab²-sized data, and both results are
    lineage-cut — the totals reads and the final join reuse them
    instead of re-tokenizing the corpus (two tokenizing scans total).
    The unigram join sides are vocabulary-sized → broadcast by
    default; hub tokens are collapsed before any shuffle by the
    partial aggregate.  ``broadcast_vocab=False`` pins a spilling
    sort-merge for unbounded vocabularies (same contract as
    ``tfidf``).
    """
    from ..plans.checkpoint import truncate_lineage

    pairs = bigram_rows(df, text_col, id_col=None)
    uni = truncate_lineage(
        term_rows(df, text_col, id_col).groupBy("term").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    big = truncate_lineage(
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    )
    totals = uni.agg(F.sum("c").alias("u")).first()
    n_uni = int(totals["u"])
    n_big = big.agg(F.sum("pair_count").alias("b")).first()
    n_big = int(n_big["b"]) if n_big["b"] is not None else 0
    pmi = F.log(
        (F.col("pair_count").cast("double") / F.lit(float(n_big)))
        / (
            (F.col("c1").cast("double") / F.lit(float(n_uni)))
            * (F.col("c2").cast("double") / F.lit(float(n_uni)))
        )
    )
    u1 = uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    if broadcast_vocab:
        u1, u2 = F.broadcast(u1), F.broadcast(u2)
    else:
        u1, u2 = u1.hint("MERGE"), u2.hint("MERGE")
    return (
        big.filter(F.col("pair_count") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .select("w1", "w2", "pair_count", F.round(pmi, 6).alias("pmi"))
    )


def bigram_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
) -> DataFrame:
    """``(doc_id?, w1, w2)`` — one row per adjacent-token bigram
    occurrence (``id_col=None`` drops the id for corpus-global
    consumers).  Same slice + arrays_zip + explode construction as
    ``shingle_rows`` — whole-stage codegen, no higher-order lambdas.
    Docs with fewer than 2 tokens produce no rows."""
    t = tokens(F.col(text_col))
    zipped = F.when(
        F.size(t) >= 2,
        F.arrays_zip(
            F.slice(t, 1, F.size(t) - 1).alias("w1"),
            F.slice(t, 2, F.size(t) - 1).alias("w2"),
        ),
    )
    head = [F.col(id_col).alias("doc_id")] if id_col is not None else []
    out = df.select(*head, F.explode(zipped).alias("p"))
    return out.select(
        *(["doc_id"] if id_col is not None else []),
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
    )


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 1.0,
    train_df: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, n_bigrams, cross_entropy, perplexity)`` — per-document
    bigram language-model perplexity, the CCNet/Gopher-style fluency
    signal for corpus quality filtering: documents whose token stream
    is improbable under a corpus-trained n-gram LM (boilerplate, lists,
    garbled extraction) score high and get filtered.

    Model: add-k-smoothed bigram LM trained on ``train_df`` (defaults
    to the scored corpus itself — self-scoring, the usual first pass):
    ``p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)`` with V the training
    vocabulary size.  Per document, ``cross_entropy = -(1/n)·Σ ln p``
    over its n adjacent-token bigrams and ``perplexity = e^H``.
    Documents with fewer than 2 tokens have no bigrams and are absent
    from the result (their perplexity is undefined).  Ids pass through
    untouched (any orderable type).

    100-TB shape: the per-document bigram multiset is collapsed
    (``groupBy(doc, w1, w2)``) before any join, so the bigram-count
    join carries distinct-bigram rows, not token-stream rows; both
    count aggregates are map-side combined (hub bigrams collapse before
    the exchange); the unigram side is vocabulary-sized → broadcast.
    Two tokenizing scans of the scored corpus in self-scoring mode
    (bigram multiset + unigram counts — same budget as
    ``pmi_bigrams``); the multiset is lineage-cut there because the
    global bigram counts and the scored join both read it.
    """
    from ..plans.checkpoint import truncate_lineage

    doc_pairs = (
        bigram_rows(df, text_col, id_col)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    if train_df is None:
        # self-scoring: the collapsed multiset feeds BOTH the global
        # bigram counts and the scored join -> cut it once
        doc_pairs = truncate_lineage(doc_pairs)
        big = doc_pairs.groupBy("w1", "w2").agg(F.sum("m").alias("cb"))
        uni = truncate_lineage(
            term_rows(df, text_col, id_col)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        big = (
            bigram_rows(train_df, text_col, id_col=None)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("cb"))
        )
        uni = truncate_lineage(
            term_rows(train_df, text_col, id_col)
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    vocab = uni.count()
    # unseen bigram/unigram (only possible with a separate train_df)
    # backs off to the smoothing mass: c → 0
    logp = F.log(
        (F.coalesce(F.col("cb"), F.lit(0)).cast("double") + F.lit(float(add_k)))
        / (
            F.coalesce(F.col("c"), F.lit(0)).cast("double")
            + F.lit(float(add_k) * float(vocab))
        )
    )
    scored = (
        doc_pairs.join(big, ["w1", "w2"], "left")
        .join(F.broadcast(uni.withColumnRenamed("term", "w1")), "w1", "left")
        .select("doc_id", "m", logp.alias("logp"))
    )
    h = -F.sum(F.col("m") * F.col("logp")) / F.sum("m")
    return scored.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_bigrams"),
        F.round(h, 6).alias("cross_entropy"),
        F.round(F.exp(h), 6).alias("perplexity"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """``(doc_id, fp)`` — winnowing fingerprints (Schleimer/Wilkerson/
    Aiken, the MOSS algorithm): hash every word k-gram, slide a
    ``window``-wide window over the hash sequence, keep each window's
    minimum, emit the distinct minima.  Guarantees every match of
    length ≥ k + window - 1 shares a fingerprint while storing ~2/(w+1)
    of the hashes — the standard local document fingerprint.

    Hash = first 60 bits of md5 (exact BIGINT, engine-portable); the
    window minimum is a per-document window frame (partition by doc —
    no global sort)."""
    from pyspark.sql import Window as W

    sh = shingle_rows(df, text_col, id_col, k)
    h = F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long")
    w = (
        W.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    return (
        sh.select("id", "pos", h.alias("h"))
        .select(
            F.col("id").alias("doc_id"),
            F.min("h").over(w).alias("fp"),
            F.count(F.lit(1)).over(w).alias("wn"),
        )
        .filter(F.col("wn") == window)      # full windows only (spec)
        .dropDuplicates(["doc_id", "fp"])
        .select("doc_id", "fp")
    )



def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Per-document within-doc repetition signals (the Gopher/MassiveText
    repetition filters): for each n in ``ns``,

    - ``top{n}gram_frac`` — fraction of the document's n-gram
      occurrences taken by its single most frequent n-gram;
    - ``dup{n}gram_frac`` — fraction of n-gram occurrences whose n-gram
      appears more than once in the document.

    Boilerplate, keyword-stuffed, and template-generated pages score
    high and get filtered before training.  Documents with fewer than
    ``min(ns)`` tokens produce no row; an n with too few tokens yields
    NULL for that n's pair.

    100-TB shape: one corpus scan per n (the codegen'd ``shingle_rows``
    construction — a fused scan+explode+partial-aggregate, nothing
    corpus-sized shuffles: the exchanges carry per-doc distinct-gram
    counts, collapsed map-side).  The cross-n join is doc-count-sized.
    """
    if not ns:
        raise ValueError("ns must be non-empty")
    out: DataFrame | None = None
    for n in sorted(ns):
        per = (
            shingle_rows(df, text_col, id_col, n)
            .groupBy("id", "s")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        tot = F.sum("c").cast("double")
        agg = per.groupBy("id").agg(
            F.round(F.max("c") / tot, 6).alias(f"top{n}gram_frac"),
            F.round(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))) / tot,
                6,
            ).alias(f"dup{n}gram_frac"),
        )
        out = agg if out is None else out.join(agg, "id", "left")
    assert out is not None
    return out.withColumnRenamed("id", "doc_id")


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """``(metric, n, mean, p50, p90, p99)`` — corpus-level distribution
    profile of the per-document quality metrics (``quality_stats``):
    the dataset-card statistics a training-data pipeline publishes and
    the inputs for choosing filter thresholds.

    ``approx=False`` uses exact ``percentile`` — collection-based, for
    validation / small-to-medium corpora and the DuckDB oracle.
    **The 100-TB path is ``approx=True``** (``percentile_approx``,
    a fixed-size sketch with bounded rank error, mergeable map-side),
    because exact percentiles hold per-metric value multisets in
    aggregation memory.  Everything else is one pass over the
    doc-count-sized metrics frame either way (single consumer — no
    lineage cut, the one agg reads the scan directly).
    """
    metrics = ["n_chars", "n_tokens", "mean_token_len", "space_ratio", "stopword_ratio"]
    stats = quality_stats(df, text_col, id_col).select(
        *[F.col(m).cast("double").alias(m) for m in metrics]
    )
    aggs = []
    for m in metrics:
        c = F.col(m)
        aggs.append(F.count(c).alias(f"{m}__n"))
        aggs.append(F.round(F.avg(c), 6).alias(f"{m}__mean"))
        if approx:
            pf = F.percentile_approx(c, list(qs), 10_000)
        else:
            pf = F.percentile(c, F.array(*[F.lit(q) for q in qs]))
        aggs.append(pf.alias(f"{m}__q"))
    row = stats.agg(*aggs)
    structs = []
    for m in metrics:
        fields = [
            F.lit(m).alias("metric"),
            F.col(f"{m}__n").cast("long").alias("n"),
            F.col(f"{m}__mean").alias("mean"),
        ]
        for i, q in enumerate(qs):
            fields.append(
                F.round(F.col(f"{m}__q")[i], 6).alias(f"p{int(round(q * 100))}")
            )
        structs.append(F.struct(*fields))
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def _dsir_feature_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    salt: str,
) -> DataFrame:
    """``(doc_id, b)`` — one row per hashed-n-gram feature occurrence:
    unigrams plus adjacent bigrams, md5-bucketed into ``n_buckets``
    (the DSIR paper's hashed n-gram feature map)."""
    from .sampling import hash_bucket

    uni = term_rows(df, text_col, id_col).select("doc_id", F.col("term").alias("f"))
    # term_rows casts doc_id to long; mirror it here so both union
    # branches have an identical schema for ANY source id type — a
    # string id would otherwise coerce the unioned column and silently
    # miss the cast-to-long target_ids semi-join fast path (ADVICE r3)
    bi = bigram_rows(df, text_col, id_col).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat_ws(" ", "w1", "w2").alias("f"),
    )
    return uni.unionByName(bi).select(
        "doc_id", hash_bucket(F.col("f"), salt, n_buckets).alias("b")
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    add_k: float = 1.0,
    salt: str = "dsir",
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, n_features, log_weight)`` — DSIR importance weights
    (Xie et al., NeurIPS'23 "Data Selection for Language Models via
    Importance Resampling"): score every raw document by how much more
    likely its hashed-n-gram features are under a *target* corpus (the
    high-quality / in-domain sample you want more of) than under the
    raw corpus itself,

        log w(doc) = Σ_features  c_doc[b] · ( ln p_target[b] − ln p_raw[b] )

    with add-k smoothed bucket probabilities
    ``p[b] = (c[b] + k) / (total + k·B)`` over ``B = n_buckets`` hashed
    unigram+bigram buckets.  Resample the corpus ∝ exp(log w) (or take
    the deterministic top-N — ``dsir_resample``) to shift the raw
    distribution toward the target.

    100-TB shape: both bucket-count tables are B-sized (B ≪ corpus) —
    the raw counts fold out of the per-doc feature aggregate
    (map-side combined, shuffle carries ≤ docs·B rows, not token
    rows), the target counts are one aggregate over the (much smaller)
    target sample, and the scoring join broadcasts the B-row weight
    table.  One tokenizing scan of each corpus; per-doc double sums
    rounded to 6 dp (the repo-wide oracle-stability convention).
    """
    from ..plans.checkpoint import truncate_lineage

    if (target is None) == (target_ids is None):
        raise ValueError(
            "dsir_log_weights: pass exactly one of target (a separate "
            "corpus with its own text) or target_ids (ids of the raw "
            "corpus's own rows — the subset fast path)"
        )
    doc_b = truncate_lineage(
        _dsir_feature_buckets(df, text_col, id_col, n_buckets, salt)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    raw = doc_b.groupBy("b").agg(F.sum("m").cast("long").alias("cr"))
    if target_ids is not None:
        # target ⊆ raw corpus: fold the target bucket counts out of the
        # already-cut per-doc aggregate instead of tokenizing the
        # corpus a second time — at 100 TB this halves the scan cost,
        # and the target-id set is doc-count-sized (broadcastable)
        ids = target_ids.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
        targ = (
            doc_b.join(F.broadcast(ids), "doc_id", "left_semi")
            .groupBy("b")
            .agg(F.sum("m").cast("long").alias("ct"))
        )
    else:
        targ = (
            _dsir_feature_buckets(target, text_col, id_col, n_buckets, salt)
            .groupBy("b")
            .agg(F.count(F.lit(1)).cast("long").alias("ct"))
        )
    total_raw = int(doc_b.agg(F.sum("m")).first()[0] or 0)
    total_t = int(targ.agg(F.sum("ct")).first()[0] or 0)
    kb = float(add_k) * float(n_buckets)
    w = F.log(
        (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(float(add_k)))
        / F.lit(total_t + kb)
    ) - F.log(
        (F.col("cr").cast("double") + F.lit(float(add_k))) / F.lit(total_raw + kb)
    )
    weights = raw.join(targ, "b", "left").select("b", w.alias("w"))
    return (
        doc_b.join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_features"),
            F.round(F.sum(F.col("m") * F.col("w")), 6).alias("log_weight"),
        )
    )


def dsir_resample(
    df: DataFrame,
    target: DataFrame | None,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    add_k: float = 1.0,
    salt: str = "dsir",
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, log_weight, score)`` — the top-``n`` documents under
    Gumbel-top-k resampling of the DSIR weights: sampling n docs
    without replacement ∝ exp(log w) is equivalent to taking the top n
    by ``log w + Gumbel noise`` (the Gumbel-max trick).  The noise is
    derandomized the repo's way — ``u = (bucket(doc_id)+0.5)/10^6`` from
    the md5 bucket, ``g = −ln(−ln u)`` — so the sample is replayable
    and retry/growth-stable like every other sampler in this package."""
    from .sampling import hash_bucket

    lw = dsir_log_weights(
        df, target, text_col, id_col, n_buckets, add_k, salt, target_ids
    )
    u = (
        hash_bucket(F.col("doc_id"), f"{salt}-gumbel").cast("double") + F.lit(0.5)
    ) / F.lit(1e6)
    score = F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    return (
        lw.select("doc_id", "log_weight", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(n))
    )


def cms_bucket(term: Column, row: int, width: int) -> Column:
    """Counter index of ``term`` in sketch row ``row`` — first 60 bits
    of ``md5('<row>:<term>')`` mod ``width`` (the repo's engine-portable
    hash convention, replayed verbatim by the DuckDB oracles)."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(row)), term)), 1, 15), 16, 10
    ).cast("long")
    return h % F.lit(width)


def cms_term_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    depth: int = 4,
    width: int = 1024,
    min_estimate: int = 100,
) -> DataFrame:
    """``(term, est_count)`` — heavy-hitter terms by a count-min sketch
    (Cormode & Muthukrishnan 2005): ``depth`` hash rows × ``width``
    counters, estimate = min over rows of the term's counter, keep
    terms with estimate ≥ ``min_estimate``.  One-sided error: the
    estimate never undercounts, overcounts by ≤ εN with probability
    1−δ (ε = e/width, δ = e^-depth) — so the filter has perfect recall
    of true heavy hitters.

    Why a sketch when ``groupBy(term).count()`` is exact: the CMS is
    the *mergeable, bounded-memory* form — depth·width longs regardless
    of corpus or vocabulary size, so per-partition partial sketches
    combine map-side and the driver/broadcast cost is a constant, the
    property that matters when the vocabulary itself is corpus-scale
    (URLs, n-grams, ids).  Hashes are md5-derived (``md5('<row>:<term>')``
    mod width) — deterministic, so the DuckDB oracle replays the
    sketch and the *approximate* counts are exact, replayable integers.

    Plan: one tokenizing scan; the depth bucket-count aggregates are
    map-side combined unions (sketch-sized shuffle); the probe joins
    the vocabulary against the broadcast depth·width sketch and takes
    an all-integer min.
    """
    from ..plans.checkpoint import truncate_lineage

    # referenced depth+1 times (one per sketch row + the probe side) —
    # cut once so the tokenizing scan runs once
    rows = truncate_lineage(term_rows(df, text_col, id_col).select("term"))

    def bucket(j: int) -> Column:
        return cms_bucket(F.col("term"), j, width)

    sketch = None
    for j in range(depth):
        part = (
            rows.groupBy(bucket(j).alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(j).alias("j"), "b", "c")
        )
        sketch = part if sketch is None else sketch.unionByName(part)

    probes = rows.distinct().select(
        "term",
        F.explode(
            F.array(*[F.struct(F.lit(j).alias("j"), bucket(j).alias("b")) for j in range(depth)])
        ).alias("p"),
    ).select("term", F.col("p.j").alias("j"), F.col("p.b").alias("b"))
    return (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("term")
        .agg(F.min("c").cast("long").alias("est_count"))
        .filter(F.col("est_count") >= int(min_estimate))
    )


def fm_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    replicas: int = 16,
    seed: int = 0,
) -> DataFrame:
    """``(group, est_distinct)`` — distinct-value estimate per group by
    Flajolet–Martin sketches: ``replicas`` 64-bit masks per group, the
    (replica, value) bit is the trailing-zero count of an md5-derived
    integer, estimate = 2^(mean over replicas of lowest-unset-bit) / φ
    (φ = 0.77351).  The same sketch family the ANF operator uses for
    reachable-set sizes (``operators/anf.py``), applied to plain
    relational distinct counting.

    Why a sketch when ``count(DISTINCT)`` is exact: the masks are
    mergeable fixed-size state — ``replicas`` longs per group however
    many values stream past — so the aggregate is one map-side-combined
    ``bit_or`` with no per-group distinct-set shuffle; at corpus-scale
    cardinalities (URLs, n-grams per shard) the exact distinct is the
    thing that doesn't fit.  md5-derived bits → deterministic, so the
    DuckDB oracle replays the masks and the *approximate* estimates
    hash-match exactly (stddev ≈ 0.78/√replicas relative, per the FM
    analysis).

    Pure transform — works verbatim on a STREAMING DataFrame
    (complete/update mode): the bit_or aggregation state is the
    bounded mask table, and because sketches are mergeable the running
    estimates equal the batch estimates over the union of all
    micro-batches (pytest ``test_streaming_fm_distinct_equals_batch``).
    """
    k = int(replicas)
    pos_cols = []
    g = F.col(group_col).alias("g")
    masks = []
    for r in range(k):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(f"{seed}:{r}"), F.col(value_col))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        pos = F.least(F.bit_count((h.bitwiseAND(-h)) - 1), F.lit(62)).cast("int")
        # 1 << pos with a column shift amount: pow(2.0, pos) is exact
        # for pos <= 62 (powers of two are exact doubles) — the same
        # construction as operators/anf.py::_init_mask
        masks.append(F.pow(F.lit(2.0), pos).cast("long").alias(f"m{r}"))
    rows = df.select(g, *masks)
    agg = rows.groupBy("g").agg(*[F.bit_or(f"m{r}").alias(f"m{r}") for r in range(k)])
    # lowest UNSET bit position of each mask = bit_count((~m & -~m) - 1)
    for r in range(k):
        nm = F.bitwise_not(F.col(f"m{r}"))
        pos_cols.append(F.bit_count((nm.bitwiseAND(-nm)) - 1).cast("double"))
    mean_b = sum(pos_cols) / F.lit(float(k))
    return agg.select(
        F.col("g").alias(group_col),
        F.round(F.pow(F.lit(2.0), mean_b) / F.lit(0.77351), 6).alias("est_distinct"),
    )
