"""Deduplication operators for web/corpus-scale pipelines.

Tiers (cheap → robust), all shuffle-aware:

- exact: hash-groupBy on md5(text) — one shuffle on the 128-bit key.
- minhash + LSH: shingle → k double-hashed minhash values (one md5 per
  shingle, Kirsch–Mitzenmacher) → band hashes → bucket self-join.
  Candidate generation never compares all pairs: the self-join runs per
  band bucket, so cost follows collision counts.
- simhash: 64-bit sign-aggregated token hashes; near-dups share most
  bits — grouped by rotated prefixes for candidate buckets.
- n-gram Jaccard: exact verification on candidate pairs (or rare-shingle
  candidates), computed as a shingle equi-join + group count.
- embedding near-dup: cosine >= threshold via `similarity.py`.
- decontamination: corpus n-grams vs a broadcast probe (benchmark)
  gram set — per-doc overlap report + removable spans.

Hashing is md5-based and deterministic — no Python RNG, no seed
dependence — so results reproduce across runs/engines and the DuckDB
oracle can mirror every step symbolically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.checkpoint import truncate_lineage
from .textstats import shingle_rows, tokens


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``(text_hash, dup_count, keep_id)`` — groups of byte-identical
    texts; ``keep_id`` = min id (the canonical survivor)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
    )


def _spill_pin(df: DataFrame, pin: bool) -> DataFrame:
    """MERGE-pin a join side that scales with the corpus (keep-lists,
    band lists, candidate pairs, the shingle table itself): the
    planner's post-agg/post-checkpoint size estimates can be
    arbitrarily wrong, and a mispicked broadcast OOMs the driver while
    a shuffled-hash build of a corpus-sized side exceeds task memory —
    sort-merge sorts-and-spills, the only shape that degrades
    gracefully at 100 TB.  ``pin=False`` (the
    ``pin_spilling_joins=False`` escape hatch, same contract as
    textstats' ``broadcast_vocab``) restores full planner freedom for
    small corpora where a broadcast genuinely fits."""
    return df.hint("MERGE") if pin else df


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pin_spilling_joins: bool = True,
) -> DataFrame:
    """Rows surviving exact dedup (min-id per text hash)."""
    keep = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    # the keep-list is ~|distinct texts| — nearly the whole corpus at
    # scale (see _spill_pin)
    return df.join(_spill_pin(keep, pin_spilling_joins), id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_size: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(id, sig array<long>)`` — sig[2j+k] = min over shingles of the
    k-th 60-bit half of ``md5(j ':' shingle)``: ⌈num_hashes/2⌉ salted
    digests per shingle, each split into two independent 60-bit BIGINT
    hashes.  (A cheaper Kirsch–Mitzenmacher ``h1 + i·h2`` family was
    measured to collapse LSH precision 44×: under the *min* the same
    lower-hull shingle attains the minimum for every i, so whole bands
    collide for unrelated docs — salted digests keep the per-row hashes
    min-wise independent.)

    Deterministic, engine-portable (the DuckDB oracle mirrors the exact
    BIGINT arithmetic), and — unlike a per-salt md5 fold inside a
    higher-order ``aggregate`` lambda, which Spark evaluates
    *interpreted*, off the whole-stage-codegen path — shaped as explode
    → codegen'd projection → map-side-combined ``groupBy(id).agg(min×k)``.
    One shuffle of (id, k longs) per doc after partial aggregation: at
    100 TB the exchange is k·8 bytes per document, not per shingle.

    Docs with no shingles (< ``shingle_size`` tokens) produce no row."""
    if num_partitions:
        df = df.repartition(num_partitions, id_col)
    # no per-doc shingle dedup: min() is idempotent, so duplicate
    # shingle occurrences cannot change any signature value
    sh = shingle_rows(df, text_col, id_col, shingle_size)
    hash_cols = []
    for i in range(num_hashes):
        j, half = divmod(i, 2)
        md = F.md5(F.concat(F.lit(f"{j}:"), F.col("s")))
        hash_cols.append(
            F.conv(F.substring(md, 1 + 16 * half, 15), 16, 10)
            .cast("long")
            .alias(f"h{i}")
        )
    hashed = sh.select("id", *hash_cols)
    aggs = [F.min(F.col(f"h{i}")).alias(f"m{i}") for i in range(num_hashes)]
    return (
        hashed.groupBy("id")
        .agg(*aggs)
        .select(
            "id",
            F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    num_partitions: int | None = None,
    max_band_df: int | None = None,
    pin_spilling_joins: bool = True,
) -> DataFrame:
    """``(id_a, id_b)`` candidate near-duplicate pairs (id_a < id_b):
    docs sharing at least one LSH band.  bands × rows = num_hashes.
    Docs with no shingles (under ``shingle_size`` tokens) are excluded —
    an empty set has no minhash.

    ``max_band_df`` is the hub guard (same contract as
    ``simhash_near_pairs``): band values shared by more than that many
    docs are dropped from candidate generation before the self-join —
    a flood of identical/near-identical texts otherwise makes one
    bucket quadratic (10^3 identical docs → 10^6 pairs from one band).
    The documented trade: pairs only reachable through a dropped
    mega-bucket are missed — exact duplicates, which belong to
    ``dedup_exact`` upstream, not to LSH."""
    rows = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, num_partitions
    )
    band_cols = []
    for b in range(bands):
        band_cols.append(
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col("sig")[b * rows + r].cast("string")
                        for r in range(rows)
                    ],
                )
            ).alias("band_hash")
        )
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_cols[b])
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))
    if max_band_df is not None:
        # the keep-list is the UNDER-guard buckets — at corpus scale
        # that is nearly every bucket (~|docs|·bands rows); see
        # _spill_pin for why it defaults to a MERGE pin
        small = (
            banded.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_band_df)
            .select("band", "band_hash")
        )
        banded = banded.join(
            _spill_pin(small, pin_spilling_joins),
            ["band", "band_hash"],
            "left_semi",
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 10,
    pin_spilling_joins: bool = True,
) -> DataFrame:
    """``(id_a, id_b, jaccard)`` over word-n-gram shingle sets.

    Candidates come from an equi-join on shingles; ``max_shingle_df``
    drops shingles appearing in more than that many docs from candidate
    generation (stop-shingle pruning — the scale guard; exact Jaccard is
    still computed on the *full* sets of surviving pairs)."""
    sh = shingle_rows(df, text_col, id_col, shingle_size).dropDuplicates(
        ["id", "s"]
    ).persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    cand_sh = sh
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("s")
        )
        # the rare-shingle keep-list is ~|distinct shingles| (most
        # shingles are rare) — see _spill_pin
        cand_sh = sh.join(_spill_pin(rare, pin_spilling_joins), "s", "left_semi")
    pairs = (
        cand_sh.alias("a")
        .join(cand_sh.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # both sides unbounded: |pairs| grows with the corpus and the
    # b-side is the FULL corpus shingle table (observed: the planner
    # broadcast all ~38M shingle rows at a 1M-doc run) — see _spill_pin
    inter = (
        sh.alias("a")
        .join(_spill_pin(pairs, pin_spilling_joins), F.col("a.id") == F.col("id_a"))
        .join(
            _spill_pin(sh.alias("b"), pin_spilling_joins),
            (F.col("b.id") == F.col("id_b")) & (F.col("a.s") == F.col("b.s")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # sizes is one row per document — corpus-sized (see _spill_pin)
    out = (
        inter.join(
            _spill_pin(
                sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")),
                pin_spilling_joins,
            ),
            "id_a",
        )
        .join(
            _spill_pin(
                sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")),
                pin_spilling_joins,
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # materialize the (small, thresholded) pair set before releasing the
    # shingle cache — same caller-owned-persist discipline as
    # operators/triangles.py: consuming the result never recomputes the
    # shingle explode, and the cache does not leak past this call.
    out = truncate_lineage(out)
    sh.unpersist()
    return out


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_band_df: int | None = None,
) -> DataFrame:
    """``(id_a, id_b, hamming)`` — document pairs whose 60-bit simhash
    fingerprints differ in at most ``max_hamming`` bits.

    Candidate generation is the pigeonhole band join: the 60 bits are
    split into ``max_hamming + 1`` contiguous bands, and any pair within
    Hamming distance ``max_hamming`` MUST agree exactly on at least one
    band — so the banded equi-join has **100% recall by construction**
    (no probabilistic miss like MinHash-LSH); the exact
    ``bit_count(a XOR b)`` filter then removes false candidates.

    Scale shape: one simhash pass (map-side-combined, see
    :func:`simhash`), explode to ``max_hamming + 1`` band rows per doc,
    equi-join on (band index, band value) — never all-pairs.
    ``max_band_df`` optionally drops band values shared by more than
    that many docs from candidate generation (a hub guard: mega-cluster
    band collisions are near-identical docs that exact dedup already
    groups); setting it trades the recall guarantee for a bounded join,
    exactly like ``ngram_jaccard_pairs``'s ``max_shingle_df``.  Empty
    documents all hash to 0 — drop them upstream or they form one
    all-pairs cluster."""
    b = int(max_hamming) + 1
    width = 60 // b
    widths = [width + (1 if i < 60 % b else 0) for i in range(b)]
    offsets = [sum(widths[:i]) for i in range(b)]
    sh = truncate_lineage(simhash(df, text_col, id_col))
    bands = sh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("val"),
                    )
                    for i in range(b)
                ]
            )
        ).alias("bv"),
    ).select("id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    if max_band_df is not None:
        keep = (
            bands.groupBy("band", "val")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_band_df)
            .select("band", "val")
        )
        bands = bands.join(keep.hint("SHUFFLE_HASH"), ["band", "val"], "left_semi")
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    out = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("simhash").alias("ha")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("simhash").alias("hb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    out = truncate_lineage(out)  # eager: owns its data now
    from ..plans.checkpoint import SuperstepCache

    c = SuperstepCache(df.sparkSession)
    c.track(sh)
    c.release()  # retire the fingerprint checkpoint
    return out


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal cross-document repeated token spans — the exact-substring
    dedup building block (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better": repeated spans are memorization /
    boilerplate hot-spots that near-dup doc-level methods miss).

    A token position is *hot* when the word ``n``-gram starting there
    occurs in at least ``min_docs`` distinct documents; maximal runs of
    consecutive hot positions are merged into one span.  Returns
    ``(doc_id, start, end, n_tokens)`` — 0-based inclusive token
    offsets of each span (length ``end - start + 1 >= n``).

    Scale shape: one map-side-combined ``groupBy(gram)`` for the
    cross-document frequency (hub grams — boilerplate in millions of
    docs — collapse before the exchange), a semi join to keep hot
    occurrences, then a classic gaps-and-islands merge under a
    per-document window — partitioned by ``doc_id``, so no global
    sort; a single document's positions sort within one task (docs are
    bounded; the corpus is not)."""
    from pyspark.sql import Window

    sh = shingle_rows(df, text_col, id_col, n)
    hot = (
        sh.dropDuplicates(["id", "s"])
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("s")
    )
    hits = sh.join(hot.hint("SHUFFLE_HASH"), "s", "left_semi")
    return _hit_spans(hits, n)


def _hit_spans(hits: DataFrame, n: int) -> DataFrame:
    """Merge ``(id, pos)`` hit positions into maximal spans —
    gaps-and-islands under a per-document window (partitioned by doc
    id, so no global sort; one document's positions sort within one
    task).  Returns ``(doc_id, start, end, n_tokens)`` with ``end``
    covering the last token of the ``n``-gram starting at ``max(pos)``."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    islands = hits.withColumn(
        "grp", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy(F.col("id").alias("doc_id"), "grp")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("end"),
        )
        .select(
            "doc_id",
            F.col("start").cast("long").alias("start"),
            "end",
            (F.col("end") - F.col("start") + 1).alias("n_tokens"),
        )
    )


def _probe_grams(
    probes: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    broadcast_probes: bool,
    with_ids: bool = True,
) -> DataFrame:
    """``(probe_id, s)`` (or just ``(s)``) — distinct word ``n``-grams
    of the probe set, broadcast when requested (the scale default: a
    benchmark suite is ~10^6-10^7 grams against a 100-TB corpus).  The
    broadcast hint is applied last so it sits directly under the join."""
    pg = shingle_rows(probes, text_col, id_col, n)
    if with_ids:
        pg = pg.select(F.col("id").alias("probe_id"), "s").dropDuplicates(
            ["probe_id", "s"]
        )
    else:
        pg = pg.select("s").dropDuplicates(["s"])
    # the opt-out path is for probe sets too large to broadcast — pin
    # a spilling sort-merge so the planner cannot re-pick a broadcast
    return F.broadcast(pg) if broadcast_probes else pg.hint("MERGE")


def contamination_report(
    df: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
    probe_id_col: str = "doc_id",
    n: int = 13,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Benchmark-decontamination report: per-document overlap with a
    probe set (an eval benchmark) measured as shared word ``n``-grams —
    the GPT-3 appendix-C / PaLM decontamination rule (n=13 there; pass
    ``n=`` for the corpus's tokenization granularity).

    Returns one row per *contaminated* document:
    ``(doc_id, contaminated_grams, total_grams, contaminated_frac,
    probes_hit)`` where ``contaminated_grams`` counts distinct token
    positions whose ``n``-gram also occurs in any probe,
    ``total_grams = max(len(tokens) - n + 1, 0)``, and ``probes_hit``
    counts distinct probe documents matched.  Filter on
    ``contaminated_frac`` (or drop any hit) upstream of training.

    Scale shape: the probe gram set is broadcast
    (``broadcast_probes=True``, the default), so the corpus side is a
    map-side broadcast-hash join over the shingle stream — the 100-TB
    side is scanned once and never shuffled; the only exchange is the
    per-document aggregate over *hits* (rare by construction).  Set
    ``broadcast_probes=False`` for probe sets too large to broadcast
    (falls back to a shuffled equi-join on the gram)."""
    pg = _probe_grams(probes, probe_text_col, probe_id_col, n, broadcast_probes)
    sh = shingle_rows(df, text_col, id_col, n)
    hits = sh.join(pg, "s").groupBy("id").agg(
        F.count_distinct("pos").alias("contaminated_grams"),
        F.count_distinct("probe_id").alias("probes_hit"),
    )
    totals = df.select(
        F.col(id_col).alias("id"),
        F.greatest(
            F.size(tokens(F.col(text_col))) - F.lit(n - 1), F.lit(0)
        ).cast("long").alias("total_grams"),
    )
    return (
        hits.join(totals, "id")
        .select(
            F.col("id").alias("doc_id"),
            "contaminated_grams",
            "total_grams",
            (F.col("contaminated_grams") / F.col("total_grams")).alias(
                "contaminated_frac"
            ),
            "probes_hit",
        )
    )


def contamination_spans(
    df: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str = "text",
    probe_id_col: str = "doc_id",
    n: int = 13,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Maximal contaminated token spans per document — the surgical
    alternative to dropping a contaminated document whole: remove (or
    mask) just the span that overlaps the benchmark, as in Lee et
    al. 2021's exact-substring treatment.

    A position is contaminated when its word ``n``-gram occurs in any
    probe document; consecutive contaminated positions merge into one
    span.  Returns ``(doc_id, start, end, n_tokens)`` — 0-based
    inclusive token offsets, ``end - start + 1 >= n``.

    Same broadcast-probe scale shape as ``contamination_report``; the
    span merge runs under a per-document window over hits only."""
    pg = _probe_grams(
        probes, probe_text_col, probe_id_col, n, broadcast_probes, with_ids=False
    )
    sh = shingle_rows(df, text_col, id_col, n)
    hits = sh.join(pg, "s", "left_semi")
    return _hit_spans(hits, n)


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    two_phase: bool = False,
    local_finish_edges: int = 200_000,
) -> DataFrame:
    """Near-duplicate clustering: connected components over a pair
    table — the step every production dedup pipeline runs after
    candidate verification (C4 / RefinedWeb / Lee et al. keep one
    document per *transitive* duplicate group, because near-dup is not
    transitive: A~B and B~C does not imply A~C, yet all three must
    resolve to one survivor).

    ``pairs`` is any verified near-dup pair stream — the output of
    ``simhash_near_pairs``, ``ngram_jaccard_pairs`` (filtered to the
    accept threshold), ``minhash_lsh_candidates``, or the embedding
    near-dup join.  Returns one row per document that appears in at
    least one pair: ``(doc_id, cluster_id, keep)`` where ``cluster_id``
    is the minimum doc id of the transitive group (deterministic, no
    RNG) and ``keep`` marks the canonical survivor.  Documents in no
    pair are untouched by definition — filter with an anti-join on
    ``keep = false`` upstream of training.

    Scale shape: this is exactly the engine's WCC over an edge
    DataFrame — min-label frontier propagation (O(diameter) supersteps;
    duplicate clusters are shallow, so 2-4 in practice) or, for
    adversarial chain topologies, ``two_phase=True`` star contraction
    at O(log n) rounds.  Either way the pair table shuffles on the hash
    of the doc id per superstep and nothing corpus-sized is collected.

    ``local_finish_edges``: the verified pair table is orders of
    magnitude smaller than the corpus (it lists near-DUPLICATES, not
    documents); when it fits under this many pairs, wcc's in-process
    union-find endgame replaces the superstep loop — identical
    clusters, no per-superstep scheduling floor.  The endgame
    collect()s the pair rows to the driver, so the default (200k
    pairs, a few tens of MB of driver heap) is deliberately
    conservative; raise it only with driver memory to spare, or set 0
    to force the fully distributed loop for any size."""
    from ..graph import Graph
    from ..operators.wcc import wcc, wcc_two_phase

    # lineage cut: the pair table is usually the head of an expensive
    # verification pipeline (simhash bands + hamming filter, LSH +
    # jaccard joins); wcc's load reads its edge input several times
    # (symmetrize union, vertex derivation, state init), which would
    # re-run that whole pipeline per read — materialize once.
    edges = truncate_lineage(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    )
    numeric = isinstance(
        edges.schema["src"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    mapping = None
    if not numeric:
        # non-numeric doc ids: dense-remap through the engine's IdMap
        # (zipWithIndex — no global sort), run WCC on longs, map back.
        # cluster_id stays "min ORIGINAL id of the group" via one
        # post-WCC min-aggregate, since the dense order is arbitrary.
        ids = (
            edges.select(F.col("src").alias("orig"))
            .union(edges.select(F.col("dst").alias("orig")))
            .distinct()
        )
        # explicit schema: empty pair tables must not trip inference
        map_schema = T.StructType(
            [
                T.StructField("orig", edges.schema["src"].dataType),
                T.StructField("nid", T.LongType()),
            ]
        )
        mapping = truncate_lineage(
            edges.sparkSession.createDataFrame(
                ids.rdd.map(lambda r: r[0]).zipWithIndex(), map_schema
            )
        )
        edges = (
            edges.join(mapping.withColumnRenamed("orig", "src"), "src")
            .select(F.col("nid").alias("src"), "dst")
            .join(mapping.withColumnRenamed("orig", "dst"), "dst")
            .select("src", F.col("nid").alias("dst"))
        )
    g = Graph.from_edges(edges)
    res = (
        wcc_two_phase(g)
        if two_phase
        else wcc(g, local_finish_edges=local_finish_edges)
    )
    comp = res.components
    if mapping is None:
        return comp.select(
            F.col("id").alias("doc_id"),
            F.col("set_id").alias("cluster_id"),
            (F.col("id") == F.col("set_id")).alias("keep"),
        )
    labeled = comp.join(
        mapping.select(F.col("nid").alias("id"), F.col("orig").alias("doc_id")),
        "id",
    )
    canon = labeled.groupBy("set_id").agg(F.min("doc_id").alias("cluster_id"))
    return (
        labeled.join(canon, "set_id")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """``(id, simhash long)`` — sign-aggregate of 64-bit token hashes.

    Token hash = first 15 hex chars of md5 (60 bits, parsed JVM-side via
    ``conv``); bit b of the simhash is 1 iff Σ_tokens (±1 for bit b) > 0.
    Near-duplicate docs differ in few bits (compare via Hamming
    distance / ``bit_count(a ^ b)``).

    Shape: explode tokens → one 60-way conditional-sum groupBy — a
    single shuffle on the doc id with map-side partial aggregation, so
    hub documents (many tokens) combine before the exchange."""
    nbits = min(bits, 60)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select(
        "id", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(nbits)
    ]
    votes = tok.groupBy("id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(nbits):
        sim = sim + F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    hashed = votes.select("id", sim.alias("simhash"))
    # docs with zero tokens keep simhash 0
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hashed, "id", "left")
        .select("id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )
