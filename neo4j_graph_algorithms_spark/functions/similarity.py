"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force exact top-k for a (small) query set —
  broadcast the queries, one pass over the corpus, per-query top-k via
  ``Window`` row_number.  The correctness baseline.
- ``lsh_buckets`` / ``lsh_topk``: random-hyperplane LSH — deterministic
  hyperplanes derived from md5 (engine-portable, no RNG state), so the
  scale path prunes the corpus to matching buckets before scoring.
  At 100 TB this turns an O(N·Q) scan into O(Q · bucket) with recall
  controlled by (num_planes, num_tables).

All vector math is JVM-side: ``zip_with`` + ``aggregate`` stay inside
whole-stage codegen — no Python per row.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.checkpoint import truncate_lineage


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns (0 when either is
    a zero vector)."""
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """``(query_id, vec_id, sim, rank)`` — exact top-k neighbors per
    query (self-matches excluded).  Queries are broadcast; ranking uses
    (sim desc, vec_id asc) so ties are deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    sim = cosine(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplane(dim: int, plane: int, table: int) -> list:
    """Deterministic pseudorandom unit-free hyperplane from md5 bytes."""
    out = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(f"lsh:{table}:{plane}:{i}".encode()).digest()
        for by in h:
            if len(out) >= dim:
                break
            out.append((by - 127.5) / 127.5)
        i += 1
    return out


def lsh_buckets(
    df: DataFrame,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """``(vec_id, table, bucket)`` — sign-pattern bucket per table."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    v = _as_double(F.col(vec_col))
    rows = []
    for t in range(num_tables):
        bucket = F.lit(0).cast("long")
        for p in range(num_planes):
            plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, t)])
            bit = F.when(_dot(v, plane) > 0, F.lit(2**p)).otherwise(F.lit(0))
            bucket = bucket + bit
        rows.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return df.select(
        F.col(id_col).alias("vec_id"), F.explode(F.array(*rows)).alias("tb")
    ).select("vec_id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH
    bucket with the query in any table."""
    dim = len(corpus.select(vec_col).first()[0])
    cb = lsh_buckets(corpus, num_planes, num_tables, id_col, vec_col, dim)
    qb = lsh_buckets(queries, num_planes, num_tables, id_col, vec_col, dim).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    cand = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        cand.join(c, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    assigned to their nearest centroid once; each query scores only the
    lists of its ``nprobe`` nearest centroids — the classic
    coarse-quantizer ANN layout (recall grows with nprobe, cost is
    O(Q · n/n_centroids · nprobe) instead of O(Q · n)).

    Deterministic by construction (so the DuckDB oracle replays it):
    centroids are the ``n_centroids`` corpus vectors with the smallest
    ``md5(vec_id)`` (a pseudo-random but RNG-free draw), and every
    nearest-centroid argmax uses the 6-dp-rounded cosine with
    centroid-id tie-break — rounding makes the argmax stable across
    engines' float summation orders.  At 100 TB the centroid table is
    broadcast (tiny) and the only shuffle is the per-list candidate
    join."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    cents = (
        c.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cent_id"), F.col("cv").alias("cent_v"))
    )
    # corpus-side nearest-centroid argmax: packed-long hash aggregate
    # (no corpus-wide window sort) — see _nearest_centroid; the
    # query-side probes below keep the window because they need the
    # TOP-nprobe centroids, not an argmax, and the query set is the
    # small side by construction
    assignment = _nearest_centroid(c, cents, "cv", ["vec_id", "cv"])
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    qsim = F.round(cosine(F.col("qv"), F.col("cent_v")), 6)
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("qsim"), F.asc("cent_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cent_id", qsim.alias("qsim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cent_id")
    )
    scored = (
        assignment.join(probes.hint("SHUFFLE_HASH"), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = True,
    num_planes: int = 8,
    num_tables: int = 4,
) -> DataFrame:
    """``(id_a, id_b, sim)`` pairs with cosine >= threshold (id_a<id_b).
    LSH-pruned by default; exact all-pairs when ``use_lsh=False``."""
    v = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
    if use_lsh:
        b = lsh_buckets(df, num_planes, num_tables, id_col, vec_col)
        pairs = (
            b.alias("x")
            .join(
                b.alias("y"),
                (F.col("x.table") == F.col("y.table"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select(F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b"))
            .distinct()
        )
    else:
        ids = v.select(F.col("id"))
        pairs = (
            ids.alias("x")
            .crossJoin(ids.alias("y"))
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        )
    return (
        pairs.join(v.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(v.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def knn_graph(
    df: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mutual: bool = False,
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH over an embedding table:
    ``(src, dst, weight)`` edges (weight = 6-dp cosine), ready for
    ``Graph.from_edges`` — the bridge from the similarity stack to the
    link-graph operators (kNN graph → Louvain/WCC/labelProp is the
    standard embedding-clustering recipe; GDS-era ``gds.knn`` shape).

    Built on :func:`ivf_topk` with every point as a query, so the cost
    is O(n · n/n_centroids · nprobe), not the O(n²) brute-force — the
    centroid table is broadcast and the only shuffle is the per-list
    candidate join, which is what survives at 100 TB.  Deterministic by
    construction (same md5 centroid draw + rounded argmax), so a SQL
    oracle replays it exactly.

    ``mutual=True`` keeps only symmetric pairs (u lists v AND v lists
    u) — the usual denoising step before community detection."""
    top = ivf_topk(
        df, df, k=k, n_centroids=n_centroids, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col,
    )
    edges = top.select(
        F.col("query_id").alias("src"),
        F.col("vec_id").alias("dst"),
        F.col("sim").alias("weight"),
    )
    if mutual:
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        edges = edges.join(rev.hint("SHUFFLE_HASH"), ["src", "dst"])
    return edges


def _scaled_vec(col: Column) -> Column:
    """Embedding as exact 60-bit-safe longs: ``round(x · 10^6)``.

    Lloyd centroid means are sums of these longs — order-independent
    integer arithmetic — so the k-means below is bit-deterministic
    across partitionings AND engines (a double sum is not: Spark and
    DuckDB add partial aggregates in different orders)."""
    return F.transform(col, lambda x: F.round(x.cast("double") * 1e6).cast("long"))


def _unscaled(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double") / 1e6)


def _nearest_centroid(
    frame: DataFrame,
    cents_df: DataFrame,
    vec: str,
    carry: list[str],
) -> DataFrame:
    """``(*carry, cent_id)`` — each row's nearest centroid by
    (6-dp-rounded cosine desc, cent_id asc), as a WHOLE-STAGE-CODEGEN
    hash aggregate instead of a row_number window: (rounded sim,
    inverted dense centroid rank) packed into ONE long, max(pack) under
    groupBy — the primitive buffer keeps HashAggregate (a struct max
    buffer or a window both fall back to sorting the k-row fanout per
    partition).  ``round(cos·10^6)`` is order-equivalent to the
    6-dp-rounded cosine (k ↦ double(k/10^6) is monotone injective for
    |k| ≤ 10^6), so the argmax matches the oracles' rounded-cosine
    tie-break exactly.  The map-side partial collapses the k-row fanout
    before the one exchange; the decode back to cent_id is a broadcast
    k-row join."""
    # k rows — the constant partition key only silences Spark's
    # single-partition-window warning; the table IS k rows
    idx_w = Window.partitionBy(F.lit(0)).orderBy("cent_id")
    cents_i = cents_df.withColumn("idx", F.row_number().over(idx_w) - 1)
    # derive the packed key from LITERALLY F.round(cos, 6) — the value
    # the oracles and the rest of the repo compare — so a cosine whose
    # 7th decimal digit is a 5 cannot round differently here than
    # there (ADVICE r3).  round(cos,6)*1e6 is within 1/2 ulp of an
    # integer for |cos| <= 1, so the outer 0-dp round (not the
    # truncating cast alone) recovers it exactly.
    ci = F.round(F.round(cosine(F.col(vec), F.col("cent_v")), 6) * 1e6).cast("long")
    pack = ci * F.lit(1 << 20) + (F.lit((1 << 20) - 1) - F.col("idx"))
    decode_idx = F.lit((1 << 20) - 1) - F.pmod(F.col("p"), F.lit(1 << 20))
    return (
        frame.crossJoin(F.broadcast(cents_i))
        .select(*carry, pack.alias("pk"))
        .groupBy(*carry)
        .agg(F.max("pk").alias("p"))
        .join(
            F.broadcast(cents_i.select("idx", "cent_id")),
            decode_idx == F.col("idx"),
        )
        .select(*carry, "cent_id")
    )


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, cluster)`` — Lloyd k-means over an embedding column,
    fully deterministic (so the DuckDB oracle replays it):

    - init: the ``k`` corpus vectors with the smallest ``md5(vec_id)``
      (the same RNG-free draw as ``ivf_topk``); a cluster is labeled by
      its init centroid's vec_id forever;
    - assign: nearest centroid by 6-dp-rounded cosine, centroid-id
      tie-break (rounding stabilizes the argmax across engines' float
      summation orders);
    - update: per-dimension mean over exact ``round(x·10^6)`` longs
      (order-independent integer sums — see ``_scaled_vec``), divided
      back to double once per dimension;
    - ``iterations`` Lloyd updates, then one final assignment.
      ``iterations=0`` degenerates to the IVF coarse quantizer.

    100-TB shape: the centroid table is k rows — always broadcast; per
    iteration one corpus scan for the assign (crossJoin with the
    broadcast centroids + argmax window keyed by vec_id, which AQE
    splits fine since vec_id is unique) and one map-side-combined
    aggregate for the means (k·dim groups).  Empty clusters drop out,
    matching the oracle's GROUP BY.  This is the coarse clustering
    stage of SemDeDup-style semantic dedup (``semdedup`` below).
    """
    c = df.select(
        F.col(id_col).alias("vec_id"), _scaled_vec(F.col(vec_col)).alias("sv")
    )
    c = c.withColumn("cv", _unscaled(F.col("sv")))
    cents = (
        c.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(k)
        .select(F.col("vec_id").alias("cent_id"), F.col("cv").alias("cent_v"))
    )

    def assign(frame: DataFrame, cents_df: DataFrame) -> DataFrame:
        # packed-long argmax hash aggregate — see _nearest_centroid
        return _nearest_centroid(frame, cents_df, "cv", ["vec_id", "sv", "cv"])

    for _ in range(iterations):
        a = assign(c, cents)
        dims = a.select(
            "cent_id", F.posexplode("sv").alias("pos", "v")
        )
        means = (
            dims.groupBy("cent_id", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cent_id",
                "pos",
                (F.col("s").cast("double") / F.col("n") / 1e6).alias("md"),
            )
        )
        # k·dim rows — cut the lineage so iteration r+1's plan does not
        # re-derive every previous round's assignment
        cents = truncate_lineage(
            means.groupBy("cent_id").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "md"))),
                    lambda s: s["md"],
                ).alias("cent_v")
            )
        )
    return assign(c, cents).select("vec_id", F.col("cent_id").alias("cluster"))


def semdedup(
    df: DataFrame,
    threshold: float = 0.95,
    k: int = 8,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, cluster, kept)`` — SemDeDup-style semantic
    deduplication (Abbas et al., 2023): cluster the embedding space
    with ``kmeans``, then WITHIN each cluster drop every vector that
    has a lower-id clustermate with 6-dp-rounded cosine ≥
    ``threshold`` (keep-lowest-id — the same deterministic survivor
    policy as ``dedup.near_dup_clusters``).

    The clustering is what makes this scale: candidate pairs are
    cluster-bounded (O(Σ |cluster|²), never corpus²), and the pair join
    is hash-partitioned on the cluster id.  Exactness caveat inherited
    from SemDeDup itself: near-duplicates split across clusters are not
    compared — recall is controlled by k (fewer, larger clusters =
    higher recall, more pair work)."""
    a = kmeans(df, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col)
    # vertex-sized and referenced three times (lo side, hi side, final
    # kept-flag join) — cut the lineage so the k-means pipeline runs
    # once.  Each row carries its RAW vector plus its precomputed norm,
    # so the O(Σ|cluster|²) pair test below evaluates the *identical
    # expression tree* as cosine(raw, raw) — dot(a,b)/(|a|·|b|) with
    # per-vector |·| — matching the DuckDB oracle's
    # list_cosine_similarity bit-for-bit on the proven-parity FP path
    # (ADVICE r3: the previous normalize-then-dot variant could differ
    # by 1 ulp at the 6-dp threshold boundary).  The per-vector norm
    # is still computed once, not per pair — the optimization that
    # mattered (~2.5× less per-pair work) is kept.
    cv = F.col("cv")
    c = truncate_lineage(
        df.select(
            F.col(id_col).alias("vec_id"),
            _unscaled(_scaled_vec(F.col(vec_col))).alias("cv"),
        )
        .join(a, "vec_id")
        .select("vec_id", "cluster", cv.alias("vn"), _norm(cv).alias("nrm"))
    )
    lo = c.select(
        F.col("cluster"), F.col("vec_id").alias("lo_id"),
        F.col("vn").alias("lo_v"), F.col("nrm").alias("lo_n"),
    )
    hi = c.select(
        F.col("cluster"), F.col("vec_id").alias("hi_id"),
        F.col("vn").alias("hi_v"), F.col("nrm").alias("hi_n"),
    )
    pair_cos = F.when(
        (F.col("lo_n") > 0) & (F.col("hi_n") > 0),
        _dot(F.col("lo_v"), F.col("hi_v")) / (F.col("lo_n") * F.col("hi_n")),
    ).otherwise(F.lit(0.0))
    dropped = (
        hi.join(lo.hint("SHUFFLE_HASH"), "cluster")
        .filter(F.col("lo_id") < F.col("hi_id"))
        .filter(F.round(pair_cos, 6) >= F.lit(threshold))
        .select(F.col("hi_id").alias("vec_id"))
        .distinct()
    )
    return (
        c.join(
            dropped.withColumn("d", F.lit(1)).hint("SHUFFLE_HASH"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            "cluster",
            F.col("d").isNull().alias("kept"),
        )
    )
