"""Deterministic hash-based splits and samples for training pipelines.

Every assignment is a pure function of ``(row key, salt)`` via md5 —
no RNG, no seed state, no ``rand()`` — so:

- results are identical across runs, engines, partitionings, and
  retries (Spark's ``rand()`` is NOT stable under task retry or
  repartition; a retried task can emit a different sample);
- the split survives incremental reprocessing: a document keeps its
  assignment when the corpus around it grows, the property that keeps
  eval sets eval forever;
- the DuckDB oracle can replay the arithmetic symbolically.

Scale shape: all of these are single projections or a projection plus
one pushed-down filter — zero shuffles, zero aggregations, whole-stage
codegen end to end.  On 100 TB the split/sample is free relative to
the scan that reads the data.

Bucketing: the first 15 hex chars of ``md5(key || ':' || salt)`` as a
60-bit integer, mod ``10**6`` buckets — fraction granularity 1e-6,
deterministic rounding by cumulative integer thresholds.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str, n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in ``[0, n_buckets)`` for a key column —
    60-bit md5 prefix (always non-negative, so ``%`` is safe) of
    ``key:salt``."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", key.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % F.lit(n_buckets)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | Sequence[float],
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split — train/val/test and friends.

    ``weights`` is an ordered mapping ``{"train": 0.8, "val": 0.1,
    "test": 0.1}`` (or a bare sequence, labeled ``"0", "1", ...``);
    weights are normalized, so ``{"train": 8, "val": 1, "test": 1}``
    works too.  Boundaries are cumulative integer thresholds over 10^6
    hash buckets: every row gets exactly one label, expected sizes are
    proportional to the weights, and the assignment for a given
    ``(id, salt)`` never changes as the table grows or re-partitions.

    Pure projection — zero shuffles; at 100 TB the split costs the
    scan and nothing else."""
    if not isinstance(weights, Mapping):
        weights = {str(i): w for i, w in enumerate(weights)}
    labels = list(weights)
    if len(labels) < 1:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = hash_bucket(F.col(id_col), salt)
    cum = 0.0
    expr = F.lit(labels[-1])  # the last label absorbs rounding leftovers
    conds: list[tuple[int, str]] = []
    for lab in labels[:-1]:
        cum += weights[lab] / total
        conds.append((int(round(cum * N_BUCKETS)), lab))
    for threshold, lab in reversed(conds):
        expr = F.when(bucket < threshold, F.lit(lab)).otherwise(expr)
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows (by hash bucket of
    ``id_col``).  Unlike ``df.sample``, stable under retries and
    re-partitioning, and repeatable across engines.  One pushed-down
    filter; samples with different salts are independent, samples with
    the same salt and growing fractions are nested (a 1% sample is a
    subset of the 10% sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(round(fraction * N_BUCKETS))
    return df.filter(hash_bucket(F.col(id_col), salt) < threshold)


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample the hub
    ``event_type`` to 1% while keeping 100% of the rare one (the class
    re-balancing step of a training-data pipeline).

    ``fractions`` maps stratum value → keep fraction; strata not
    listed keep ``default_fraction``.  The per-row threshold is a
    literal map lookup (`create_map`) — no join, no shuffle, whole
    stage codegen; skew is irrelevant because nothing groups by the
    stratum."""
    for v in fractions.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
    pairs: list[Column] = []
    for k, v in fractions.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(int(round(v * N_BUCKETS))))
    thresholds = F.create_map(*pairs)
    threshold = F.coalesce(
        thresholds[F.col(strata_col)],
        F.lit(int(round(default_fraction * N_BUCKETS))),
    )
    return df.filter(hash_bucket(F.col(id_col), salt) < threshold)


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """``(doc_id, shard, seq, n_tokens, tok_offset)`` — token-budget
    sequence packing, the "group documents into fixed-length training
    sequences" step of an LLM data pipeline.

    Documents are hash-assigned to ``n_shards`` independent shards,
    deterministically shuffled within each shard (md5 order key — the
    usual pre-pack shuffle, stable across runs/engines/retries like
    everything in this module), then each shard's token stream is
    treated as one concatenation cut every ``budget`` tokens: a
    document belongs to the sequence where its first token lands
    (``seq``), at stream offset ``tok_offset`` within the shard.
    Downstream writers emit one training sequence per ``(shard, seq)``
    group; documents straddling a cut are split by the writer at
    ``budget - tok_offset`` tokens, exactly as GPT-style packing does.

    100-TB shape: the only non-projection work is one window cumsum
    *partitioned by shard* — no global sort; shards are independent,
    so parallelism and per-task memory are controlled by ``n_shards``
    (size it so one shard's (id, count) pairs fit a task — the window
    carries two longs per doc, not the text).  All-integer offsets,
    exact under any engine; ids pass through untouched (any orderable
    type).  Assumes ids are unique (like every assignment in this
    module); the explicit ROWS frame keeps accidental duplicate-id
    rows from becoming window peers with identical offsets."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from pyspark.sql import Window as W

    from .textstats import token_count

    tc = (
        F.col(token_count_col).cast("long")
        if token_count_col
        else token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), salt, n_shards).alias("shard"),
        hash_bucket(F.col(id_col), salt + ":order").alias("okey"),
        tc.alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("okey", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "doc_id",
        "shard",
        F.floor(before / F.lit(budget)).cast("long").alias("seq"),
        "n_tokens",
        (before % F.lit(budget)).cast("long").alias("tok_offset"),
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """``(id, sample_key)`` — the top-``n`` rows of a weighted sample
    WITHOUT replacement, inclusion probability ∝ ``weight_col``
    (A-ES / Efraimidis–Spirakis 2006: key = u^(1/w), take the n
    largest — computed in the log domain, ``ln(u)/w``, same ordering
    without pow underflow).

    Like every sampler here the randomness is derandomized —
    ``u = (md5-bucket(id)+0.5)/10^6`` — so the sample is identical
    across runs, retries, partitionings, and engines, and it is
    growth-stable: adding rows never changes a surviving row's key,
    only the cut line.  Rows with non-positive weight are excluded
    (their inclusion probability is 0).

    100-TB shape: one projection + a global top-n (TakeOrdered — per-
    partition heaps, no global sort of the corpus)."""
    u = (hash_bucket(F.col(id_col), salt).cast("double") + F.lit(0.5)) / F.lit(1e6)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.round(key, 9).alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(int(n))
    )
