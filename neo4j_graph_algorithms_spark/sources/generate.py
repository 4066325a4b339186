"""Deterministic synthetic graph generators — benchmark/test inputs
with zero RNG state.

GDS-era surface (``gds.beta.graph.generate``): produce an edge table
of a requested size and degree shape.  Every endpoint is a pure
function of ``(salt, edge_index)`` via md5 — the same graph
materializes on any engine, any partitioning, any retry (the oracle
replays it row for row in SQL), and generation is a single
``spark.range(n_edges)`` projection: embarrassingly parallel, no
shuffle at all unless ``dedup=True`` (one exchange), so a 10^12-edge
input is one codegen'd scan.

Degree shape:

- ``skew_k=1`` — both endpoints uniform over ``[0, n)``: the classic
  G(n, m) multigraph (self-loops dropped, so slightly fewer than
  ``n_edges`` rows).
- ``skew_k>1`` — each endpoint is the MINIMUM of ``skew_k``
  independent uniform draws: density ∝ (1 − v/n)^{k−1}, i.e. low ids
  become hubs (max expected degree ≈ k·m/n·…) — integer-exact skew
  (no float pow whose last-ulp could diverge between engines), the
  knob for exercising salting / AQE-skew paths with a replayable
  input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _u60(col) -> F.Column:
    """First 60 bits of md5 of the column, as exact BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _endpoint(tag: str, salt: str, n: int, skew_k: int) -> F.Column:
    draws = [
        _u60(F.concat(F.lit(f"{tag}{i}:{salt}:"), F.col("id").cast("string")))
        % F.lit(int(n))
        for i in range(skew_k)
    ]
    return draws[0] if skew_k == 1 else F.least(*draws)


def random_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    salt: str = "gen",
    skew_k: int = 1,
    dedup: bool = False,
) -> DataFrame:
    """``(src, dst)`` — deterministic random edge table (module header
    for the distribution).  ``dedup=True`` collapses parallel edges
    (adds the one exchange)."""
    if skew_k < 1:
        raise ValueError("skew_k must be >= 1")
    df = spark.range(int(n_edges)).select(
        _endpoint("s", salt, n_vertices, skew_k).alias("src"),
        _endpoint("d", salt, n_vertices, skew_k).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    if dedup:
        df = df.dropDuplicates(["src", "dst"])
    return df
