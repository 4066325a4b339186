"""Behavioral analytics over an event stream — funnels and retention
cohorts, the two standard product-analytics queries over a
``(user_id, ts, event_type)`` table.

Both are pure compositions of filtered aggregates and user-keyed
joins: every aggregate is map-side combined and every join carries
user-count-sized frames (never event-count-sized), so at 100 TB the
cost is the event scan plus per-user partials.  Everything is
deterministic first-touch semantics — replayable by the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import truncate_lineage


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(stage, event_type, users)`` — ordered first-touch funnel:
    a user reaches stage i when they have an event of type
    ``steps[i]`` strictly AFTER their stage-(i-1) touch time, taking
    the earliest qualifying event as the touch (the standard
    first-touch convention; greedy-by-min-ts, deterministic).

    Plan: one filtered min-aggregate per stage over the event scan,
    chained through user-keyed joins; each stage's frame is
    user-count-sized and lineage-cut so stage k+1 never re-runs
    stages 1..k."""
    if not steps:
        raise ValueError("steps must be non-empty")
    u, t, c = user_col, ts_col, type_col
    out_rows = []
    reached: DataFrame | None = None
    for i, step in enumerate(steps):
        cur = events.filter(F.col(c) == step)
        if reached is None:
            stage = cur.groupBy(F.col(u).alias("user")).agg(
                F.min(t).alias("touch")
            )
        else:
            stage = (
                cur.select(F.col(u).alias("user"), F.col(t).alias("ts2"))
                .join(reached, "user")
                .filter(F.col("ts2") > F.col("touch"))
                .groupBy("user")
                .agg(F.min("ts2").alias("touch"))
            )
        reached = truncate_lineage(stage)
        out_rows.append(
            reached.agg(
                F.lit(i + 1).cast("long").alias("stage"),
                F.lit(step).alias("event_type"),
                F.count(F.lit(1)).alias("users"),
            )
        )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``(cohort, period, users, retention)`` — weekly retention
    matrix: a user's cohort is the Monday-truncated week of their
    FIRST event; ``users`` counts cohort members active in week
    ``period`` (0-based) after their cohort week; ``retention`` =
    users / cohort size (round 6).

    Plan: one min-aggregate for first-touch (user-count-sized), one
    distinct over (user, week) — both map-side combined — and a
    user-keyed join; nothing event-count-sized is shuffled twice."""
    u, t = user_col, ts_col
    first = truncate_lineage(
        events.groupBy(F.col(u).alias("user")).agg(
            F.date_trunc("week", F.min(t)).alias("cohort")
        )
    )
    active = (
        events.select(
            F.col(u).alias("user"), F.date_trunc("week", F.col(t)).alias("wk")
        )
        .dropDuplicates(["user", "wk"])
    )
    per = (
        active.join(first, "user")
        .select(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("long").alias("period"),
        )
        .groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).alias("users"))
    )
    size = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        per.join(F.broadcast(size), "cohort")
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            "period",
            "users",
            F.round(F.col("users") / F.col("cohort_size"), 6).alias("retention"),
        )
    )
