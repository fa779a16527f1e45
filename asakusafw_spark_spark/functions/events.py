"""Event-sequence analytics over (user, timestamp, type) logs.

The reference's closest shape is @CoGroup user code over per-user
sorted groups (SURVEY.md §2.3); these operators express the common
sequence questions natively so nothing drops to Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion per user: for ``steps = [A, B, C]``,
    returns one row per user who performed A — (``user_col``, ``t1`` …
    ``tN``) where ``t1`` is the user's first A, ``t2`` the first B
    STRICTLY AFTER ``t1``, ``t3`` the first C strictly after ``t2``, …
    NULL from the first step the user never completed (in order).

    This is the "earliest completion" funnel semantic: greedy earliest
    anchors, which is deterministic and matches how product-analytics
    funnels count a conversion exactly once.  Simultaneous events
    (identical timestamps) do NOT advance the funnel — the next step
    must be strictly later.

    Scale shape: step ``i`` is one filtered scan of the fact (filter
    pushed to the scan) + an equi-join against the ≤|users| slim
    (user, anchor-ts) frame + a map-side-combinable min aggregate — no
    windows, no Python, no per-user sort.  The anchor join is left to
    AQE: it broadcasts when the funnel head is selective and
    sort-merges when "users who did A" is itself huge.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    slim = df.select(
        F.col(user_col), F.col(ts_col).alias("__ts__"), F.col(type_col).alias("__tp__")
    )
    cur = (
        slim.filter(F.col("__tp__") == steps[0])
        .groupBy(user_col)
        .agg(F.min("__ts__").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            slim.filter(F.col("__tp__") == step)
            .join(cur.select(user_col, prev), user_col)
            .filter(F.col("__ts__") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("__ts__").alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    periods: int = 8,
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users cohorted by the period of their
    FIRST event; for each (cohort, k) with 0 ≤ k < ``periods``, how
    many of the cohort's users were active k periods after joining.

    Returns (``cohort`` date, ``period_k`` int, ``n_users`` long,
    ``cohort_size`` long) — k=0 rows carry the cohort definition
    (n_users = cohort_size).  ``period`` is any ``date_trunc`` unit
    (``week``, ``month``, ``day``).

    Scale shape: one min-aggregate builds the slim (user, cohort)
    frame; activity rows join it on user (AQE-decided), dedupe to one
    row per (user, cohort, k) via a distinct aggregate, then count —
    every stage is a keyed equi-join or partial-aggregable hash
    aggregate on slim projections; the event payload never travels.
    Period arithmetic is integer floor division on day deltas (exact
    cross-engine), not calendar intervals — k is "whole ``period``-
    lengths since the cohort period started".
    """
    days = {"day": 1, "week": 7, "month": 30}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}")
    plen = days[period]
    firsts = (
        df.select(F.col(user_col), F.col(ts_col).alias("__ts__"))
        .groupBy(user_col)
        .agg(F.min("__ts__").alias("__first__"))
        .select(
            F.col(user_col),
            F.date_trunc(period, F.col("__first__")).cast("date").alias("cohort"),
        )
    )
    activity = (
        df.select(F.col(user_col), F.col(ts_col).alias("__ts__"))
        .join(firsts, user_col)
        .select(
            F.col(user_col),
            F.col("cohort"),
            # explicit floor: Spark's double→int cast truncates while
            # DuckDB's ROUNDS — floor() is the only spelling both agree on
            F.floor(
                F.datediff(F.col("__ts__").cast("date"), F.col("cohort"))
                / F.lit(plen)
            )
            .cast("int")
            .alias("period_k"),
        )
        .filter((F.col("period_k") >= 0) & (F.col("period_k") < periods))
        .distinct()
    )
    counts = activity.groupBy("cohort", "period_k").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return counts.join(sizes, "cohort").select(
        "cohort", "period_k", "n_users", "cohort_size"
    )
