"""Spark-native extensions the reference lacks (SURVEY.md §2.8).

The reference has no window/analytic functions, rank/top-k, limit,
distinct-as-operator, intersect/except, or grouping sets (verified
absent from compiler/.../operator/ and runtime/.../graph/).  Since this
engine is PySpark-native we expose them as first-class operators —
flagged as beyond-parity capability, not reference parity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

Ordering = Sequence[tuple[str, str]]


def _order_cols(ordering: Ordering) -> list[Column]:
    return [F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in ordering]


def top_k_per_group(
    df: DataFrame, key: Sequence[str], ordering: Ordering, k: int
) -> DataFrame:
    """Top-K rows per group by sort spec (row_number ≤ k).

    Scale: Spark's WindowExec for rank-limit pushes a per-partition
    top-K (``WindowGroupLimit``) before the shuffle in recent versions,
    so the shuffle carries ≤ k rows per group per map partition.
    """
    w = W.partitionBy(*key).orderBy(*_order_cols(ordering))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def rank_in_group(
    df: DataFrame,
    key: Sequence[str],
    ordering: Ordering,
    out_col: str = "rank",
    method: str = "rank",
) -> DataFrame:
    """Attach rank / dense_rank / row_number within each group."""
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}[method]
    w = W.partitionBy(*key).orderBy(*_order_cols(ordering))
    return df.withColumn(out_col, fn().over(w))


def distinct_records(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """DISTINCT as a first-class op (hash-aggregate, map-side combined)."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def running_agg(
    df: DataFrame,
    key: Sequence[str],
    ordering: Ordering,
    exprs: "dict[str, Column]",
) -> DataFrame:
    """Cumulative (running) aggregates per group in sort order —
    rows from UNBOUNDED PRECEDING to CURRENT ROW.

    Beyond-reference analytic surface (SURVEY.md §2.8): the reference has
    no window functions; this exposes Spark's WindowExec.  Scale: one
    shuffle on ``key``, per-partition incremental evaluation, no
    whole-group buffering for distributive aggregates.
    """
    w = (
        W.partitionBy(*key)
        .orderBy(*_order_cols(ordering))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.select(
        *df.columns, *[e.over(w).alias(name) for name, e in exprs.items()]
    )


def sessionize_batch(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: "dict[str, Column]",
) -> DataFrame:
    """Batch sessionization: events within ``gap`` of the previous event
    merge into one session per key (Spark ``session_window``; window end
    is exclusive — an event exactly ``gap`` after the last one starts a
    NEW session).  Same output shape as streaming ``sessionize``.

    Scale: lowers to a single hash-shuffle on ``keys`` + sort-based
    session merge inside ``SessionWindowStateStore``-free batch exec —
    no Python, no per-key state.
    """
    out = df.groupBy(F.session_window(ts_col, gap), *keys).agg(
        *[e.alias(n) for n, e in aggs.items()]
    )
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        *aggs.keys(),
    )
