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


def resample_timeseries(
    df: DataFrame,
    ts_col: str,
    step: str,
    keys: Sequence[str],
    aggs: "dict[str, tuple[str, str]]",
    fill: "dict[str, str] | None" = None,
    max_buckets_per_key: "int | None" = None,
) -> DataFrame:
    """Time-series resampling with GAP FILLING: bucket events into
    fixed ``step`` windows per key, aggregate, then materialize every
    bucket of each key's [first, last] span — including empty ones —
    with per-column fill policies.  The regularization step every
    downstream time-series consumer (charting, anomaly scoring, model
    features) needs and event logs never provide.

    ``step``: an interval literal (``"1 hour"``, ``"15 minutes"``).
    ``aggs``: ``{out_col: (fn, src_col)}`` with fn ∈ count/sum/min/max/
    avg — sums/avgs accumulate through exact decimal (order-insensitive
    bit-stable doubles, the engine's standard money contract).
    ``fill``: per-output policy for GAP buckets — ``"zero"`` (counts),
    ``"locf"`` (last observation carried forward — gauges),
    ``"interp"`` (linear interpolation between the surrounding
    observations — smooth gauges; always defined because the grid
    spans [first, last] observation, so every gap is interior; output
    becomes double), ``"null"`` (default).
    ``max_buckets_per_key``: optional fail-fast cap on any single
    gap's bucket count (and hence on every ``sequence()`` array built
    in memory) — guards the explode's worst case (one key, huge span,
    tiny step ⇒ span/step buckets materialized at once).  Enforced
    executor-side via ``raise_error`` on each observation's trailing
    gap, so the plan stays lazy; per-key totals are the sum of gaps,
    each individually ≤ the cap.

    Output: ``keys…, bucket_start (timestamp), bucket_end, <aggs…>``.

    Scale shape — all native, no UDF, ONE scan of the data:

    1. one hash aggregate over (keys, floor(ts/step)) — partial
       map-side combine, one shuffle of slim bucket rows;
    2. gap rows are GENERATED (not joined): a ``lead(bucket)`` window
       over the aggregated frame bounds each observation's trailing
       gap, and one ``sequence``-explode emits the observed bucket
       plus its gap buckets (aggregates masked to NULL off the
       observed bucket) — a single lineage with no self-join and no
       union, so the fact table is scanned exactly once (asserted by
       the plan test); gap rows ∝ span/step per key, never data-sized;
    3. LOCF is one window pass per key ordered by bucket
       (``last(col, ignorenulls=True)`` over unbounded-preceding) —
       Spark's running-frame window, linear per key.

    The empty input yields an empty (fully typed) frame.  NULL key
    rows group and grid like any other key (SQL GROUP BY semantics).
    """
    # Step length in seconds, timezone-proof: difference of two
    # unix_timestamps cancels whatever session-zone offset applies at
    # the anchor (a bare unix_timestamp(epoch + INTERVAL) folds the
    # 1970 offset of non-UTC session zones into the step).  Day-time
    # intervals add exact microseconds, so the difference IS the step.
    _base = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    step_sec = (
        F.unix_timestamp(_base + F.expr(f"INTERVAL {step}"))
        - F.unix_timestamp(_base)
    ).cast("long")
    klist = list(keys)
    # floor(), not cast-truncate: negative epochs (pre-1970) must land
    # in the bucket BELOW zero like the oracle's floor(epoch/step).
    bucket = F.floor(
        F.unix_timestamp(F.col(ts_col)).cast("long") / step_sec
    ).cast("long")

    # Sum/avg domain contract (r15 ADVICE, stated not silent): the
    # order-insensitive exact-decimal accumulation try_casts each value
    # to decimal(27,6), which nulls NaN/±Inf AND any finite |x| >= 1e21
    # (decimal(27,6) overflow, e.g. DBL_MAX) — such values are OMITTED
    # from sum/avg on both engine and oracle.  A pipeline whose
    # magnitudes legitimately reach 1e21 needs a wider decimal, not
    # this default; count/min/max are unaffected.
    fns = {
        "count": lambda c: F.count(F.col(c)),
        "sum": lambda c: F.sum(F.col(c).try_cast("decimal(27,6)")).cast("double"),
        "min": lambda c: F.min(F.col(c)),
        "max": lambda c: F.max(F.col(c)),
        # exact-decimal sum cast to double BEFORE the divide: decimal-avg
        # return scales differ cross-engine, the double quotient of exact
        # inputs does not (the repo's established avg contract)
        "avg": lambda c: (
            F.sum(F.col(c).try_cast("decimal(27,6)")).cast("double")
            / F.count(F.col(c))
        ),
    }
    agg_exprs = []
    for out, (fn, src) in aggs.items():
        if fn not in fns:
            raise ValueError(
                f"resample_timeseries: unknown agg {fn!r} (use "
                f"{sorted(fns)})"
            )
        agg_exprs.append(fns[fn](src).alias(out))
    sparse = df.withColumn("__b", bucket).groupBy(*klist, "__b").agg(
        *agg_exprs
    )

    lead_w = W.partitionBy(*klist).orderBy("__b")
    with_next = sparse.withColumn("__nxt", F.lead("__b").over(lead_w))
    observed = F.col("__b") == F.col("__bb")
    gap_end = F.coalesce(F.col("__nxt") - 1, F.col("__b"))
    if max_buckets_per_key is not None:
        # Adversarial-span guard: ONE key spanning a huge [first,last]
        # at a tiny step makes a single sequence() emit span/step rows
        # in one task.  Checked executor-side on each observation's
        # trailing gap (their sum per key IS the key's bucket count),
        # so the plan stays lazy and no extra job runs.
        cap = int(max_buckets_per_key)
        if cap < 1:
            raise ValueError(
                "resample_timeseries: max_buckets_per_key must be >= 1"
            )
        too_big = (gap_end - F.col("__b") + F.lit(1)) > F.lit(cap)
        gap_end = F.when(
            too_big,
            F.raise_error(
                F.lit(
                    "resample_timeseries: a key's bucket span exceeds "
                    f"max_buckets_per_key={cap}; widen the step, raise "
                    "the cap, or split the key range"
                )
            ).cast("long"),
        ).otherwise(gap_end)
    full = with_next.select(
        *klist,
        # explode_outer: plain explode infers a size()>0 filter that
        # re-evaluates the sequence a second time; the gap sequence is
        # never empty (gap_end >= __b by construction)
        F.explode_outer(
            F.sequence(
                F.col("__b"),
                gap_end,
            )
        ).alias("__bb"),
        "__b",
        *list(aggs),
    ).select(
        *klist,
        *[F.when(observed, F.col(out)).alias(out) for out in aggs],
        F.col("__bb").alias("__b"),
    )

    fill = fill or {}
    w = (
        W.partitionBy(*klist)
        .orderBy("__b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy(*klist)
        .orderBy("__b")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    out_cols = []
    for out in aggs:
        policy = fill.get(out, "null")
        if policy == "zero":
            out_cols.append(F.coalesce(F.col(out), F.lit(0)).alias(out))
        elif policy == "locf":
            out_cols.append(F.last(F.col(out), ignorenulls=True).over(w).alias(out))
        elif policy == "interp":
            # linear interpolation between the surrounding observations
            # (two running-frame window passes); the EXACT expression
            # shape — pv + (nv - pv) * ((b - pb) / (nb - pb)) — is the
            # cross-engine determinism contract (same IEEE ops, same
            # order, on both sides of the oracle)
            v = F.col(out).cast("double")
            b = F.col("__b")
            pv = F.last(v, ignorenulls=True).over(w)
            pb = F.last(F.when(v.isNotNull(), b), True).over(w)
            nv = F.first(v, ignorenulls=True).over(w_next)
            nb = F.first(F.when(v.isNotNull(), b), True).over(w_next)
            interp = F.when(v.isNotNull(), v).otherwise(
                pv + (nv - pv) * ((b - pb) / (nb - pb))
            )
            out_cols.append(interp.alias(out))
        elif policy == "null":
            out_cols.append(F.col(out))
        else:
            raise ValueError(
                f"resample_timeseries: unknown fill {policy!r} for {out!r} "
                "(zero | locf | interp | null)"
            )
    return full.select(
        *klist,
        F.timestamp_seconds(F.col("__b") * step_sec).alias("bucket_start"),
        F.timestamp_seconds((F.col("__b") + 1) * step_sec).alias("bucket_end"),
        *out_cols,
    )
