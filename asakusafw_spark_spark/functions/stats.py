"""Robust-statistics cleaning operators.

The reference has no statistics surface (scalar math lives in user Java
bodies, SURVEY.md §2.7); these are the Spark-native numeric-cleaning
primitives a feature/training pipeline needs, built on the same
exact-vs-approx split as ``quality_quantile_filter``: the exact path is
oracle-checkable (Spark ``percentile`` ≡ DuckDB ``quantile_cont``,
linear interpolation), the approx path trades a bounded sketch error
for never sorting a group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    by: str | list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    approx: bool = False,
    accuracy: int = 10_000,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp outliers to the [``lower``, ``upper``] quantile band,
    optionally per group — the standard robust-cleaning step before
    scaling/aggregating heavy-tailed columns (prices, token counts,
    quality scores).

    Adds ``out_col`` (default ``<value_col>_winsorized``); all original
    columns and rows are preserved (NULL values stay NULL).  Rows whose
    GROUP key is NULL pass through unclamped (they match no cut-point
    row; least/greatest skip the null cuts), mirroring SQL group-join
    semantics rather than inventing a null-group band.

    Scale shape: ONE aggregate computes both cut points per group, then
    a broadcast-friendly join (group-count rows, slim) feeds a clamp
    projection — the data rides a single scan + at most one shuffle of
    the slim threshold frame.  ``approx=True`` switches the cut points
    to ``percentile_approx`` (bounded-memory sketch, partial-
    aggregable — the 100 TB path; exact ``percentile`` buffers each
    group's values in the aggregate).
    """
    from .dedup import ensure_parallelism

    keys = [by] if isinstance(by, str) else list(by or [])
    fn = "percentile_approx" if approx else "percentile"
    acc = f", {accuracy}" if approx else ""
    # ONE percentile aggregate with an array of fractions: n separate
    # percentile(col, p) calls each buffer/sort the group independently
    # (measured ~2× on the exact path for two cuts)
    both = F.expr(f"{fn}({value_col}, array({lower}, {upper}){acc})")
    aggs = [both[0].alias("__lo__"), both[1].alias("__hi__")]
    # r17 (guide §2.5/§2.3): the cut-point aggregate reads a SLIM
    # projection (keys + value only) spread to cluster width — a narrow
    # single-file scan otherwise runs the whole value-buffering
    # percentile partial on 1-2 cores (qprof: 13 tasks total, the
    # aggregate the dominant stage).  ensure_parallelism is a no-op on
    # wide scans, i.e. always at 100 TB; the clamp side below still
    # rides the original unshuffled scan.
    cuts_src = ensure_parallelism(df.select(*keys, value_col))
    cuts = cuts_src.groupBy(*keys).agg(*aggs) if keys else cuts_src.agg(*aggs)
    joined = (
        df.join(F.broadcast(cuts), keys, "left") if keys else df.crossJoin(F.broadcast(cuts))
    )
    out = out_col or f"{value_col}_winsorized"
    # least/greatest SKIP nulls in both Spark and DuckDB, which would
    # silently clamp a NULL value to the lower cut — guard explicitly
    clamped: Column = F.when(
        F.col(value_col).isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.least(
            F.greatest(F.col(value_col).cast("double"), F.col("__lo__").cast("double")),
            F.col("__hi__").cast("double"),
        )
    )
    return joined.withColumn(out, clamped).drop("__lo__", "__hi__")


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    by: str | list[str] | None = None,
    buckets: int = 4,
    approx: bool = False,
    accuracy: int = 10_000,
    out_col: str | None = None,
) -> DataFrame:
    """Quantile binning by VALUE cut points, optionally per group:
    adds ``out_col`` (default ``<value_col>_bucket``) in 1..``buckets``.

    Unlike ``ntile`` (row-count-balanced, so TIED values land in
    different buckets), the bucket is a pure function of the value and
    the group's cut points — equal values always share a bucket, which
    is what feature binning and stratified reporting need.  Cut point
    ``q_i`` uses the same exact-``percentile``-vs-``percentile_approx``
    split as :func:`winsorize`; bucket = 1 + #cuts strictly below the
    value.  NULL values get NULL buckets; NULL group keys pass through
    with NULL buckets (no cut-point row to match).

    Scale shape: one aggregate computes all ``buckets-1`` cut points
    per group; the slim cut frame broadcasts back onto an unshuffled
    scan; assignment is an array fold projection.
    """
    keys = [by] if isinstance(by, str) else list(by or [])
    fn = "percentile_approx" if approx else "percentile"
    acc = f", {accuracy}" if approx else ""
    qs = [i / buckets for i in range(1, buckets)]
    from .dedup import ensure_parallelism

    # single array-fraction aggregate — see winsorize (incl. the r17
    # slim-projection + ensure_parallelism treatment of the cut side)
    arr = F.expr(
        f"{fn}({value_col}, array({', '.join(str(q) for q in qs)}){acc})"
    ).alias("__qs__")
    cuts_src = ensure_parallelism(df.select(*keys, value_col))
    grouped = cuts_src.groupBy(*keys).agg(arr) if keys else cuts_src.agg(arr)
    cuts = grouped.select(
        *keys, *[F.col("__qs__")[i].alias(f"__q{i}__") for i in range(len(qs))]
    )
    joined = (
        df.join(F.broadcast(cuts), keys, "left") if keys else df.crossJoin(F.broadcast(cuts))
    )
    out = out_col or f"{value_col}_bucket"
    v = F.col(value_col).cast("double")
    bucket: Column = F.lit(1)
    for i in range(len(qs)):
        bucket = bucket + F.when(v > F.col(f"__q{i}__").cast("double"), 1).otherwise(0)
    assigned = F.when(v.isNull(), F.lit(None).cast("int")).otherwise(
        # NULL cuts (null group key / all-null group) → NULL bucket
        F.when(F.col("__q0__").isNull(), F.lit(None).cast("int")).otherwise(
            bucket.cast("int")
        )
    )
    return joined.withColumn(out, assigned).drop(
        *[f"__q{i}__" for i in range(len(qs))]
    )


def _contains_nested_float(dt) -> bool:
    """True when ``dt`` is a complex type with a float/double anywhere
    inside it (top-level floats are handled exactly by the raw-copy
    min/max; nested ones cannot ride a mutable aggregation buffer)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_nested_float(dt.elementType)
    if isinstance(dt, T.MapType):
        return _contains_nested_float(dt.keyType) or _contains_nested_float(
            dt.valueType
        )
    if isinstance(dt, T.StructType):
        return any(_contains_nested_float(f.dataType) for f in dt.fields)
    return False


def _exact_stats_row(df: DataFrame, cols: "Sequence[str]") -> "DataFrame | None":
    """1-row frame ``__n__, __nn{i}__, __nd{i}__, __mn{i}__, __mx{i}__``
    via typed-slot explode + hash GROUP BY (gid, value) + one global
    conditional aggregate — the sort-free exact-distinct plan (see
    ``analyze_table``).  Returns ``None`` when a requested column has a
    float nested inside a complex type (caller falls back to the legacy
    Expand plan to keep ``-0.0`` rendering exact)."""
    from pyspark.sql import types as T

    ftypes = {f.name: f.dataType for f in df.schema.fields}
    # Spark resolves column names case-insensitively by default; mirror
    # that here (exact match wins), and decline names we cannot resolve
    # unambiguously — the legacy path then raises Spark's own error
    ci: dict = {}
    for f in df.schema.fields:
        ci[f.name.lower()] = (
            None if f.name.lower() in ci else f.dataType  # ambiguous → None
        )
    stypes: list = []  # one slot per distinct value type
    slot_keys: dict = {}
    slot_of: list = []
    for c in cols:
        dt = ftypes.get(c, ci.get(c.lower()))
        if dt is None:
            return None
        if not isinstance(dt, (T.FloatType, T.DoubleType)) and _contains_nested_float(dt):
            return None
        k = dt.simpleString()
        if k not in slot_keys:
            slot_keys[k] = len(stypes)
            stypes.append(dt)
        slot_of.append(slot_keys[k])
    nslots = len(stypes)
    float_slots = {
        s
        for s, dt in enumerate(stypes)
        if isinstance(dt, (T.FloatType, T.DoubleType))
    }
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("__gid__"),
                    *[
                        (
                            F.col(c)
                            if slot_of[i] == s
                            else F.lit(None).cast(stypes[s])
                        ).alias(f"__v{s}__")
                        for s in range(nslots)
                    ],
                    # raw (non-grouping) copy of float slots: group-key
                    # normalization canonicalizes -0.0 → 0.0, so min/max
                    # aggregate the raw value at level 1 instead (double
                    # buffers are mutable — the hash aggregate survives)
                    *[
                        (
                            F.col(c)
                            if slot_of[i] == s
                            else F.lit(None).cast(stypes[s])
                        ).alias(f"__r{s}__")
                        for s in sorted(float_slots)
                    ],
                )
                for i, c in enumerate(cols)
            ]
        )
    )
    expanded = df.select(rows.alias("r")).select("r.*")
    slots = [f"__v{s}__" for s in range(nslots)]
    raw_aggs = []
    for s in sorted(float_slots):
        raw_aggs += [
            F.min(f"__r{s}__").alias(f"__rmn{s}__"),
            F.max(f"__r{s}__").alias(f"__rmx{s}__"),
        ]
    per_value = expanded.groupBy("__gid__", *slots).agg(
        F.count(F.lit(1)).alias("__cnt__"), *raw_aggs
    )

    def _v(i):
        return F.col(f"__v{slot_of[i]}__")

    def _mn(i):
        s = slot_of[i]
        return F.col(f"__rmn{s}__") if s in float_slots else _v(i)

    def _mx(i):
        s = slot_of[i]
        return F.col(f"__rmx{s}__") if s in float_slots else _v(i)

    aggs = [
        F.coalesce(
            F.sum(F.when(F.col("__gid__") == 0, F.col("__cnt__"))),
            F.lit(0).cast("long"),
        ).alias("__n__")
    ]
    for i, c in enumerate(cols):
        g = F.col("__gid__") == i
        nn = g & _v(i).isNotNull()
        aggs += [
            F.coalesce(
                F.sum(F.when(nn, F.col("__cnt__"))), F.lit(0).cast("long")
            ).alias(f"__nn{i}__"),
            F.count(F.when(nn, F.lit(1))).alias(f"__nd{i}__"),
            F.min(F.when(g, _mn(i))).cast("string").alias(f"__mn{i}__"),
            F.max(F.when(g, _mx(i))).cast("string").alias(f"__mx{i}__"),
        ]
    return per_value.agg(*aggs)


def analyze_table(
    df: DataFrame,
    columns: "Sequence[str] | None" = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE pass: for each column
    ``(column, n_rows, n_nonnull, n_distinct, min_value, max_value)``
    — the inputs broadcast-vs-shuffle decisions, skew triage, and
    constraint discovery need, as a slim #columns-row frame.

    One aggregate computes every column's stats simultaneously
    (map-side partial, single scan).  ``n_distinct`` defaults to
    HyperLogLog ``approx_count_distinct`` (keeps the plan a plain
    one-pass aggregate at any width); ``exact_distinct=True`` runs a
    hash-friendly two-level aggregation (still one scan): a typed-slot
    explode (one slim row per column×row, the value carried in a
    per-datatype slot so every requested column shares one schema)
    feeds a hash GROUP BY (column, value) — the exact-distinct dedup —
    then ONE global conditional aggregate folds the distinct frame into
    the per-column stats row.  Neither level needs a sort: the first
    level's buffer is a plain count (hash-aggregable even with string
    values, which are grouping KEYS here), and the global level has no
    grouping keys, so the string min/max buffers that force Catalyst's
    COUNT(DISTINCT) Expand plan into two full SortAggregate passes
    (r17 measured: Expand→Sort→SortAggregate over #columns× the row
    count, twice) never meet a required ordering.  min/max of float/
    double columns ride a raw (non-key) copy aggregated at level 1 —
    mutable double buffers keep the hash aggregate — because group-key
    normalization would canonicalize ``-0.0`` to ``0.0``; columns with
    floats nested inside complex types fall back to the legacy Expand
    plan to preserve exact sign-of-zero rendering.  min/max are
    rendered as strings so mixed column types share one report schema.
    """
    from .dedup import ensure_parallelism

    # spread the aggregate's map side when the scan is narrower than the
    # cluster: a small single-file table otherwise runs the whole
    # multi-column distinct/min/max partial aggregation on one core
    # (r16, guide §2.5; no-op on wide scans, i.e. always at 100 TB)
    df = ensure_parallelism(df)
    cols = list(columns) if columns is not None else list(df.columns)
    if exact_distinct:
        one = _exact_stats_row(df, cols)
        if one is None:  # nested-float fallback (sign-of-zero exactness)
            aggs = [F.count(F.lit(1)).alias("__n__")]
            for i, c in enumerate(cols):
                aggs += [
                    F.count(F.col(c)).alias(f"__nn{i}__"),
                    F.countDistinct(F.col(c)).alias(f"__nd{i}__"),
                    F.min(F.col(c)).cast("string").alias(f"__mn{i}__"),
                    F.max(F.col(c)).cast("string").alias(f"__mx{i}__"),
                ]
            one = df.agg(*aggs)
    else:
        aggs = [F.count(F.lit(1)).alias("__n__")]
        for i, c in enumerate(cols):
            aggs += [
                F.count(F.col(c)).alias(f"__nn{i}__"),
                F.approx_count_distinct(F.col(c)).alias(f"__nd{i}__"),
                F.min(F.col(c)).cast("string").alias(f"__mn{i}__"),
                F.max(F.col(c)).cast("string").alias(f"__mx{i}__"),
            ]
        one = df.agg(*aggs)
    stack = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n__").alias("n_rows"),
                    F.col(f"__nn{i}__").alias("n_nonnull"),
                    F.col(f"__nd{i}__").alias("n_distinct"),
                    F.col(f"__mn{i}__").alias("min_value"),
                    F.col(f"__mx{i}__").alias("max_value"),
                )
                for i, c in enumerate(cols)
            ]
        )
    )
    return one.select(stack.alias("r")).select("r.*")


def heavy_hitters(
    df: DataFrame,
    cols: "str | list[str]",
    min_count: int = 2,
    min_share: "float | None" = None,
) -> DataFrame:
    """Exact frequent-value detection: the distinct values of ``cols``
    occurring at least ``min_count`` times (and, when ``min_share`` is
    given, holding at least that fraction of all rows) — hot-key
    discovery before a join (feed the result to ``skew_salt``/
    ``max_candidates``), hot-domain / boilerplate-value detection in a
    training corpus, or plain top-talker reporting.

    Returns one row per qualifying value: ``cols…, cnt, share`` (share
    is ``cnt/total`` as an exact double quotient — identical IEEE bits
    on any engine).  NULL values count as a group like SQL ``GROUP BY``.

    Scale shape: ONE partial-aggregable hash aggregate over the data;
    the total comes from re-aggregating the (group-cardinality) counts
    frame — never a second data scan — and Spark's ReuseExchange serves
    both branches from the same shuffle.  The total rides a 1-row
    broadcast stat frame (the repo's standard threshold pattern).  This
    is the exact path and it is 100 TB-safe whenever the distinct count
    fits a hash aggregate (it shuffles one slim row per distinct
    value); for cardinalities beyond that, sketch alternatives
    (``df.stat.freqItems``, count-min) trade exactness for fixed
    memory — not offered here because their outputs are
    engine-specific and break the oracle contract.
    """
    group = [cols] if isinstance(cols, str) else list(cols)
    counts = df.groupBy(*group).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    out = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "share",
            F.col("cnt").cast("double") / F.col("__total").cast("double"),
        )
        .drop("__total")
        .filter(F.col("cnt") >= F.lit(int(min_count)))
    )
    if min_share is not None:
        out = out.filter(F.col("share") >= F.lit(float(min_share)))
    return out


def distinct_sketch_rollup(
    df: DataFrame,
    group_cols: "str | list[str]",
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's native ``hll_sketch_agg``): one binary ``sketch`` per group
    — build once per partition unit (a day, an ingest batch), persist,
    and answer "distinct users over ANY window" later by unioning
    sketches (:func:`merge_distinct_sketches`) WITHOUT rescanning
    history.  The incremental-aggregate pattern `apply_agg_delta` gives
    exact SUM/COUNT; this is its distinct-count sibling, approximate by
    nature (HLL standard error ≈ 1.04/√2^lg_config_k — ~1.6% at the
    default 12; raise toward 21 for tighter bounds at 2^k·8 B/group).

    Scale shape: one partial-aggregable hash aggregate; a sketch (KBs)
    per group crosses the shuffle, never the values.  Merging is
    order- and partition-independent (asserted in tests), and the
    union PRESERVES the build lgConfigK — no precision downgrade
    (pinned by serialized-size regression in test_sketch_params.py;
    contrast theta_union's lgNomEntries=12 default).  While sketches
    stay in sparse/list mode the merged estimate EQUALS the
    single-pass estimate exactly; once dense, the union path can
    differ from single-pass by a fraction of the HLL error band
    (observed 6017 vs 6013 at lgK=14 over 6000 distincts) while both
    remain inside it — which is still what makes per-day sketches a
    safe substitute for the full rescan.

    Not oracle-checked (DuckDB's HLL is a different implementation, so
    cross-engine estimates differ by design); covered by the pytest
    invariants instead — merge≡single-pass equality, order
    independence, and accuracy vs exact COUNT(DISTINCT).
    """
    group = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*group).agg(
        F.hll_sketch_agg(value_col, F.lit(int(lg_config_k))).alias("sketch")
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: "str | list[str] | None" = None,
    sketch_col: str = "sketch",
    out_col: str = "distinct_estimate",
) -> DataFrame:
    """Union HLL sketches (:func:`distinct_sketch_rollup`) and estimate
    the distinct count — per ``group_cols``, or one global row when
    None.  Input is the (small) sketch table, so re-aggregating a year
    of daily sketches costs 365 slim rows per group, not a data scan.
    """
    est = F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col)
    if group_cols is None:
        return sketches.agg(est)
    group = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return sketches.groupBy(*group).agg(est)


def theta_sketch_rollup(
    df: DataFrame,
    group_cols: "str | list[str]",
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """Mergeable distinct-count sketches WITH set algebra (Apache
    DataSketches Theta via Spark natives): one binary ``sketch`` per
    group.  Unlike HLL (:func:`distinct_sketch_rollup`), theta sketches
    support INTERSECTION and DIFFERENCE — overlap questions ("users
    active in both cohorts", "documents in A not in B") answered from
    per-group sketch state without joining the underlying data.

    Deterministic: the sketch state is hash-threshold-based, so it is
    partition- and order-independent (asserted in tests), and estimates
    are EXACT while a group's distinct count stays under ~2^lg_k
    retained entries (the default 14 → exact to ~16k).

    Scale shape: one partial-aggregable hash aggregate; a KB sketch per
    group crosses the shuffle, never the values.
    """
    group = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*group).agg(
        F.theta_sketch_agg(value_col, F.lit(int(lg_k))).alias("sketch")
    )


def audience_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 14,
    max_groups: "int | None" = 1000,
) -> DataFrame:
    """Pairwise audience overlap between groups: for every group pair
    (a < b), the distinct counts of each side, their intersection,
    union, and a-only difference — retention/cannibalization/coverage
    analysis in ONE pass over the data plus a self-join of the tiny
    sketch table (one row per group), never a pairwise join of rows.

    Output: (group_a, group_b, distinct_a, distinct_b, overlap,
    union_count, only_a) — counts as longs (exact while each group is
    under ~2^lg_k distincts; see :func:`theta_sketch_rollup`).

    Scale shape: the data is scanned once into G sketch rows (the
    sketch frame is persisted so BOTH sides of the self-join reuse one
    scan — a G-row, ≤ 2^lg_k·8 B/row cache that stays resident for the
    result's lifetime); the pairwise stage is G·(G-1)/2 sketch-pair
    rows of pure JVM sketch ops.  COST MODEL: quadratic in GROUPS,
    never in data — audience analyses have small G (days, cohorts,
    variants).  ``max_groups`` (default 1000 → ≤ ~500k pair rows)
    fails fast with the measured cardinality instead of silently going
    quadratic when someone passes a high-cardinality group column;
    raise it deliberately or pre-filter to a top-m of groups.
    """
    sk = theta_sketch_rollup(df, group_col, value_col, lg_k=lg_k)
    if max_groups is not None:
        from pyspark.storagelevel import StorageLevel

        sk = sk.persist(StorageLevel.MEMORY_AND_DISK)
        g = sk.limit(max_groups + 1).count()
        if g > max_groups:
            sk.unpersist()
            raise ValueError(
                f"audience_overlap: > {max_groups} distinct {group_col!r} "
                "groups — the pairwise stage is G*(G-1)/2 sketch pairs "
                "and would go quadratic. Pre-filter to a top-m of groups "
                "or raise max_groups deliberately."
            )
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("sketch").alias("__sa")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("sketch").alias("__sb")
    )
    est = F.theta_sketch_estimate
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            est(F.col("__sa")).cast("long").alias("distinct_a"),
            est(F.col("__sb")).cast("long").alias("distinct_b"),
            est(F.theta_intersection("__sa", "__sb")).cast("long").alias(
                "overlap"
            ),
            # pin the union's nominal entries to lg_k: Spark's default
            # lgNomEntries is 12, so a union of two exact lg_k=14
            # sketches would silently drop into estimation mode past
            # 4096 retained entries (caught by the sf1 sweep: two
            # 3,000-user audiences with zero overlap unioned to 5,900)
            est(F.theta_union("__sa", "__sb", F.lit(int(lg_k)))).cast(
                "long"
            ).alias("union_count"),
            est(F.theta_difference("__sa", "__sb")).cast("long").alias(
                "only_a"
            ),
        )
    )


#: KLL variant suffix per Spark column dtype (exact-width dispatch —
#: casting bigints through double would corrupt values past 2^53)
_KLL_SUFFIX = {"double": "double", "float": "float", "bigint": "bigint"}


def quantile_sketch_rollup(
    df: DataFrame,
    group_cols: "str | list[str]",
    value_col: str,
    k: int = 200,
) -> DataFrame:
    """Mergeable QUANTILE sketches (Apache DataSketches KLL): one binary
    ``qsketch`` per group over ``value_col`` — build per partition unit
    (day/batch), persist, and answer "p50/p95/p99 over any window"
    later by merging sketches (:func:`merge_quantile_sketches`) without
    rescanning history.  The quantile sibling of the HLL/theta distinct
    rollups; rank error ≈ 1.65/√k single-sided (~1.2% at the default
    k=200), and a sketch holding fewer than ~k values is still exact.

    The KLL natives are dtype-specific; the value column must be
    double, float, or bigint (exact-width dispatch — no silent casts).

    Scale shape: one partial-aggregable hash aggregate; a KB sketch per
    group crosses the shuffle.
    """
    dtype = dict(df.dtypes)[value_col]
    if dtype not in _KLL_SUFFIX:
        raise ValueError(
            f"quantile_sketch_rollup: {value_col} is {dtype}; KLL requires "
            "double, float, or bigint (cast explicitly if lossless)"
        )
    agg = getattr(F, f"kll_sketch_agg_{_KLL_SUFFIX[dtype]}")
    group = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    # the dtype AND the build k ride in the COLUMN NAME
    # (qsketch__<dtype>__k<k>): schema-only metadata the merge can read
    # without executing the plan, surviving parquet round-trips and
    # empty frames alike.  k must reach the merge: Spark's
    # kll_merge_agg_* with no k merges through a default-k=200 partial
    # buffer whenever the sketch table is multi-partition, silently
    # downgrading a k=800 build — and PARTITIONING-DEPENDENTLY
    # (coalesce(1) preserved 800; the shuffled path gave 200) — the
    # r12 instance of the theta-union default-parameter bug class
    # (pinned in test_sketch_params.py).
    return df.groupBy(*group).agg(
        agg(value_col, F.lit(int(k))).alias(
            f"qsketch__{_KLL_SUFFIX[dtype]}__k{int(k)}"
        )
    )


def _quantile_label(q: float) -> str:
    """Collision-free column label for a quantile: q50, q95, q999,
    q100 — exact fractional digits, never truncated (0.99 and 0.999
    must not both become "q99")."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile out of [0, 1]: {q}")
    if q == 1.0:
        return "q100"
    # shortest-roundtrip digits WITHOUT scientific notation: bare repr
    # of 1e-05 is "1e-05" (slices to a malformed "q-05"), while a fixed
    # .17f render turns 0.99 into "98999999999999999" — Decimal(repr)
    # keeps repr's shortest digits and formats them fixed-point
    from decimal import Decimal

    fixed = format(Decimal(repr(float(q))), "f")
    digits = (fixed.split(".", 1)[1] if "." in fixed else "0").rstrip("0") or "0"
    return "q" + (digits + "0" if len(digits) < 2 else digits)


def merge_quantile_sketches(
    sketches: DataFrame,
    quantiles: "Sequence[float]" = (0.5, 0.95, 0.99),
    group_cols: "str | list[str] | None" = None,
    k_override: "int | None" = None,
) -> DataFrame:
    """Merge KLL sketches (:func:`quantile_sketch_rollup`) and extract
    quantile values — per ``group_cols`` or one global row when None.
    Output: group cols + ``n`` (EXACT total count — KLL tracks n
    losslessly) + one ``qXX`` column per requested quantile (labels
    keep every fractional digit: 0.999 → ``q999``).  Costs slim sketch
    rows per group, never a data rescan.  The value dtype and build k
    come from the ``qsketch__<dtype>__k<k>`` column NAME — schema-only,
    so this never re-executes the upstream plan and an EMPTY sketch
    table flows through with the full (group cols + n + quantile)
    schema.

    Parameter propagation (the theta-union bug class, r12 instance):
    Spark's ``kll_merge_agg_*`` with no ``k`` merges through a
    default-k=200 partial-aggregation buffer whenever the sketch table
    spans multiple partitions — a k=800 rollup silently degraded to
    k=200 rank error, and the degradation was PARTITIONING-DEPENDENT
    (a coalesce(1) input kept k=800).  The merge therefore always pins
    ``k``: from the column name when present, else ``k_override``, else
    the build default 200 (legacy ``qsketch__<dtype>`` tables predating
    the name change — pinning 200 matches what the shuffled path
    already produced, now deterministically).  Pinned in
    test_sketch_params.py by parsing the merged sketch's serial header.
    """
    cands = [c for c in sketches.columns if c.startswith("qsketch__")]
    if len(cands) != 1:
        raise ValueError(
            "merge_quantile_sketches: expected exactly one qsketch__<dtype> "
            f"column (from quantile_sketch_rollup), found {cands}"
        )
    sketch_col = cands[0]
    parts = sketch_col.split("__")
    suffix = parts[1]
    if len(parts) >= 3 and parts[2].startswith("k"):
        k = int(parts[2][1:])
    elif k_override is not None:
        k = int(k_override)
    else:
        k = 200  # quantile_sketch_rollup's historical build default
    labels = [_quantile_label(q) for q in quantiles]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile labels: {labels}")
    merge = getattr(F, f"kll_merge_agg_{suffix}")
    get_q = getattr(F, f"kll_sketch_get_quantile_{suffix}")
    get_n = getattr(F, f"kll_sketch_get_n_{suffix}")
    merged_col = merge(sketch_col, F.lit(k)).alias("__m")
    if group_cols is None:
        base = sketches.agg(merged_col)
    else:
        group = (
            [group_cols] if isinstance(group_cols, str) else list(group_cols)
        )
        base = sketches.groupBy(*group).agg(merged_col)
    return base.select(
        *[c for c in base.columns if c != "__m"],
        get_n(F.col("__m")).alias("n"),
        *[
            get_q(F.col("__m"), F.lit(float(q))).alias(lab)
            for q, lab in zip(quantiles, labels)
        ],
    )


def freq_sketch_rollup(
    df: DataFrame,
    group_cols: "str | list[str]",
    value_col: str,
    eps: float = 1e-3,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Mergeable FREQUENCY sketches (Spark's native Count-Min): one
    binary ``fsketch`` per group estimating per-item occurrence counts
    — the frequency sibling of the HLL/theta/KLL rollups, for when the
    key cardinality is too large for :func:`heavy_hitters`' exact
    hash-agg to be worth its shuffle and a bounded overestimate is
    acceptable (guarantee: estimate ≥ true count, ≤ true + eps·N with
    probability ``confidence``).

    Sketch size is ceil(2/eps) × ceil(log2(1/(1−confidence))) 8-byte
    counters (Spark's CountMinSketchImpl sizing), INDEPENDENT of both
    rows and distinct items — **~112 KB at the defaults** (eps=1e-3:
    width 2000 × depth 7; eps=1e-4 would be ~1.1 MB per sketch —
    budget per-group memory and merge fan-in accordingly before
    tightening eps); all sketches built with the same (eps,
    confidence, seed) merge exactly (:func:`merge_freq_sketches`
    driver-side, :func:`merge_freq_sketches_agg` executor-side; the
    streaming face is
    :func:`~..streaming.stream.stream_freq_sketch_maintain`).

    Scale shape: one partial-aggregable hash aggregate; a fixed-size
    sketch per group crosses the shuffle, never the values.
    """
    group = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return df.groupBy(*group).agg(
        F.count_min_sketch(
            value_col, F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("fsketch")
    )


def _read_cms(spark, sketch_bytes):
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)


def _cms_parse(b: bytes):
    """Parse Spark's ``CountMinSketchImpl`` wire format (public layout,
    verified byte-for-byte against a JVM round-trip in tests):
    ``version:int32, totalCount:int64, depth:int32, width:int32,
    hashA[depth]:int64, table[depth*width]:int64`` — all big-endian.
    Returns ``(total, depth, width, hashA bytes, table int64 ndarray)``.
    """
    import struct

    import numpy as np

    version, total, depth, width = struct.unpack(">iqii", b[:20])
    if version != 1:
        raise ValueError(f"unsupported CountMinSketch version {version}")
    ha_end = 20 + 8 * depth
    expected = ha_end + 8 * depth * width
    if len(b) != expected:
        raise ValueError(
            f"CountMinSketch bytes: expected {expected} bytes for "
            f"depth={depth} width={width}, got {len(b)}"
        )
    table = np.frombuffer(b[ha_end:], dtype=">i8").astype(np.int64)
    return total, depth, width, b[20:ha_end], table


def _cms_merge_bytes(sketches: "list[bytes]") -> bytes:
    """Cell-wise Count-Min merge in numpy — pure Python, runs anywhere
    (driver or executor), no JVM round-trips.  All inputs must share
    (depth, width, hashA), i.e. be built with one (eps, confidence,
    seed) — anything else raises rather than silently mis-merging."""
    import struct

    import numpy as np

    if not sketches:
        raise ValueError("merge_freq_sketches: no sketches given")
    total, depth, width, hash_a, acc = _cms_parse(bytes(sketches[0]))
    for sk in sketches[1:]:
        t2, d2, w2, h2, tab2 = _cms_parse(bytes(sk))
        if (d2, w2) != (depth, width) or h2 != hash_a:
            raise ValueError(
                "merge_freq_sketches: incompatible sketches — all inputs "
                "must be built with the same (eps, confidence, seed)"
            )
        total += t2
        acc += tab2
    return (
        struct.pack(">iqii", 1, total, depth, width)
        + hash_a
        + acc.astype(">i8").tobytes()
    )


def merge_freq_sketches(spark, sketch_bytes_list) -> bytes:
    """Merge Count-Min sketches built with identical (eps, confidence,
    seed) into one: counters add cell-wise, so the merged sketch
    answers queries over the union of the inputs exactly as a
    single-pass sketch would (byte-identical — asserted in tests).

    Runs driver-side in numpy (one vectorized add per sketch, no JVM
    round-trips), fine for thousands of ~112 KB sketches; for
    cluster-scale fan-in or grouped merges use
    :func:`merge_freq_sketches_agg`, which reduces executor-side.
    ``spark`` is unused (kept for API stability).
    """
    return _cms_merge_bytes(list(sketch_bytes_list))


def merge_freq_sketches_agg(
    sketches: DataFrame,
    group_cols: "str | list[str] | None" = None,
    sketch_col: str = "fsketch",
    fan_in: int = 64,
) -> DataFrame:
    """EXECUTOR-side Count-Min merge (the distributed face of
    :func:`merge_freq_sketches`): merge the ``sketch_col`` binary
    sketches per ``group_cols`` — or into one global row when None —
    producing the same wire bytes a single-pass sketch over the
    concatenated data would (cell-wise adds commute and associate
    exactly, so grouping/partition order is irrelevant; asserted
    byte-identical in tests).

    Spark has no SQL merge aggregate for CMS, so the reduce runs as
    Arrow-batched ``applyInPandas`` over the sketch BYTES (numpy adds
    — never a py4j loop, never a driver collect).  The global path is
    a two-level tree: partitions pre-merge into ``fan_in`` salted
    partials, then one task folds those — so no single task ever holds
    more than max(partition sketch count, fan_in) sketches, removing
    the driver fan-in cap the py4j merge had.  Grouped merges reduce
    each group in one task (a year of daily sketches = 365 × ~112 KB —
    bounded by the rollup cadence, not the data).
    """
    import pandas as pd

    keys = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols or [])
    )

    def make_merge(key_cols):
        def merge_pdf(pdf: "pd.DataFrame") -> "pd.DataFrame":
            merged = _cms_merge_bytes([bytes(x) for x in pdf[sketch_col]])
            out = {k: [pdf[k].iloc[0]] for k in key_cols}
            out[sketch_col] = [merged]
            return pd.DataFrame(out)

        return merge_pdf

    if keys:
        merge_pdf = make_merge(keys)
        slim = sketches.select(*keys, sketch_col)
        fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in slim.schema.fields
        )
        return slim.groupBy(*keys).applyInPandas(merge_pdf, fields)

    # global merge: salt → fan_in partials → one final fold
    merge_pdf = make_merge(["__salt"])
    salted = sketches.select(
        (F.spark_partition_id() % F.lit(int(fan_in))).alias("__salt"),
        sketch_col,
    )
    partials = salted.groupBy("__salt").applyInPandas(
        merge_pdf, f"__salt int, {sketch_col} binary"
    )
    final = partials.withColumn("__salt", F.lit(0))
    return final.groupBy("__salt").applyInPandas(
        merge_pdf, f"__salt int, {sketch_col} binary"
    ).drop("__salt")


def freq_sketch_estimate(spark, sketch_bytes, items) -> dict:
    """Point-query a Count-Min sketch: estimated occurrence count per
    item (driver-side, bounded by ``len(items)``).  Estimates are
    never under the true count; overestimates are bounded by eps·N
    with the sketch's confidence.
    """
    cms = _read_cms(spark, sketch_bytes)
    return {it: int(cms.estimateCount(it)) for it in items}
