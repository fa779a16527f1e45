"""Core projection operators: PROJECT / EXTEND / RESTRUCTURE / CHECKPOINT.

Reference semantics (SURVEY.md §2.1; compiler/.../operator/core/
ProjectionOperatorsCompiler.scala:41-143):

- PROJECT     — copy the intersection of fields into a *narrower* target
                type; every target field must exist in the source.
- EXTEND      — copy into a *wider* target type; fields absent from the
                source are initialized to null.
- RESTRUCTURE — copy to an arbitrary target type: shared fields copied,
                new fields null, extra source fields dropped.

On Spark these are pure ``select`` projections — Catalyst collapses and
column-prunes them, and the parquet scan reads only the surviving columns
(verify via ``ReadSchema`` in ``df.explain("formatted")``), so at 100 TB a
PROJECT costs only the bytes of the kept columns.

CHECKPOINT (planner/.../SparkPlanning.java:479-489) forces a
materialization boundary in the reference plan.  Catalyst/AQE stages
automatically, so the default is a no-op lineage marker; ``mode`` selects
``persist`` (cache) or ``local_checkpoint`` (truncate lineage — useful in
iterative flows where lineage would otherwise grow without bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.storagelevel import StorageLevel


def _field_map(schema: T.StructType) -> dict[str, T.DataType]:
    return {f.name: f.dataType for f in schema.fields}


def project(df: DataFrame, target: T.StructType) -> DataFrame:
    """PROJECT: narrow ``df`` to ``target``'s fields (all must exist)."""
    src = _field_map(df.schema)
    missing = [f.name for f in target.fields if f.name not in src]
    if missing:
        raise ValueError(f"project: target fields missing from source: {missing}")
    return df.select(*[F.col(f.name).cast(f.dataType) for f in target.fields])


def extend(df: DataFrame, target: T.StructType) -> DataFrame:
    """EXTEND: widen ``df`` to ``target``; new fields become null."""
    src = _field_map(df.schema)
    dropped = [n for n in src if n not in {f.name for f in target.fields}]
    if dropped:
        raise ValueError(f"extend: target must be a superset; would drop: {dropped}")
    return restructure(df, target)


def restructure(df: DataFrame, target: T.StructType) -> DataFrame:
    """RESTRUCTURE: arbitrary re-type — shared fields copied, new null."""
    src = _field_map(df.schema)
    cols = []
    for f in target.fields:
        if f.name in src:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def checkpoint(
    df: DataFrame, mode: str = "none", storage: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """CHECKPOINT: stage/materialization boundary.

    ``mode``: ``"none"`` (trust AQE staging), ``"persist"`` (cache for
    fan-out reuse), ``"local_checkpoint"`` (truncate lineage).
    """
    if mode == "none":
        return df
    if mode == "persist":
        return df.persist(storage)
    if mode == "local_checkpoint":
        return df.localCheckpoint(eager=False)
    raise ValueError(f"checkpoint: unknown mode {mode!r}")


def confluent(frames, ordering=()):
    """CONFLUENT: n-way union of datasets with the same schema
    (reference: merge-sorted union of co-partitioned RDDs,
    runtime/.../rdd/package.scala:47-69).

    Spark mapping: ``unionByName`` — Catalyst unions lineages without any
    extra shuffle; when a downstream operator needs per-partition order
    (the reference's merge-sort contract), pass ``ordering`` to re-sort
    within partitions (Tungsten sort, spillable, no shuffle).
    """
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    if ordering:
        cols = [F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in ordering]
        out = out.sortWithinPartitions(*cols)
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: "str | list[str]",
    op_col: str = "__op",
    include_old: bool = False,
) -> DataFrame:
    """Derive a CDC change set from two snapshots of the same dataset —
    the INVERSE of the ``merge_upsert`` sink: one row per changed key
    with ``op_col`` ∈ {'I','U','D'} and the NEW payload ('D' rows carry
    the old payload; unchanged keys are omitted entirely).

    The missing half of the CDC loop: systems that only publish full
    snapshots (nightly dumps, upstream tables without change feeds)
    diff here, then apply downstream with
    ``merge_upsert(..., delete_col=)`` — `diff ∘ apply` reproduces the
    new snapshot exactly (property-tested).

    Column contract: both frames must share the (key + payload) schema;
    comparison is null-safe per column (NULL == NULL is "unchanged").

    ``include_old=True`` additionally emits the BEFORE-image of every
    payload column as ``__old_<c>`` (null on 'I' rows) — the input
    contract of :func:`apply_agg_delta`, which needs old values to
    subtract a changed row's prior contribution.

    Scale shape: one full-outer sort-merge join on the key — the
    textbook snapshot-diff cost (both sides shuffle once on the key;
    with both snapshots stored via ``write_bucketed`` on the key the
    Exchanges vanish entirely).  The change classification is a
    projection; output size is the churn, not the table.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in new.columns if c not in keys]
    if sorted(old.columns) != sorted(new.columns):
        raise ValueError(
            f"snapshot_diff: schema mismatch {sorted(old.columns)} vs "
            f"{sorted(new.columns)}"
        )
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in payload],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in payload],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    # presence via explicit markers, NOT key-null probes — a key column
    # may legitimately hold NULL (the eqNullSafe join matches it)
    in_old = F.coalesce(F.col("__in_old"), F.lit(False))
    in_new = F.coalesce(F.col("__in_new"), F.lit(False))
    same = None
    for c in payload:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)
    if same is None:
        same = F.lit(True)  # key-only dataset: presence IS the payload
    op = (
        F.when(in_old & in_new & same, F.lit(None))
        .when(in_old & in_new, F.lit("U"))
        .when(in_new, F.lit("I"))
        .otherwise(F.lit("D"))
    )
    out_cols = [
        F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col(op_col) == "D", F.col(f"__o_{c}"))
        .otherwise(F.col(f"__n_{c}"))
        .alias(c)
        for c in payload
    ]
    if include_old:
        out_cols += [
            F.when(F.col(op_col) == "I", F.lit(None))
            .otherwise(F.col(f"__o_{c}"))
            .alias(f"__old_{c}")
            for c in payload
        ]
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*out_cols, F.col(op_col))
    )


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key: "str | list[str]",
    effective_col: str,
    op_col: str = "__op",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply a CDC change set to a slowly-changing-dimension TYPE-2
    history: each change closes the key's open version at its effective
    time and (for I/U) opens a new version — the standard
    valid_from/valid_to/is_current dimension layout that lets fact
    queries join "the dimension row as of the fact's timestamp" via
    :func:`asof_join`.

    ``history`` holds (key, payload, valid_from, valid_to,
    is_current) rows — closed rows have a non-null ``valid_to`` and are
    immutable.  ``changes`` holds (key, payload, effective, op) rows
    with op ∈ {'I','U','D'} (``snapshot_diff`` output + a timestamp
    works directly).  Multiple changes per key per batch are applied in
    ``effective_col`` order; (key, effective) pairs must be unique.

    Scale shape: closed history rows pass through UNTOUCHED (no
    shuffle, no rewrite — at 100 TB the closed majority of a dimension
    is never re-processed); only open rows ∪ changes take one key
    shuffle, where a single ``lead()`` window per key chains the
    versions: each version's ``valid_to`` is the next version's
    ``valid_from``; 'D' changes participate as boundaries (they close
    their predecessor) and are then dropped.  Output size = closed rows
    + open rows + net new versions.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = [
        c
        for c in history.columns
        if c not in keys + [valid_from, valid_to, current_col]
    ]
    missing = [c for c in keys + payload + [effective_col, op_col]
               if c not in changes.columns]
    if missing:
        raise ValueError(f"scd2_apply: changes missing columns {missing}")

    closed = history.filter(F.col(valid_to).isNotNull())
    open_rows = history.filter(F.col(valid_to).isNull()).select(
        *keys,
        *payload,
        F.col(valid_from),
        F.lit(False).alias("__tombstone__"),
    )
    chg = changes.select(
        *keys,
        *payload,
        F.col(effective_col).alias(valid_from),
        (F.col(op_col) == "D").alias("__tombstone__"),
    )
    seg = open_rows.unionByName(chg)

    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(valid_from).asc())
    chained = seg.withColumn(valid_to, F.lead(valid_from).over(w))
    kept = chained.filter(~F.col("__tombstone__")).drop("__tombstone__")
    versioned = kept.withColumn(current_col, F.col(valid_to).isNull())
    return closed.select(
        *keys, *payload, valid_from, valid_to, current_col
    ).unionByName(
        versioned.select(*keys, *payload, valid_from, valid_to, current_col)
    )


def apply_agg_delta(
    base: DataFrame,
    changes: DataFrame,
    group_key: "str | list[str]",
    sums: "dict[str, str]",
    count_col: str = "n",
    op_col: str = "__op",
    old_prefix: str = "__old_",
) -> DataFrame:
    """Incremental aggregate maintenance: update a materialized
    per-key (COUNT + decimal SUMs) aggregate from a CDC change set
    WITHOUT rescanning the base table — cost ∝ churn, not table size.

    ``base`` holds one row per group key with ``count_col`` and the
    ``sums`` output columns (as produced by a previous full aggregate
    or a previous delta application).  ``changes`` rows carry op ∈
    {'I','U','D'}, the NEW payload, and for U/D the before-image in
    ``old_prefix``-prefixed columns (``snapshot_diff(...,
    include_old=True)`` emits exactly this).  ``sums`` maps output
    column → source payload column.

    Per group the delta is one map-side-combinable aggregate:
    Δcount = ΣI − ΣD;  Δsum = Σ(I: +new, D: −old, U: new − old),
    accumulated in exact decimal so delta-application is bit-identical
    to a full recompute (the correctness contract: maintained ≡
    recomputed, which the oracle checks).  Groups whose count reaches 0
    vanish, new groups appear — a full-outer null-safe merge on the
    slim (key → aggregates) frames, never touching base facts.

    A change that MOVES a row across group keys must be expressed as
    D(old group) + I(new group) — the snapshot_diff contract already
    does this when the group key is part of the diff key.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    # insert-only change feeds (append streams) carry no before-images;
    # materialize the old columns as typed NULLs so the U/D branches
    # resolve (they are never taken on 'I' rows)
    for src in sums.values():
        if old_prefix + src not in changes.columns:
            changes = changes.withColumn(
                old_prefix + src,
                F.lit(None).cast(changes.schema[src].dataType),
            )
    is_i = F.col(op_col) == "I"
    is_d = F.col(op_col) == "D"
    dec = "decimal(27,6)"
    aggs = [
        F.sum(F.when(is_i, 1).when(is_d, -1).otherwise(0)).alias("__dn__")
    ]
    for out, src in sums.items():
        new_v = F.col(src).cast(dec)
        old_v = F.col(old_prefix + src).cast(dec)
        aggs.append(
            F.sum(
                F.when(is_i, new_v)
                .when(is_d, -old_v)
                .otherwise(new_v - old_v)
            ).alias(f"__ds_{out}__")
        )
    delta = changes.groupBy(*keys).agg(*aggs)

    b = base.select(
        *[F.col(k).alias(f"__bk_{k}") for k in keys],
        F.col(count_col).alias("__bn__"),
        *[F.col(out).cast(dec).alias(f"__bs_{out}__") for out in sums],
    )
    cond = None
    for k in keys:
        c = F.col(f"__bk_{k}").eqNullSafe(F.col(k))
        cond = c if cond is None else (cond & c)
    merged = b.join(delta, cond, "full_outer")
    zero = F.lit(0)
    n_new = F.coalesce(F.col("__bn__"), zero) + F.coalesce(F.col("__dn__"), zero)
    out_cols = [
        F.coalesce(F.col(k), F.col(f"__bk_{k}")).alias(k) for k in keys
    ] + [n_new.cast("long").alias(count_col)] + [
        (
            F.coalesce(F.col(f"__bs_{out}__"), F.lit(0).cast(dec))
            + F.coalesce(F.col(f"__ds_{out}__"), F.lit(0).cast(dec))
        ).alias(out)
        for out in sums
    ]
    return merged.select(*out_cols).filter(F.col(count_col) > 0)


def unpivot(
    df: DataFrame,
    id_cols: "list[str]",
    value_cols: "list[str]",
    var_name: str = "variable",
    value_name: str = "value",
    cast: "str | None" = "double",
) -> DataFrame:
    """UNPIVOT/melt — the inverse of the pivot aggregate: widen-by-
    column measures become (variable, value) rows, one output row per
    input row per measure.

    Pure projection + generator (``stack``): no shuffle, no Python —
    at 100 TB this is a scan-shaped map with output ×len(value_cols).
    ``stack`` needs one common value type: ``cast`` (default double)
    coerces each measure; pass ``cast=None`` when the measures already
    share a type (e.g. all strings).
    """
    n = len(value_cols)
    if n == 0:
        raise ValueError("unpivot: value_cols must be non-empty")
    val = (lambda c: f"cast(`{c}` as {cast})") if cast else (lambda c: f"`{c}`")
    pairs = ", ".join(f"'{c}', {val(c)}" for c in value_cols)
    expr = f"stack({n}, {pairs}) as (`{var_name}`, `{value_name}`)"
    return df.select(*id_cols, F.expr(expr))


def flatten_struct(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten struct columns into top-level columns named
    ``parent<sep>child`` — the ingestion normalizer for nested sources
    (JSON, avro, protobuf-derived parquet).

    Pure projection: column pruning still reaches the scan (reading
    one flattened leaf reads one parquet column), no shuffle, no
    Python.  Arrays are left intact (explode is a semantic choice, not
    a flattening)."""
    from pyspark.sql import types as T

    def leaves(prefix_expr, prefix_name, dtype):
        if isinstance(dtype, T.StructType):
            out = []
            for f in dtype.fields:
                out += leaves(
                    prefix_expr + "." + f.name,
                    prefix_name + sep + f.name,
                    f.dataType,
                )
            return out
        return [(prefix_expr, prefix_name)]

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            for expr, name in leaves(f.name, f.name, f.dataType):
                cols.append(F.col(expr).alias(name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
