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
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*out_cols, F.col(op_col))
    )
