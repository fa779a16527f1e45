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
