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

import glob
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_FORMATS = {"parquet", "orc", "csv", "tsv", "json", "text"}

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"


def _first_parquet_file(path: str) -> str | None:
    """Resolve a path/dir/glob to one representative parquet data file
    (local filesystem only — used for footer inspection)."""
    p = path[5:] if path.startswith("file:") else path
    if any(ch in p for ch in "*?["):
        hits = sorted(glob.glob(p))
    elif os.path.isdir(p):
        hits = sorted(glob.glob(os.path.join(p, "*.parquet"))) or sorted(
            f for f in glob.glob(os.path.join(p, "part-*")) if not f.endswith(".crc")
        )
    else:
        hits = [p]
    for h in hits:
        if os.path.isfile(h):
            return h
    return None


def _nanos_columns(paths: Sequence[str]) -> set[str] | None:
    """Columns that are TIMESTAMP(NANOS) per the parquet footer, or None
    when no footer is locally readable (remote URI)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat
    except ImportError:  # pragma: no cover
        return None
    cols: set[str] = set()
    found = False
    for path in paths:
        f = _first_parquet_file(path)
        if f is None:
            continue
        try:
            schema = pq.read_schema(f)
        except Exception:
            continue
        found = True
        for field in schema:
            if pat.is_timestamp(field.type) and field.type.unit == "ns":
                cols.add(field.name)
    return cols if found else None


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet source, tolerant of TIMESTAMP(NANOS) columns.

    Spark rejects INT64 TIMESTAMP(NANOS) parquet columns by default.  The
    fast path is a plain read; on failure the nanos columns are identified
    from the parquet FOOTER (pyarrow), the legacy read flag is flipped only
    for the duration of relation resolution (the conf is consulted when the
    relation resolves, so restoring it immediately afterwards is safe —
    later reads in the same session see the original value), and every
    affected column is rebuilt to a µs timestamp.  Sub-µs precision is
    truncated — Spark timestamps are µs-resolution (SURVEY §7 boundary
    semantics; the reference's DateTimeOption is seconds-resolution, so µs
    strictly widens it).
    """
    nanos = _nanos_columns(paths)
    if not nanos:
        try:
            df = spark.read.parquet(*paths)
            df.schema  # force schema resolution
            return df
        except Exception:
            if nanos is not None:
                raise  # footer was readable and showed no nanos: a real error
            # footer not locally readable (remote URI) and the plain read
            # rejected the file — assume nanos under the historical `ts`
            # event-time convention
            nanos = {"ts"}
    prev = spark.conf.get(_NANOS_FLAG, None)
    spark.conf.set(_NANOS_FLAG, "true")
    try:
        df = spark.read.parquet(*paths)
        df.schema  # resolve the relation while the flag is set
    finally:
        if prev is None:
            spark.conf.unset(_NANOS_FLAG)
        else:
            spark.conf.set(_NANOS_FLAG, prev)
    rebuilds = {
        c: F.timestamp_micros(F.expr(f"`{c}` div 1000"))  # int div: double rounds at ns
        for c in nanos
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType)
    }
    if rebuilds:
        df = df.withColumns(rebuilds)
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
