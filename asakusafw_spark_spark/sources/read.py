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

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"


def _first_parquet_file(spark: SparkSession, path: str):
    """Resolve a path/dir/glob to one representative parquet data file,
    as a Hadoop ``Path`` — resolved through ``Path.getFileSystem`` so the
    SAME code path serves ``file://``, ``hdfs://`` and ``s3a://`` (the
    reference reads everything through Hadoop streams,
    runtime/.../graph/TemporaryInput.scala:32-49)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path
    conf = spark._jsc.hadoopConfiguration()
    p = jpath(path)
    fs = p.getFileSystem(conf)
    if any(ch in path for ch in "*?["):
        statuses = list(fs.globStatus(p) or [])
    else:
        if not fs.exists(p):
            return None
        st = fs.getFileStatus(p)
        if st.isFile():
            return st.getPath()  # explicit file: no name filtering
        statuses = [st]
    files = []
    for st in statuses:
        if st.isDirectory():
            files.extend(fs.listStatus(st.getPath()))
        else:
            files.append(st)
    for st in sorted(files, key=lambda s: s.getPath().getName()):
        name = st.getPath().getName()
        if not st.isFile() or name.startswith(("_", ".")):
            continue
        if name.endswith(".parquet") or name.startswith("part-"):
            return st.getPath()
    return None


def _nanos_columns(spark: SparkSession, paths: Sequence[str]) -> set[str] | None:
    """Columns that are TIMESTAMP(NANOS) per the parquet footer, or None
    when no footer could be read for any path.

    The footer is read through ``parquet-mr``'s ``ParquetFileReader``
    over ``HadoopInputFile`` (ranged Hadoop-stream reads — only the
    footer bytes travel), so detection works identically on local and
    remote filesystems; there is no filename-convention fallback.
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    cols: set[str] = set()
    found = False
    for path in paths:
        jp = _first_parquet_file(spark, path)
        if jp is None:
            continue
        try:
            in_file = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                jp, conf
            )
            reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(in_file)
            try:
                schema = reader.getFooter().getFileMetaData().getSchema()
                for i in range(schema.getFieldCount()):
                    t = schema.getType(i)
                    lt = t.getLogicalTypeAnnotation()
                    if (
                        lt is not None
                        and lt.getClass().getSimpleName()
                        == "TimestampLogicalTypeAnnotation"
                        and lt.getUnit().toString() == "NANOS"
                    ):
                        cols.add(t.getName())
            finally:
                reader.close()
        except Exception:
            continue
        found = True
    return cols if found else None


def read_parquet(spark: SparkSession, *paths: str) -> DataFrame:
    """Parquet source, tolerant of TIMESTAMP(NANOS) columns.

    Modern Spark (4.1+) reads INT64 TIMESTAMP(NANOS) natively as a
    µs-truncated TIMESTAMP_NTZ, so the fast path is a plain read.  Older
    Sparks reject the type outright; on failure the nanos columns are
    identified from the parquet FOOTER — read through Hadoop streams
    (:func:`_nanos_columns`), so local and remote URIs get identical
    treatment — the legacy read flag is flipped only for the duration of
    relation resolution (the conf is consulted when the relation
    resolves, so restoring it immediately afterwards is safe), and every
    affected column is rebuilt from its raw-nanos long to a µs
    TIMESTAMP_NTZ.  Either way sub-µs precision is truncated — Spark
    timestamps are µs-resolution (SURVEY §7 boundary semantics; the
    reference's DateTimeOption is seconds-resolution, so µs strictly
    widens it).

    Type contract (both paths, any Spark version, any session timezone):
    a parquet TIMESTAMP(NANOS) column surfaces as **TIMESTAMP_NTZ
    holding the naive UTC wall-clock**, exactly what the 4.1+ native
    read produces.  The legacy rebuild routes through
    ``from_utc_timestamp(instant, session_tz).cast(ntz)`` so the naive
    value is UTC-anchored even in non-UTC sessions.
    """
    try:
        df = spark.read.parquet(*paths)
        df.schema  # force schema resolution
        return df
    except Exception:
        nanos = _nanos_columns(spark, paths)
        if not nanos:
            raise  # footer shows no nanos column: a real error
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
    return _rebuild_nanos_ntz(spark, df, nanos)


def _rebuild_nanos_ntz(spark: SparkSession, df: DataFrame, nanos) -> DataFrame:
    """Rebuild raw-nanos LONG columns (legacy ``nanosAsLong`` read) to the
    same TIMESTAMP_NTZ the Spark 4.1+ native read produces: naive UTC
    wall-clock, µs-truncated.
    """
    tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
    rebuilds = {
        # int div (not /1000.0): double rounds at ns.  timestamp_micros
        # gives the instant i; the NTZ cast renders in session tz
        # (naive = instant + offset(tz)), so pre-shifting by
        # to_utc_timestamp (instant − offset) makes the naive value i's
        # UTC wall-clock in ANY session timezone — identical to the 4.1
        # native NTZ read.  (Offsets are instant-dependent: exact under
        # fixed-offset zones incl. UTC; DST-transition wall times in
        # zoned sessions can land in the 1-hour ambiguity window.)
        c: F.to_utc_timestamp(
            F.timestamp_micros(F.expr(f"`{c}` div 1000")), tz
        ).cast("timestamp_ntz")
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


def hadoop_input_newapi(
    spark: SparkSession,
    input_format_class: str,
    paths: str | Sequence[str],
    key_class: str = "org.apache.hadoop.io.LongWritable",
    value_class: str = "org.apache.hadoop.io.Text",
    schema: T.StructType | str = "key bigint, value string",
    to_row=None,
    conf: dict | None = None,
    key_converter: str | None = None,
    value_converter: str | None = None,
) -> DataFrame:
    """The TRUE arbitrary-``mapreduce.InputFormat`` door
    (runtime/.../graph/NewHadoopInput.scala:1-76 accepts any
    ``InputFormat[K, V]`` class plus a Configuration): reads through
    ``sc.newAPIHadoopFile`` with the given InputFormat/key/value
    classes, then adapts each ``(K, V)`` pair to a Row.

    ``to_row``  — optional ``(key, value) -> tuple`` adapter applied
                  per pair (defaults to the identity 2-tuple, matching
                  the default ``key/value`` schema).  Writable K/V are
                  already converted to Python primitives by Spark's
                  built-in converters (LongWritable → int, Text → str);
                  for custom Writables pass ``key_converter`` /
                  ``value_converter`` — JVM class names of
                  ``org.apache.spark.api.python.Converter``
                  implementations, forwarded verbatim to
                  ``sc.newAPIHadoopFile``.
    ``schema``  — the Row schema AFTER adaptation.  Required knowledge:
                  RDD-boundary reads have no schema to infer from.

    Scale shape: this is deliberately an RDD-boundary COMPATIBILITY
    hatch, exactly like the reference node (whose purpose is legacy
    InputFormats) — splits parallelize across executors via the
    InputFormat's own ``getSplits``, but there is no column pruning or
    predicate pushdown and rows cross the Python boundary once.  Use
    :func:`hadoop_input` (DataSource) or :func:`direct_input` for
    anything with a native reader; reach for this only when the format
    exists solely as a Hadoop InputFormat class.
    """
    if not isinstance(paths, str):
        # FileInputFormat.setInputPaths takes a comma-joined list
        paths = ",".join(paths)
    rdd = spark.sparkContext.newAPIHadoopFile(
        paths, input_format_class, key_class, value_class,
        keyConverter=key_converter, valueConverter=value_converter,
        conf=conf or {},
    )
    if to_row is not None:
        rdd = rdd.map(lambda kv: to_row(kv[0], kv[1]))
    return spark.createDataFrame(rdd, schema)


def direct_input_fixed_width(
    spark: SparkSession,
    paths: str | Sequence[str],
    fields: "Sequence[tuple[str, int] | tuple[str, int, str]]",
    trim: bool = True,
    empty_as_null: bool = True,
) -> DataFrame:
    """Fixed-width text reader — the remaining legacy line format the
    Direct I/O surface didn't cover (reference DirectInput handles
    delimited text; mainframe-style exports are fixed-column).  Each
    ``fields`` entry is ``(name, width)`` or ``(name, width, cast_type)``;
    columns are cut by CHARACTER position in declaration order,
    optionally trimmed, with all-blank fields read as NULL (regardless
    of ``trim`` — blankness is judged on the trimmed cut either way).

    Widths are CHARACTERS, not bytes: correct for ASCII and for files
    whose layout was defined in characters.  A file whose layout is
    fixed BYTE widths and which contains multi-byte UTF-8 characters
    would mis-align from the first such character — decode that with a
    binary-aware reader (``spark.read.format("binaryFile")`` +
    ``mapInPandas`` byte slicing), not this one.

    Scale shape: one ``text`` scan + pure substring/trim/cast
    projections — scan-stage only, no shuffle, no Python; splittable
    like any line-oriented input.
    """
    if not fields:
        raise ValueError("direct_input_fixed_width: fields must be non-empty")
    if isinstance(paths, str):
        paths = [paths]
    lines = spark.read.text(list(paths))
    cols = []
    pos = 1  # substring() is 1-based
    for spec in fields:
        name, width = spec[0], int(spec[1])
        cast_to = spec[2] if len(spec) > 2 else None
        raw = F.substring(F.col("value"), pos, width)
        c = F.trim(raw) if trim else raw
        if empty_as_null:
            # judge blankness on the TRIMMED cut so all-space fields are
            # NULL even with trim=False (the docstring's contract)
            c = F.when(F.trim(raw) == "", F.lit(None)).otherwise(c)
        if cast_to:
            c = c.cast(cast_to)
        cols.append(c.alias(name))
        pos += width
    return lines.select(*cols)
