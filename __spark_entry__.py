"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (smoke, sf0.001).
``queries()``    — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query.

Float determinism policy: any SUM over doubles is computed as an exact
DECIMAL sum of the per-row expression (the per-row double arithmetic is
IEEE-identical in Spark and DuckDB) and cast back to DOUBLE at the end,
so Spark's parallel reduction order cannot perturb the value-hash.
DuckDB's SUM(INTEGER) returns HUGEINT, so integer sums are cast to
BIGINT on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from asakusafw_spark_spark.operators import (  # noqa: E402
    branch,
    checkpoint,
    cogroup,
    confluent,
    convert,
    distinct_records,
    extend,
    extract,
    fold,
    group_sort,
    logging_op,
    running_agg,
    sessionize_batch,
    master_branch,
    master_check,
    master_join,
    master_join_update,
    MasterSelection,
    project,
    rank_in_group,
    restructure,
    split,
    summarize,
    top_k_per_group,
    update,
    Grouping,
)
from asakusafw_spark_spark.operators.record import assemble_branches  # noqa: E402
from asakusafw_spark_spark.schema import record_type  # noqa: E402
from asakusafw_spark_spark.functions import (  # noqa: E402
    token_count,
    lang_id,
    quality_score,
    fingerprint,
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_groups,
    brute_force_topk,
    lsh_ann_topk,
    cosine_near_dup,
)
from asakusafw_spark_spark.functions.dedup import (  # noqa: E402
    MERSENNE_P,
    _affine_params,
)
from asakusafw_spark_spark.functions.similarity import _plane_component  # noqa: E402
from asakusafw_spark_spark.functions.text import STOPWORDS  # noqa: E402
from asakusafw_spark_spark.sources import read_parquet  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # read_parquet footer-detects TIMESTAMP(NANOS) columns (events.ts),
    # scopes the legacy-read flag to relation resolution, and rebuilds them
    # to µs timestamps — no session conf left flipped.
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def _dsum(col, scale: int = 6):
    """Order-insensitive double sum: exact decimal accumulate → double.

    Domain contract (r15 ADVICE): try_cast to decimal(27,scale) nulls
    NaN/±Inf and any finite |x| >= 1e21 (decimal overflow, e.g.
    DBL_MAX) — those values are OMITTED from the sum on both engine and
    oracle (TRY_CAST twin).  Widen the decimal where magnitudes can
    legitimately reach 1e21.
    """
    return F.sum(col.try_cast(f"decimal(27,{scale})")).cast("double")


def _ps_cte() -> str:
    """DuckDB CTE body for the deterministically synthesized partsupp
    relation (sources/tpch.py) — the oracle twin of _partsupp()."""
    from asakusafw_spark_spark.sources.tpch import partsupp_cte

    return partsupp_cte()


# Declared event-time analysis window (r15 extreme-ts contract): every
# watermark-driven streaming query and every gap-filling / session batch
# analytic validates event time into THIS window before the watermark /
# grid materialization — one rogue year-0001/9999 timestamp otherwise
# advances the watermark (dropping later micro-batches / stream-stream
# join matches nondeterministically) or materializes a ten-millennium
# hourly grid.  Centralized (r15 ADVICE): the Spark side and every
# DuckDB twin must share ONE definition, or a future corpus drifts out
# of the window silently on BOTH sides while the gate stays green.
# tests/test_streaming.py lints every registered streaming query
# against this contract.
EVENT_TIME_LO = "2023-01-01"
EVENT_TIME_HI = "2026-01-01"

_EVENT_WINDOW_SEQ = 0


def _event_window_sql(col: str = "ts") -> str:
    """DuckDB-twin predicate for the declared event-time window."""
    return (
        f"{col} >= TIMESTAMP '{EVENT_TIME_LO}' "
        f"AND {col} < TIMESTAMP '{EVENT_TIME_HI}'"
    )


def _stage_events(sf: str, stage: str) -> None:
    """Stage the events table into a streaming source directory.

    A corpus table is ONE ``events.parquet`` file on the tidy gates but
    a DIRECTORY of part files on the chaos-layout gate (r16) — real
    ingest layouts are many small files.  Directory parts are flattened
    into ``stage`` under unique names so the schema-declared file
    stream reads them without partition-discovery semantics.
    """
    import glob as _glob
    import shutil as _shutil

    src = f"{sf}/events.parquet"
    if os.path.isdir(src):
        for i, p in enumerate(sorted(_glob.glob(f"{src}/**/*.parquet",
                                                recursive=True))):
            _shutil.copy(p, f"{stage}/events_{i:05d}.parquet")
    else:
        _shutil.copy(src, f"{stage}/events.parquet")


def _stage_split_feed(df: DataFrame, split_col, values, feed: str) -> None:
    """Stage ``df`` into a streaming feed directory as ONE parquet file
    per split value with a single partitionBy pass (r17, guide §6): one
    scan + one write job, replacing one filtered ``coalesce(1)`` write
    per micro-batch (each a full re-scan of the source).

    Equivalence with the old per-value ``filter(split_col == v)`` writes:
    rows whose split value is NULL or outside ``values`` land in other
    partition directories and are never copied (the old filters dropped
    them); a value with no rows produces no directory, so an empty
    placeholder file is written for it (the old empty-frame
    ``coalesce(1)`` write always produced a 0-row part file, and the
    trigger count must not depend on the data).  Row order WITHIN a file
    may differ from scan order (the dynamic-partition writer sorts by
    the partition key only) — callers must be order-insensitive folds;
    first-seen-semantics queries (streaming_dedup) use
    :func:`_stage_events`, not this helper.  File mtimes order the
    micro-batches (``maxFilesPerTrigger=1``).
    """
    import glob as _glob
    import shutil as _shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="feedstage_") + "/out"
    df.withColumn("__half__", split_col).repartition(1).write.partitionBy(
        "__half__"
    ).parquet(stage)
    for i, v in enumerate(values):
        dest = f"{feed}/{i:04d}.parquet"
        part = _glob.glob(f"{stage}/__half__={v}/part-*.parquet")
        if part:
            _shutil.copy(part[0], dest)
        else:
            empty = tempfile.mkdtemp(prefix="feedempty_") + "/out"
            df.where(F.lit(False)).coalesce(1).write.parquet(empty)
            _shutil.copy(_glob.glob(f"{empty}/part-*.parquet")[0], dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))


def _event_window(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Validated event time with a LOUD out-of-window audit.

    Attaches a named observation counting rows outside
    [EVENT_TIME_LO, EVENT_TIME_HI) — NULL event times included — before
    filtering them, so a corpus that outgrows the declared window
    surfaces as a non-zero ``out_of_window`` metric in the listener /
    Spark UI / StreamingQueryProgress instead of silently shrinking the
    engine AND its oracle twin together (r15 ADVICE: the mirrored
    literals made that failure invisible).  Works on batch and
    streaming frames (CollectMetrics supports both); the observation is
    a plan no-op for the data itself.
    """
    lo = F.lit(EVENT_TIME_LO).cast("timestamp")
    hi = F.lit(EVENT_TIME_HI).cast("timestamp")
    inside = (F.col(ts_col) >= lo) & (F.col(ts_col) < hi)
    global _EVENT_WINDOW_SEQ
    _EVENT_WINDOW_SEQ += 1
    df = df.observe(
        f"event_window_{_EVENT_WINDOW_SEQ}",
        F.sum((~F.coalesce(inside, F.lit(False))).cast("long")).alias(
            "out_of_window"
        ),
    )
    return df.filter(inside)


# ---------------------------------------------------------------------------
# Flagship: revenue per nation (scan → joins → aggregate), engine operators
# ---------------------------------------------------------------------------


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    # master_join chain: lineitem←orders←customer←nation (masters broadcast).
    # unique_master: all three master keys are PKs, so the per-master
    # min_by dedupe aggregate is pure overhead — skipping it removes one
    # shuffle per master (3 Exchanges total, r16; guide §2.4) and matches
    # the oracle twin (a plain JOIN) even more directly.
    li_ord = master_join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        [("o_orderkey", "l_orderkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    with_cust = master_join(
        customer.select("c_custkey", "c_nationkey"),
        li_ord,
        [("c_custkey", "o_custkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    with_nation = master_join(
        nation.select("n_nationkey", "n_name"),
        with_cust,
        [("n_nationkey", "c_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    rev = update(
        with_nation,
        revenue=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    return summarize(
        rev, ["n_name"], {"revenue": ("sum", "revenue"), "n_items": ("count", "revenue")}
    ).select("n_name", F.col("revenue").cast("double").alias("revenue"), "n_items")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Per-operator queries
# ---------------------------------------------------------------------------


def q_project(spark, sf):
    t = record_type({"l_orderkey": "long", "l_partkey": "long", "l_quantity": "double"})
    return project(_t(spark, sf, "lineitem"), t)


def q_extend(spark, sf):
    part = _t(spark, sf, "part")
    t = record_type(
        {
            "p_partkey": "long",
            "p_name": "string",
            "p_brand": "string",
            "p_type": "string",
            "p_size": "int",
            "p_retailprice": "double",
            "p_margin": "double",
        }
    )
    return extend(part, t)


def q_restructure(spark, sf):
    t = record_type({"c_custkey": "long", "c_mktsegment": "string", "c_score": "double"})
    return restructure(_t(spark, sf, "customer"), t)


def q_extract(spark, sf):
    li = _t(spark, sf, "lineitem")
    outs = extract(
        li,
        {
            "revenue": [
                F.col("l_orderkey"),
                F.col("l_linenumber"),
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            ],
        },
    )
    return outs["revenue"]


def q_update(spark, sf):
    orders = _t(spark, sf, "orders")
    return update(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        big=F.col("o_totalprice") > 200000.0,
        o_orderpriority=F.substring("o_orderpriority", 1, 1),
    )


def q_convert(spark, sf):
    orders = _t(spark, sf, "orders")
    outs = convert(
        orders,
        {
            "o_orderkey": F.col("o_orderkey"),
            "bucket": F.pmod(F.col("o_orderkey"), F.lit(7)).cast("long"),
        },
    )
    return outs["out"]


def q_branch(spark, sf):
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag")
    router = (
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_returnflag") == "A", "accepted")
        .otherwise("open")
    )
    outs = branch(li, router, ["returned", "accepted", "open"])
    return assemble_branches(outs)


def q_split(spark, sf):
    joined = master_join(
        _t(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey"),
        [("c_custkey", "o_custkey")],
    )["joined"]
    outs = split(joined, ["o_orderkey", "o_custkey"], ["c_mktsegment"])
    return outs["left"]


def q_master_join(spark, sf):
    out = master_join(
        _t(spark, sf, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [("c_custkey", "o_custkey")],
        mapping={
            "o_orderkey": "t.o_orderkey",
            "o_custkey": "t.o_custkey",
            "o_totalprice": "t.o_totalprice",
            "c_name": "m.c_name",
            "c_mktsegment": "m.c_mktsegment",
        },
    )
    return out["joined"]


def q_master_join_missed(spark, sf):
    # only customers with acctbal >= 5000 qualify as masters → real misses
    masters = _t(spark, sf, "customer").filter(F.col("c_acctbal") >= 5000.0)
    out = master_join(
        masters.select("c_custkey", "c_name"),
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey"),
        [("c_custkey", "o_custkey")],
    )
    return out["missed"]


def q_master_check_found(spark, sf):
    masters = _t(spark, sf, "part").filter(F.col("p_size") > 25)
    out = master_check(
        masters,
        _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey"),
        [("p_partkey", "l_partkey")],
        strategy="broadcast",
    )
    return out["found"]


def q_master_check_missed(spark, sf):
    masters = _t(spark, sf, "part").filter(F.col("p_size") > 25)
    out = master_check(
        masters,
        _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey"),
        [("p_partkey", "l_partkey")],
    )
    return out["missed"]


def q_master_branch(spark, sf):
    nation = _t(spark, sf, "nation")
    customer = _t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    router = (
        F.when(F.col("__m_n_regionkey").isNull(), "unknown")
        .when(F.col("__m_n_regionkey") <= 1, "west")
        .otherwise("east")
    )
    outs = master_branch(
        nation, customer, [("n_nationkey", "c_nationkey")], router, ["west", "east", "unknown"]
    )
    return assemble_branches(outs)


def q_master_join_update(spark, sf):
    out = master_join_update(
        _t(spark, sf, "customer").select("c_custkey", "c_acctbal"),
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [("c_custkey", "o_custkey")],
        updates={"o_totalprice": F.col("o_totalprice") + F.col("__m_c_acctbal")},
    )
    return out["updated"]


def q_master_selection_ordering(spark, sf):
    # multi-master groups: customers per nation; pick max acctbal (tie: min custkey)
    sel = MasterSelection(ordering=[("c_acctbal", "desc"), ("c_custkey", "asc")])
    out = master_join(
        _t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal"),
        _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey"),
        [("c_nationkey", "s_nationkey")],
        mapping={
            "s_suppkey": "t.s_suppkey",
            "best_custkey": "m.c_custkey",
            "best_acctbal": "m.c_acctbal",
        },
        selection=sel,
    )
    return out["joined"]


def q_hadoop_input_newapi(spark, sf):
    """The TRUE arbitrary-InputFormat door
    (runtime/.../graph/NewHadoopInput.scala): nation serialized to
    '|'-delimited text, read back through
    ``sc.newAPIHadoopFile("org.apache.hadoop.mapreduce.lib.input.
    TextInputFormat")`` — an actual Hadoop InputFormat class, not a
    DataSource name — with a (offset, line) → Row adapter and reparsed.
    Oracle: the original table (lossless roundtrip is the hatch's
    contract)."""
    import tempfile

    from asakusafw_spark_spark.sources import hadoop_input_newapi
    from asakusafw_spark_spark.sources.write import write_flat

    nation = _t(spark, sf, "nation")
    out = tempfile.mkdtemp(prefix="hadoop_newapi_") + "/nation_text"
    lines = nation.select(
        F.concat_ws(
            "|", F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")
        ).alias("value")
    )
    write_flat(lines, out, format="text")
    raw = hadoop_input_newapi(
        spark,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        out,
    )
    parts = F.split(F.col("value"), "\\|")
    return raw.select(
        parts.getItem(0).cast("long").alias("n_nationkey"),
        parts.getItem(1).alias("n_name"),
        parts.getItem(2).cast("long").alias("n_regionkey"),
    )


def q_hadoop_output_newapi(spark, sf):
    """The TRUE arbitrary-OutputFormat door — write symmetric of
    q_hadoop_input_newapi (runtime/.../graph/NewHadoopOutput.scala:84):
    a slim supplier projection written through
    ``saveAsNewAPIHadoopFile("org.apache.hadoop.mapreduce.lib.output.
    TextOutputFormat")`` — an actual Hadoop OutputFormat class with the
    reference node's (NullWritable, record) shape — read back through
    the InputFormat door and reparsed.  Oracle: the original projection
    (a lossless write→read roundtrip is the hatch's contract)."""
    import tempfile

    from asakusafw_spark_spark.sources import hadoop_input_newapi
    from asakusafw_spark_spark.sources.write import hadoop_output_newapi

    supp = _t(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    out = tempfile.mkdtemp(prefix="hadoop_newapi_out_") + "/supplier_text"
    hadoop_output_newapi(supp, out)  # default: TextOutputFormat, tab-joined
    raw = hadoop_input_newapi(
        spark,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        out,
    )
    parts = F.split(F.col("value"), "\t")
    return raw.select(
        parts.getItem(0).cast("long").alias("s_suppkey"),
        parts.getItem(1).alias("s_name"),
        parts.getItem(2).cast("long").alias("s_nationkey"),
    )


def q_cli_roundtrip(spark, sf):
    """The operational door, oracle-checked (VERDICT r06 Next #5): shell
    ``python -m asakusafw_spark_spark.run`` — the reference's
    spark-execute client entry (SparkClientCompiler.scala:95-108,124) —
    on a generated fixture flow that reads nation.parquet, aggregates
    nations per region, and writes parquet in a FRESH interpreter/JVM;
    then read the output back here.  Oracle: the same aggregate in SQL —
    green means the whole launcher path (module:factory resolution,
    --arg batch arguments, engine session defaults, sink firing)
    produces the right table, not just a zero exit code."""
    import os
    import subprocess
    import sys
    import tempfile

    import asakusafw_spark_spark

    work = tempfile.mkdtemp(prefix="cli_roundtrip_")
    out_dir = f"{work}/out"
    flow_mod = os.path.join(work, "cli_fixture_flow.py")
    with open(flow_mod, "w") as f:
        f.write(
            f'''
from pyspark.sql import functions as F
from asakusafw_spark_spark.plans.flow import FlowGraph
from asakusafw_spark_spark.sources.write import write_flat

def flow(sf_dir):
    g = FlowGraph()
    g.source("nation", lambda spark: spark.read.parquet(
        sf_dir + "/nation.parquet"))
    g.op("per_region", "nation", lambda spark, df: df.groupBy(
        "n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name")))
    g.sink("save", "per_region", lambda df: write_flat(
        df, r"{out_dir}", format="parquet"))
    return g
'''
        )
    pkg_root = os.path.dirname(
        os.path.dirname(asakusafw_spark_spark.__file__)
    )
    # PREPEND to PYTHONPATH (don't overwrite): deployments that supply
    # pyspark/py4j via PYTHONPATH rather than site-packages need their
    # entries to survive into the launcher subprocess
    prior_pp = os.environ.get("PYTHONPATH", "")
    pythonpath = pkg_root + (os.pathsep + prior_pp if prior_pp else "")
    r = subprocess.run(
        [sys.executable, "-m", "asakusafw_spark_spark.run",
         "cli_fixture_flow:flow", "--arg", f"sf_dir={sf}",
         "--master", "local[2]", "--shuffle-partitions", "2"],
        cwd=work, capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": pythonpath},
    )
    if r.returncode != 0:
        raise RuntimeError(f"cli_roundtrip launcher failed: {r.stderr[-2000:]}")
    # job-end per-output counter line (OutputCounters parity) — part of
    # the launcher contract since r09.  The COUNT is checked against
    # the rows actually read back, not hardcoded, so the query stays
    # valid on degenerate inputs (robustness sweep runs it on empty
    # tables, where the counter correctly logs 0)
    import re

    m = re.search(r"output save: (\d+) records", r.stderr)
    if m is None:
        raise RuntimeError(
            f"cli_roundtrip: missing output-counter log line in stderr: "
            f"{r.stderr[-500:]}"
        )
    out = spark.read.parquet(out_dir)
    logged = int(m.group(1))
    actual = out.count()
    if logged != actual:
        raise RuntimeError(
            f"cli_roundtrip: counter logged {logged} records but the "
            f"sink holds {actual}"
        )
    return out


def q_k_anonymity_report(spark, sf):
    """k-anonymity audit (functions/quality.py): per-combination counts
    of the (nationkey, mktsegment) quasi-identifier pair with the
    anonymous flag at k=10 — one partial-aggregable hash-agg."""
    from asakusafw_spark_spark.functions import k_anonymity_report

    return k_anonymity_report(
        _t(spark, sf, "customer").select("c_nationkey", "c_mktsegment"),
        ["c_nationkey", "c_mktsegment"], k=10,
    )


def q_suppress_rare_groups(spark, sf):
    """Baseline k-anonymity enforcement (functions/quality.py): NULL the
    quasi-identifier columns on rows whose (nationkey, mktsegment)
    combination occurs fewer than 10 times — one window count over the
    quasi partition, no join-back.  Oracle: the same CASE over
    COUNT(*) OVER (PARTITION BY ...)."""
    from asakusafw_spark_spark.functions import suppress_rare_groups

    return suppress_rare_groups(
        _t(spark, sf, "customer").select(
            "c_custkey", "c_nationkey", "c_mktsegment"
        ),
        ["c_nationkey", "c_mktsegment"], k=10,
    )


def q_seqfile_roundtrip(spark, sf):
    """The Hadoop doors on a REAL legacy binary format: region written
    through SequenceFileOutputFormat (Text keys/values via the
    Row→(K,V) adapter) and read back through SequenceFileInputFormat —
    proving hadoop_input_newapi / hadoop_output_newapi work beyond
    TextOutputFormat, on the containerized K/V format Hadoop shops
    actually hold legacy data in.  Oracle: the original projection."""
    import tempfile

    from asakusafw_spark_spark.sources import (
        hadoop_input_newapi, hadoop_output_newapi,
    )

    df = _t(spark, sf, "region").select("r_regionkey", "r_name")
    out = tempfile.mkdtemp(prefix="seqfile_") + "/region_seq"
    hadoop_output_newapi(
        df, out,
        output_format_class=(
            "org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat"
        ),
        key_class="org.apache.hadoop.io.Text",
        value_class="org.apache.hadoop.io.Text",
        to_kv=lambda r: (str(r["r_regionkey"]), r["r_name"]),
    )
    back = hadoop_input_newapi(
        spark,
        "org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat",
        out,
        key_class="org.apache.hadoop.io.Text",
        value_class="org.apache.hadoop.io.Text",
        schema="key string, value string",
    )
    return back.select(
        F.col("key").cast("long").alias("r_regionkey"),
        F.col("value").alias("r_name"),
    )


def q_fixed_width_input(spark, sf):
    """Fixed-width text door (sources/read.py direct_input_fixed_width):
    nation serialized to fixed-column lines (rpad), cut back by byte
    position with per-field casts — the mainframe-export format the
    delimited readers can't touch.  Scan-stage only: substring/trim/
    cast projections, no shuffle, no Python.  Oracle: the original
    table (lossless roundtrip)."""
    import tempfile

    from asakusafw_spark_spark.sources import direct_input_fixed_width
    from asakusafw_spark_spark.sources.write import write_flat

    nation = _t(spark, sf, "nation")
    out = tempfile.mkdtemp(prefix="fixedw_") + "/nation_fw"
    lines = nation.select(
        F.concat(
            F.rpad(F.col("n_nationkey").cast("string"), 4, " "),
            F.rpad(F.col("n_name"), 28, " "),
            F.rpad(F.col("n_regionkey").cast("string"), 4, " "),
        ).alias("value")
    )
    write_flat(lines, out, format="text")
    return direct_input_fixed_width(
        spark, out,
        [("n_nationkey", 4, "long"), ("n_name", 28),
         ("n_regionkey", 4, "long")],
    )


def q_heavy_hitters(spark, sf):
    """Exact frequent-value detection (functions/stats.py): events
    users holding ≥ 0.8% of all rows — the hot-key discovery pass that
    feeds skew defences (skew_salt / max_candidates) and hot-domain
    reporting.  One data scan: Spark's ReuseExchange serves both the
    per-key counts and the total from the same shuffle (plan asserted
    in test_physical_plans).  share is an exact double quotient,
    identical IEEE bits on both engines."""
    from asakusafw_spark_spark.functions import heavy_hitters

    return heavy_hitters(
        _t(spark, sf, "events").select("user_id"),
        "user_id", min_count=2, min_share=0.008,
    )


def q_sample_exact_n(spark, sf):
    """Deterministic exact-size sample (functions/sampling.py): the 97
    documents whose doc_id hashes lowest — reproducible eval-set
    carving, TakeOrdered not a global sort.  Oracle: the identical
    md5-prefix order in SQL."""
    from asakusafw_spark_spark.functions import sample_exact_n

    return sample_exact_n(_t(spark, sf, "documents"), 97, "doc_id")


def q_retention_expire(spark, sf):
    """Partition-TTL maintenance (sources/write.py expire_partitions):
    events written day-partitioned, days before 2024-01-11 expired via
    directory deletes (no data scan), survivors read back and
    aggregated.  Oracle: the same aggregate over events filtered to the
    retained window — green means the expiry dropped EXACTLY the
    partitions below the cutoff and nothing else."""
    import tempfile

    from asakusafw_spark_spark.sources import expire_partitions

    ev = _t(spark, sf, "events").withColumn("day", F.to_date("ts"))
    base = tempfile.mkdtemp(prefix="retention_") + "/events_by_day"
    ev.write.partitionBy("day").parquet(base)
    dropped = expire_partitions(spark, base, "day", "2024-01-11")
    # real guard (not a tautology): every dropped value is strictly
    # below the cutoff — the expiry touched nothing it shouldn't
    assert all(v < "2024-01-11" for v in dropped), dropped
    return (
        # explicit schema: an all-expired (or empty-input) dataset has
        # no footers left to infer from — the read must still succeed
        spark.read.schema(ev.schema).parquet(base)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        # DATE surfaces as python date on Spark but datetime64 via
        # DuckDB's pandas bridge — compare as timestamp (the repo's
        # date-hash contract)
        .withColumn("day", F.col("day").cast("timestamp"))
    )


def q_master_selection_custom_fn(spark, sf):
    # Custom selection via the Python cogroup slow path (select_fn).
    # Deliberately DIFFERENT from the default ordering pick: choose the
    # SECOND-best master by (acctbal desc, custkey asc) when the group
    # has >= 2 candidates — so this oracle row fails if the engine
    # ignores select_fn and falls back to the ordering default
    # (VERDICT r05 "What's wrong" #2: the old fn returned index 0 and
    # was unfalsifiable).
    def pick_best(m_pdf, trow):
        if not len(m_pdf):
            return None
        return 1 if len(m_pdf) >= 2 else 0

    sel = MasterSelection(
        ordering=[("c_acctbal", "desc"), ("c_custkey", "asc")], select_fn=pick_best
    )
    out = master_join(
        _t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal"),
        _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey"),
        [("c_nationkey", "s_nationkey")],
        mapping={
            "s_suppkey": "t.s_suppkey",
            "best_custkey": "m.c_custkey",
            "best_acctbal": "m.c_acctbal",
        },
        selection=sel,
    )
    return out["joined"]


def q_master_join_where(spark, sf):
    # tx-dependent candidate predicate: master qualifies only if acctbal
    # clears a threshold derived from the transaction
    sel = MasterSelection(
        ordering=[("c_custkey", "asc")],
        where=F.col("__m_c_acctbal") * 100 >= F.col("o_totalprice"),
    )
    out = master_join(
        _t(spark, sf, "customer").select("c_custkey", "c_acctbal"),
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [("c_custkey", "o_custkey")],
        mapping={
            "o_orderkey": "t.o_orderkey",
            "o_totalprice": "t.o_totalprice",
            "c_acctbal": "m.c_acctbal",
        },
        selection=sel,
    )
    return out["joined"]


def q_fold_custom(spark, sf):
    """@Fold via the Python slow path (streaming cogroup executor):
    same reduce semantics as q_fold but through an arbitrary user fn."""
    import pandas as pd

    li = _t(spark, sf, "lineitem").select("l_suppkey", "l_quantity", "l_extendedprice")

    from decimal import Decimal

    TWO = Decimal("0.01")

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # mirror SUM(TRY_CAST(x AS DECIMAL(_,2))): quantize each value, then
        # sum — SKIPPING nulls like SQL SUM (a raw `+` fold would let
        # one NaN row poison the whole group; caught by the r13
        # null-injected oracle sweep).  All-null groups sum to NULL.
        vals = [
            Decimal(str(v)).quantize(TWO)
            for v in pdf["l_quantity"]
            if not pd.isna(v)
        ]
        qty = float(sum(vals)) if vals else None
        return pd.DataFrame(
            {
                "l_suppkey": [pdf["l_suppkey"].iloc[0]],
                "l_quantity": [qty],
                "l_extendedprice": [pdf["l_extendedprice"].max()],
            }
        )

    return fold(li, ["l_suppkey"], fn=reduce_fn)


def q_fold_partial(spark, sf):
    """Giant-group fold (reference BufferType.SPILL analogue,
    compiler/.../user/CoGroupOperatorCompiler.scala:122-131): lineitem is
    exploded 10x so each l_returnflag group far exceeds one Arrow batch;
    partial=True folds the carry buffer into one accumulator record at
    every batch boundary, so memory stays bounded by a single batch."""
    import pandas as pd

    li = _t(spark, sf, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    big = li.crossJoin(spark.range(10).select(F.lit(1).alias("__rep"))).drop("__rep")

    def fmax(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{
                "l_returnflag": pdf["l_returnflag"].iloc[0],
                "l_quantity": pdf["l_quantity"].max(),
                "l_extendedprice": pdf["l_extendedprice"].min(),
            }]
        )

    return fold(big, ["l_returnflag"], fn=fmax, partial=True)


def q_master_join_shuffled(spark, sf):
    out = master_join(
        _t(spark, sf, "customer").select("c_custkey", "c_name", "c_mktsegment"),
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        [("c_custkey", "o_custkey")],
        mapping={
            "o_orderkey": "t.o_orderkey",
            "o_custkey": "t.o_custkey",
            "o_totalprice": "t.o_totalprice",
            "c_name": "m.c_name",
            "c_mktsegment": "m.c_mktsegment",
        },
        strategy="shuffled",
    )
    return out["joined"]


def q_direct_input(spark, sf):
    """DirectInput path: glob-pattern read through the direct I/O
    surface (sources/read.py), then a projection."""
    from asakusafw_spark_spark.sources.read import direct_input

    df = direct_input(spark, f"{sf}/natio*.parquet", format="parquet")
    return df.select("n_nationkey", "n_name", "n_regionkey")


def q_hadoop_input(spark, sf):
    """NewHadoopInput/NewHadoopOutput roundtrip through a genuinely
    non-parquet, line-oriented format (Spark's ``text`` DataSource — the
    analogue of the reference's TextInputFormat door,
    runtime/.../graph/NewHadoopInput.scala / NewHadoopOutput.scala):
    nation is serialized to '|'-delimited text lines via the
    DataSource-passthrough sink, read back through
    ``hadoop_input(format="text")`` with no format validation, reparsed,
    and returned in full.  Oracle: the original table — a lossless
    roundtrip is exactly the escape hatch's contract."""
    import tempfile

    from asakusafw_spark_spark.sources import hadoop_input
    from asakusafw_spark_spark.sources.write import write_flat

    nation = _t(spark, sf, "nation")
    out = tempfile.mkdtemp(prefix="hadoop_io_") + "/nation_text"
    lines = nation.select(
        F.concat_ws(
            "|", F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")
        ).alias("value")
    )
    write_flat(lines, out, format="text")
    parts = F.split(F.col("value"), "\\|")
    return hadoop_input(spark, "text", out).select(
        parts.getItem(0).cast("long").alias("n_nationkey"),
        parts.getItem(1).alias("n_name"),
        parts.getItem(2).cast("long").alias("n_regionkey"),
    )


def q_logging(spark, sf):
    # @Logging contract: output == input exactly (side channel sampled)
    return logging_op(_t(spark, sf, "nation"))


def q_checkpoint(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") >= 25)
    li = checkpoint(li, mode="local_checkpoint")
    return summarize(
        li,
        ["l_returnflag"],
        {"n_items": ("count", "l_orderkey"), "max_qty": ("max", "l_quantity")},
    )


def q_confluent(spark, sf):
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    hi = orders.filter(F.col("o_totalprice") >= 150000.0)
    lo = orders.filter(F.col("o_totalprice") < 150000.0)
    return confluent([hi, lo], ordering=[("o_orderkey", "asc")])


def q_running_total(spark, sf):
    orders = _t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = running_agg(
        orders,
        ["o_custkey"],
        [("o_orderdate", "asc"), ("o_orderkey", "asc")],
        {
            "running_spend": F.sum(F.col("o_totalprice").try_cast("decimal(27,6)")),
            "order_seq": F.count(F.lit(1)),
        },
    )
    return out.withColumn("running_spend", F.col("running_spend").cast("double"))


def q_sessionize(spark, sf):
    ev = _t(spark, sf, "events").select("user_id", "ts", "value")
    # same declared analysis window as the streaming session family
    # (r15 extreme-ts contract): session analytics over validated
    # event time, rogue far-past/future rows excluded on both sides
    ev = _event_window(ev)
    return sessionize_batch(
        ev,
        "ts",
        "30 minutes",
        ["user_id"],
        {
            "n_events": F.count(F.lit(1)),
            "v_sum": F.sum(F.col("value").try_cast("decimal(27,6)")).cast("double"),
        },
    )


def q_rank_in_group(spark, sf):
    customer = _t(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    return rank_in_group(
        customer,
        ["c_nationkey"],
        [("c_acctbal", "desc"), ("c_custkey", "asc")],
        out_col="bal_rank",
        method="dense_rank",
    )


def q_moving_avg(spark, sf):
    """Sliding-frame window (ROWS 4 PRECEDING): 5-order moving average
    of spend per customer in order-date order."""
    from pyspark.sql import Window as W

    orders = _t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-4, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        # exact decimal frame-sum -> double, THEN an IEEE double division:
        # decimal/bigint quotient scale rules differ between engines (seen
        # as a last-digit hash mismatch at sf0.1), double division doesn't
        (
            F.sum(F.col("o_totalprice").try_cast("decimal(27,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_5"),
    )


def q_pivot_agg(spark, sf):
    """Pivot order counts: one column per order status (fixed value
    list — the scalable form; dynamic pivot needs a values scan)."""
    orders = _t(spark, sf, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


def q_training_pipeline(spark, sf):
    """Composite LLM training-data pipeline over engine operators:
    quality-filter → exact-dedup (keeper per fingerprint) → per-language
    corpus stats.  The shape a 100 TB curation job takes."""
    docs = _t(spark, sf, "documents")
    scored = update(
        docs.select("doc_id", "text"),
        lang=lang_id("text"),
        quality=quality_score("text"),
        n_tokens=token_count("text"),
        fp=fingerprint("text"),
    ).filter(F.col("quality") >= 0.5)
    keepers = summarize(
        scored, ["fp"], {"keeper_id": ("min", "doc_id")}
    )
    kept = master_join(
        keepers,
        scored,
        [("keeper_id", "doc_id")],
        mapping={
            "doc_id": "t.doc_id",
            "lang": "t.lang",
            "n_tokens": "t.n_tokens",
        },
        strategy="broadcast",
    )["joined"]
    return summarize(
        kept,
        ["lang"],
        {"n_docs": ("count", "doc_id"), "total_tokens": ("sum", "n_tokens")},
    ).withColumn("total_tokens", F.col("total_tokens").cast("long"))


def q_summarize_any(spark, sf):
    orders = _t(spark, sf, "orders")
    return summarize(
        orders,
        ["o_orderpriority"],
        {"any_status": ("any", "o_orderstatus"), "n_orders": ("count", "o_orderkey")},
    )


def q_approx_distinct(spark, sf):
    # approximate aggregate (§2.8 beyond-reference). The HLL++ sketch value is
    # engine-specific, so the hash-checkable output is (exact count, n_items,
    # within_bound): the approx estimate is checked against the exact
    # COUNT(DISTINCT) with a 3-sigma relative-error bound (rsd=0.02 -> 6%);
    # the oracle emits TRUE unconditionally, so the hash matches iff the
    # sketch really was within bound.
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )
    within = (
        F.abs(F.col("__approx") - F.col("exact_parts"))
        / F.col("exact_parts")
        <= F.lit(0.06)
    )
    return agg.select(
        "l_returnflag", "exact_parts", "n_items", within.alias("within_bound")
    )


def q_approx_percentile(spark, sf):
    """Approximate percentile sketch (§2.8): the sketch's value is
    engine-specific, so the hash-checkable output is (exact median,
    n_items, within_bound) — the approx median must land inside the
    exact p45..p55 value window (rank tolerance 0.05 ≫ the sketch's
    1/accuracy = 1e-4 rank error).  The oracle emits TRUE
    unconditionally, so the hash matches iff the sketch held."""
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_quantity, 0.5, 10000)").alias("__approx"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.45)").alias("__lo"),
        F.expr("percentile(l_quantity, 0.55)").alias("__hi"),
        F.count(F.lit(1)).alias("n_items"),
    )
    within = (F.col("__approx") >= F.col("__lo")) & (
        F.col("__approx") <= F.col("__hi")
    )
    # a group with no non-null quantities has nothing to approximate:
    # both the sketch and the exact bounds are NULL — vacuously within
    # bound (the oracle's unconditional TRUE), not three-valued NULL
    within = F.when(
        F.col("__approx").isNull() & F.col("__lo").isNull(), F.lit(True)
    ).otherwise(within)
    return agg.select(
        "l_returnflag", "median_qty", "n_items", within.alias("within_bound")
    )


def q_multimodal_features(spark, sf):
    """Full multimodal plumbing through mapInPandas: text bytes as an
    opaque payload → fake (md5-derived) decoder → feature array.  The
    decoder is deterministic, so the oracle reproduces features exactly
    from md5 hex — a CONFIRMED check of the Arrow batch path."""
    from asakusafw_spark_spark.functions.dedup import ensure_parallelism
    from asakusafw_spark_spark.functions.multimodal import extract_features, fake_decoder

    docs = ensure_parallelism(_t(spark, sf, "documents")).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_features(docs, decoder=fake_decoder)
    return feats.select(
        "media_id",
        F.col("features")[0].cast("double").alias("f0"),
        F.col("features")[7].cast("double").alias("f7"),
        F.col("features")[15].cast("double").alias("f15"),
    )


def q_rollup_agg(spark, sf):
    """Hierarchical rollup totals (beyond-reference §2.8: grouping sets).
    NULL-filled subtotal rows exactly as ANSI ROLLUP — including the
    grand-total row over an EMPTY table, which Spark's Expand-based
    rollup drops (r14 empty-corpus gate; operators.rollup_agg)."""
    from asakusafw_spark_spark.operators import rollup_agg

    li = _t(spark, sf, "lineitem")
    return rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "n_items": F.count(F.lit(1)),
            "sum_qty": _dsum(F.col("l_quantity"), 2),
        },
    )


def q_cube_agg(spark, sf):
    """CUBE over two dims (§2.8 grouping sets family), ANSI
    empty-input semantics via operators.cube_agg."""
    from asakusafw_spark_spark.operators import cube_agg

    orders = _t(spark, sf, "orders")
    return cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        {
            "n_orders": F.count(F.lit(1)),
            "sum_price": _dsum(F.col("o_totalprice")),
        },
    )


def q_intersect_keys(spark, sf):
    """INTERSECT as first-class set op (beyond-reference §2.8)."""
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") >= 5000.0).select(
        F.col("c_custkey").alias("custkey")
    )
    return o.intersect(c)


def q_except_keys(spark, sf):
    """EXCEPT (anti set-difference) as first-class set op (§2.8)."""
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 200000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)  # customers who never placed a big order


def q_asof_join(spark, sf):
    """As-of join: each event matched to the user's most recent order at
    or before the event time (reference expresses this inside a
    @MasterSelection method; here via the tx-dependent where path)."""
    from asakusafw_spark_spark.operators import asof_join

    events = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = asof_join(
        events,
        orders,
        [("o_custkey", "user_id")],
        left_ts="ts",
        right_ts="o_orderdate",
        direction="backward",
        tie_break=["o_orderkey"],
    )
    return out["joined"].select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


def q3_shipping_priority(spark, sf):
    """TPC-H Q3-style: top-10 unshipped BUILDING-segment orders by
    revenue, built entirely from engine operators (master_join →
    update → summarize → global ordered limit)."""
    CUT = "1998-01-01"
    cust = (
        _t(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit(CUT).cast("timestamp")
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit(CUT).cast("timestamp")
    )
    o_b = master_join(
        cust,
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        [("c_custkey", "o_custkey")],
        strategy="broadcast",
    )["joined"]
    joined = master_join(
        o_b.select("o_orderkey", "o_orderdate"),
        li.select("l_orderkey", "l_extendedprice", "l_discount"),
        [("o_orderkey", "l_orderkey")],
    )["joined"]
    rev = update(
        joined,
        revenue=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    agg = summarize(
        rev,
        ["l_orderkey", "o_orderdate"],
        {"revenue": ("sum", "revenue")},
    ).select(
        "l_orderkey",
        F.col("revenue").cast("double").alias("revenue"),
        "o_orderdate",
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


def q5_local_supplier_volume(spark, sf):
    """TPC-H Q5-style: revenue by nation where the supplying supplier and
    the ordering customer share a nation inside one region — a
    multi-dimension join CYCLE (region→nation→customer→orders→lineitem
    ←supplier) closed by an equality between two dimension branches.

    Plan shape at scale: every dimension broadcasts (region, nation,
    customer, supplier), the orders↔lineitem fact join is pinned
    sort-merge ("shuffled") — the scale-correct strategy (the filtered
    orders chain is a year × a region of orders: far over any broadcast
    cap at volume), and under "auto" Catalyst's inflated join-output
    estimate picked the WRONG broadcast side at test SF (it collected
    the 600k-row lineitem scan as the build side; measured 2.01 s auto
    vs 1.77 s shuffled vs 1.56 s broadcast-the-master, r16).  Both SMJ
    children are bare shuffles (unique_master) so AQE's skew split
    stays eligible.  All masters are PK'd → unique_master=True skips
    the min_by pre-reductions entirely.
    """
    region = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nat = master_join(
        region.select("r_regionkey"),
        _t(spark, sf, "nation"),
        [("r_regionkey", "n_regionkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("n_nationkey", "n_name")
    cust = master_join(
        nat,
        _t(spark, sf, "customer").select("c_custkey", "c_nationkey"),
        [("n_nationkey", "c_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("c_custkey", "c_nationkey", "n_name")
    orders = (
        _t(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    ord_n = master_join(
        cust,
        orders,
        [("c_custkey", "o_custkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("o_orderkey", "c_nationkey", "n_name")
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    li_o = master_join(
        ord_n, li, [("o_orderkey", "l_orderkey")], strategy="shuffled",
        unique_master=True,
    )["joined"]
    li_s = master_join(
        _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey"),
        li_o,
        [("s_suppkey", "l_suppkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    # close the cycle: supplier nation == customer nation
    local = li_s.filter(F.col("s_nationkey") == F.col("c_nationkey"))
    rev = update(
        local,
        revenue=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    return summarize(rev, ["n_name"], {"revenue": ("sum", "revenue")}).select(
        "n_name", F.col("revenue").cast("double").alias("revenue")
    )


def q18_large_volume_customer(spark, sf):
    """TPC-H Q18-style: orders totalling > 300 units with their
    customers — a HAVING-on-aggregate that drives a semi-join back onto
    the fact, then dimension enrichment.

    The aggregate output IS the master side (per-order totals are
    key-unique by construction), so the having-semi-join rides the
    ordinary master_join machinery with unique_master=True: at scale the
    per-order aggregate map-side-combines, only (orderkey, total) pairs
    shuffle, and orders/customer enrich via broadcast.
    """
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    qd = update(li, q_dec=F.col("l_quantity").cast("decimal(27,2)"))
    big = (
        summarize(qd, ["l_orderkey"], {"sum_qty": ("sum", "q_dec")})
        .filter(F.col("sum_qty") > 300)
        .select("l_orderkey", F.col("sum_qty").cast("double").alias("sum_qty"))
    )
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    o_big = master_join(
        big, orders, [("l_orderkey", "o_orderkey")], strategy="broadcast",
        unique_master=True,
    )["joined"]
    out = master_join(
        _t(spark, sf, "customer").select("c_custkey", "c_name"),
        o_big,
        [("c_custkey", "o_custkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    return (
        out.select(
            "c_name",
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        # o_orderkey tiebreaker: double-typed totalprice ties must not make
        # the LIMIT set engine-dependent
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


def q7_volume_shipping(spark, sf):
    """TPC-H Q7-style: shipping volume between a nation PAIR by year —
    two independent dimension branches (supplier-nation, customer-
    nation) meet in a symmetric OR predicate over the fact.

    Plan shape at scale: both nation branches broadcast into their
    dimension (supplier / customer→orders), the pair predicate prunes
    BEFORE the fact join (each side keeps only the two named nations),
    and lineitem — the only large input — joins orders under "auto" and
    never shuffles twice.  The year projection is a scan-stage expr.
    """
    a, b = "NATION_1", "NATION_2"
    nat = _t(spark, sf, "nation").filter(F.col("n_name").isin(a, b)).select(
        "n_nationkey", "n_name"
    )
    supp = master_join(
        nat,
        _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey"),
        [("n_nationkey", "s_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = master_join(
        nat,
        _t(spark, sf, "customer").select("c_custkey", "c_nationkey"),
        [("n_nationkey", "c_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("c_custkey", F.col("n_name").alias("cust_nation"))
    orders = master_join(
        cust,
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey"),
        [("c_custkey", "o_custkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("o_orderkey", "cust_nation")
    li = (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    li_s = master_join(
        supp, li, [("s_suppkey", "l_suppkey")], strategy="broadcast",
        unique_master=True,
    )["joined"]
    both = master_join(
        orders, li_s, [("o_orderkey", "l_orderkey")], strategy="auto",
        unique_master=True,
    )["joined"].filter(
        ((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
        | ((F.col("supp_nation") == b) & (F.col("cust_nation") == a))
    )
    vol = update(
        both,
        l_year=F.year("l_shipdate").cast("long"),
        volume=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    return summarize(
        vol, ["supp_nation", "cust_nation", "l_year"], {"revenue": ("sum", "volume")}
    ).select(
        "supp_nation",
        "cust_nation",
        "l_year",
        F.col("revenue").cast("double").alias("revenue"),
    )


def q10_returned_items(spark, sf):
    """TPC-H Q10-style: top-20 customers by lost revenue on RETURNED
    items in one quarter — selective fact filter, dimension enrichment,
    aggregate, global top-k.

    Plan shape at scale: the returnflag + date filters land in the
    scans (pushdown), customer/nation broadcast, the per-customer
    aggregate map-side-combines, and the top-20 runs as
    TakeOrderedAndProject (per-partition heads, never a global sort).
    The LIMIT set is decided on the exact DECIMAL revenue (double ties
    must not make the cut engine-dependent).
    """
    orders = (
        _t(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    li_o = master_join(
        orders, li, [("o_orderkey", "l_orderkey")], strategy="auto",
        unique_master=True,
    )["joined"]
    rev = update(
        li_o,
        volume=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    per_cust = summarize(rev, ["o_custkey"], {"revenue": ("sum", "volume")})
    cust = master_join(
        _t(spark, sf, "nation").select("n_nationkey", "n_name"),
        _t(spark, sf, "customer").select(
            "c_custkey", "c_name", "c_acctbal", "c_nationkey"
        ),
        [("n_nationkey", "c_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    out = master_join(
        cust,
        per_cust,
        [("c_custkey", "o_custkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    return (
        out.orderBy(F.col("revenue").desc(), F.col("o_custkey").asc())
        .limit(20)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "c_name",
            F.col("revenue").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


def q_scrub_spans(spark, sf):
    """Exact substring-level dedup (Lee et al.-style): corpus-duplicated
    8-token spans scrubbed from every document.  Native explode/agg/
    semi-join pipeline — see functions.dedup.scrub_duplicate_spans."""
    from asakusafw_spark_spark.functions import scrub_duplicate_spans

    docs = _t(spark, sf, "documents")
    out = scrub_duplicate_spans(docs, n=8, min_count=2)
    return out.select(
        "doc_id", "clean", F.col("n_tokens").cast("long").alias("n_tokens"), "n_removed"
    )


def q_quantize_embeddings(spark, sf):
    """Int8 scalar quantization: per-vector codes checked by exact
    integer content + order witnesses (sum, L1, position-weighted sum)
    plus the double inv_scale — all bit-deterministic cross-engine."""
    from asakusafw_spark_spark.functions import quantize_embeddings

    qz = quantize_embeddings(_t(spark, sf, "embeddings"))
    codes = F.col("codes")
    lsum = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    l1 = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x.cast("long"))
    )
    wsum = F.aggregate(
        F.zip_with(
            codes,
            F.sequence(F.lit(1), F.size(codes)),
            lambda c, i: c.cast("long") * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return qz.select(
        "vec_id",
        F.size(codes).cast("long").alias("n_dim"),
        lsum.alias("code_sum"),
        l1.alias("code_l1"),
        wsum.alias("code_wsum"),
        "inv_scale",
    )


def q_similarity_quantized(spark, sf):
    """Brute-force cosine top-k over int8 codes (integer dot products,
    4× smaller corpus scan) — the affordable exact-scan at 10⁹ vectors."""
    from asakusafw_spark_spark.functions import quantized_topk

    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return quantized_topk(emb, queries, k=5)


def q_extract_json(spark, sf):
    """Semi-structured ingestion: typed attribute extraction from the
    events JSON props column (native get_json_object, scan-stage), then
    a per-event-type profile over the extracted value."""
    from asakusafw_spark_spark.functions import extract_json

    ev = extract_json(
        _t(spark, sf, "events"), "props", {"k": "$.k:bigint"}
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
        F.count_distinct(F.col("k")).alias("k_distinct"),
    )


def q_dedup_incremental(spark, sf):
    """Incremental ingestion dedup: the odd-id half of the corpus is
    'today's batch', deduped against a prebuilt index of the even-id
    history — new docs near-matching (jaccard ≥ 0.5) any historical doc
    are dropped; survivors pass through with all columns."""
    from asakusafw_spark_spark.functions import (
        build_dedup_index,
        dedup_against_corpus,
    )

    docs = _t(spark, sf, "documents")
    history = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index = build_dedup_index(history)
    kept = dedup_against_corpus(batch, index=index, threshold=0.5)
    return kept.select("doc_id", "lang", "source", "n_chars")


def q4_order_priority(spark, sf):
    """TPC-H Q4-style: orders in one quarter with at least one RETURNED
    line item, counted by priority — the EXISTS shape: a pure existence
    probe where no line-item payload may cross the join.

    Built on master_check (semi join): the probe side is a deduped
    orderkey set, so at scale Spark runs a broadcast existence filter
    over the orders scan — orders never shuffles, and the count
    aggregate map-side-combines to 5 rows.
    """
    orders = (
        _t(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    returned = (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey"))
    )
    found = master_check(
        returned, orders, [("l_orderkey", "o_orderkey")], strategy="auto"
    )["found"]
    return found.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q14_promo_revenue(spark, sf):
    """TPC-H Q14-style: PROMO part-type revenue share for one month —
    conditional aggregation over a fact⋈dimension join, returning one
    row.  Part broadcasts; the two decimal-exact sums divide in double
    only at the very end (cross-engine deterministic)."""
    li = (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    joined = master_join(
        _t(spark, sf, "part").select("p_partkey", "p_type"),
        li,
        [("p_partkey", "l_partkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    rev = update(
        joined,
        volume=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    agg = rev.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", F.col("volume"))).alias("__promo__"),
        F.sum("volume").alias("__total__"),
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.coalesce(F.col("__promo__"), F.lit(0).cast("decimal(27,6)")).cast(
                "double"
            )
            / F.col("__total__").cast("double")
        ).alias("promo_revenue_pct")
    )


def q_funnel(spark, sf):
    """view → click → purchase funnel per user: earliest strictly-
    ordered completion anchors; NULL from the first uncompleted step."""
    from asakusafw_spark_spark.functions import funnel

    ev = _t(spark, sf, "events")
    return funnel(ev, ["view", "click", "purchase"])


def q_resample_locf(spark, sf):
    """Time-series resampling with gap filling (operators.window.
    resample_timeseries): events bucketed into per-type 1-hour windows
    over each type's full span — EMPTY buckets materialized with
    zero-filled counts and last-observation-carried-forward sums (the
    regularization every time-series consumer needs and event logs
    never provide).  All native: one hash agg + sequence-explode grid +
    one LOCF window pass; exact-decimal sums keep the doubles
    bit-stable."""
    from asakusafw_spark_spark.operators import resample_timeseries

    ev = _t(spark, sf, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    # Explicit analysis window (r15 extreme-ts contract): a gap-filling
    # resample's output size is span/step PER KEY — data-dependent.  A
    # single rogue year-0001/9999 timestamp would materialize a
    # 10-millennium hourly grid (~88M buckets/key).  Production
    # regularization always declares its range; the window covers every
    # corpus's real span (Jan 2024), and max_buckets_per_key fail-fasts
    # if a future corpus outgrows it instead of silently exploding
    # (out-of-window rows additionally surface via the _event_window
    # observation).
    ev = _event_window(ev)
    return resample_timeseries(
        ev,
        "ts",
        "1 hour",
        ["event_type"],
        {
            "n_events": ("count", "value"),
            "sum_value": ("sum", "value"),
            "avg_value": ("avg", "value"),
        },
        fill={"n_events": "zero", "sum_value": "locf", "avg_value": "interp"},
        max_buckets_per_key=100_000,
    )


def q_bm25(spark, sf):
    """BM25 retrieval ranking for a 3-term query over the corpus —
    per-term double scores are exact expressions over integer counts,
    the per-doc sum accumulates in decimal (order-free)."""
    from asakusafw_spark_spark.functions import bm25_rank

    docs = _t(spark, sf, "documents")
    return bm25_rank(docs, ["table", "spark", "query"], top_n=25)


def q_text_index_search(spark, sf):
    """BM25 search through the inverted-index path (build_text_index →
    search_text_index) — same scoring contract as bm25_rank, but per
    query only the terms' posting rows are touched."""
    from asakusafw_spark_spark.functions import build_text_index, search_text_index

    postings, stats = build_text_index(_t(spark, sf, "documents"))
    return search_text_index(postings, stats, ["customer", "join", "filter"], top_n=25)


def q_snapshot_diff(spark, sf):
    """Snapshot→CDC derivation: a deterministically modified orders
    snapshot (10% deleted, 10% price-bumped in exact decimal, 10%
    cloned as inserts) diffed against the original — one full-outer
    join, null-safe compares; unchanged keys never appear.  The
    inverse of merge_upsert: diff-then-apply reproduces the new
    snapshot (property-tested in test_core_ops)."""
    from asakusafw_spark_spark.operators import snapshot_diff

    old = _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    bump = F.round(
        F.col("o_totalprice").cast("decimal(27,2)") * F.lit("1.1").cast("decimal(3,1)"),
        2,
    ).cast("double")
    new = (
        old.filter(F.col("o_orderkey") % 10 != 1)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 10 == 0, bump).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 10 == 2).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
            )
        )
    )
    return snapshot_diff(old, new, "o_orderkey")


def q_compaction_roundtrip(spark, sf):
    """Small-file compaction is content-lossless: fragment the
    documents table into many tiny appended files, compact to one,
    read back — must equal the pristine table (oracle: plain SELECT)."""
    import tempfile

    from asakusafw_spark_spark.sources import compact_files

    docs = _t(spark, sf, "documents")
    target = tempfile.mkdtemp(prefix="compact_") + "/docs"
    for i in range(5):
        docs.filter(F.col("doc_id") % 5 == i).coalesce(1).write.mode(
            "append"
        ).parquet(target)
    compact_files(spark, target, target_file_bytes=1 << 30)
    return spark.read.parquet(target).select("doc_id", "lang", "source", "n_chars")


def q_normalize_text(spark, sf):
    """Canonical text normalization with every rule demonstrably firing:
    the text is dirtied deterministically (curly quotes, em-dash, NBSP,
    a control char, mixed case, run-on whitespace) then normalized.
    Oracle: the identical translate/regexp_replace chain in DuckDB."""
    from asakusafw_spark_spark.functions import normalize_text

    docs = _t(spark, sf, "documents")
    dirty = F.concat(
        F.lit("“MIXED Case” — "),
        F.col("text"),
        F.lit("  trailing\tspaces and\x07control … END"),
    )
    return docs.select("doc_id", normalize_text(dirty).alias("clean"))


def q_retention(spark, sf):
    """Daily cohort retention over the events log (first-event cohort,
    distinct-active users at day k, cohort sizes)."""
    from asakusafw_spark_spark.functions import retention

    ev = _t(spark, sf, "events")
    out = retention(ev, periods=14, period="day")
    # DATE surfaces as python date on Spark but datetime64 via DuckDB's
    # pandas bridge — compare as timestamp (the repo's date-hash contract)
    return out.select(
        F.col("cohort").cast("timestamp").alias("cohort"),
        "period_k",
        "n_users",
        "cohort_size",
    )


def q_quantile_bucket(spark, sf):
    """Per-nation account-balance quartile binning — value cut points
    (ties share buckets), exact percentile ≡ DuckDB quantile_cont."""
    from asakusafw_spark_spark.functions import quantile_bucket

    cust = _t(spark, sf, "customer")
    out = quantile_bucket(cust, "c_acctbal", by="c_nationkey", buckets=4)
    return out.select(
        "c_custkey", "c_nationkey", F.col("c_acctbal_bucket").alias("bal_bucket")
    )


def q19_discounted_revenue(spark, sf):
    """TPC-H Q19-style: revenue from line items matching ANY of three
    (brand × size-band × quantity-band) bundles — the disjunctive
    predicate shape.  Catalyst splits the OR across the join: the
    part-only conjuncts (brand, size) prune the broadcast build side
    and the lineitem-only conjunct (quantity range) pushes into the
    fact scan, so the join input is pre-filtered on BOTH sides even
    though the user wrote one big OR."""
    li = _t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = master_join(
        _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size"),
        li,
        [("p_partkey", "l_partkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 50))
    )
    rev = update(
        joined.filter(cond),
        volume=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    return rev.agg(
        F.coalesce(
            F.sum("volume"), F.lit(0).cast("decimal(27,6)")
        ).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q22_global_sales_opportunity(spark, sf):
    """TPC-H Q22-style: rich customers (balance above the positive-
    balance average) with no RECENT orders, profiled per nation — a
    global scalar threshold + NOT EXISTS anti-join.

    The threshold is one decimal-exact aggregate broadcast everywhere;
    the NOT EXISTS is master_check's "missed" port (anti semi-join on a
    deduped orderer-key probe side); the final profile is a
    map-side-combinable aggregate.  The average divides exact decimal
    by exact count IN DOUBLE on both engines (decimal-avg return types
    differ cross-engine; the quotient of exact inputs does not)."""
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").try_cast("decimal(27,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__thr__")
        )
    )
    rich = cust.join(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("__thr__")
    )
    orderers = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    never_ordered = master_check(
        orderers, rich, [("o_custkey", "c_custkey")], strategy="auto"
    )["missed"]
    return never_ordered.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.col("c_acctbal").try_cast("decimal(27,2)"))
        .cast("double")
        .alias("total_bal"),
    )


def q6_forecast_revenue(spark, sf):
    """TPC-H Q6-style: scan-only revenue forecast — one tight conjunctive
    filter over lineitem, no join at all.  The whole predicate (shipdate
    window, discount band, quantity cap) must reach the parquet scan as
    PushedFilters; at 100 TB this query is pure IO and the only thing
    that matters is that zero rows survive past the scan stage
    unnecessarily.  Revenue accumulates in exact decimal (order-
    insensitive) and casts to double at the end."""
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.coalesce(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")),
            F.lit(0.0),
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q8_market_share(spark, sf):
    """TPC-H Q8-style: NATION_3's share of ECONOMY-part volume sold to
    ASIA customers, per order year.

    Two independent dimension chains (region→nation→customer→orders and
    nation→supplier) broadcast into the fact from opposite sides — the
    fact joins each pre-pruned chain once and never shuffles.  The share
    is a conditional decimal sum over the same rows as the total, so one
    aggregate produces both; the division happens in double on exact
    inputs (cross-engine decimal-division typing differs; double of
    exact operands does not)."""
    asia_nations = master_join(
        _t(spark, sf, "region").filter(F.col("r_name") == "ASIA"),
        _t(spark, sf, "nation").select("n_nationkey", "n_regionkey"),
        [("r_regionkey", "n_regionkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("n_nationkey")
    cust = master_join(
        asia_nations,
        _t(spark, sf, "customer").select("c_custkey", "c_nationkey"),
        [("n_nationkey", "c_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("c_custkey")
    orders = master_join(
        cust,
        _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
        [("c_custkey", "o_custkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    supp = master_join(
        _t(spark, sf, "nation").select("n_nationkey", "n_name"),
        _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey"),
        [("n_nationkey", "s_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("s_suppkey", F.col("n_name").alias("supp_nation"))
    econ_parts = _t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    li = master_join(
        econ_parts, li, [("p_partkey", "l_partkey")], strategy="broadcast",
        unique_master=True,
    )["joined"]
    li = master_join(
        supp, li, [("s_suppkey", "l_suppkey")], strategy="broadcast",
        unique_master=True,
    )["joined"]
    both = master_join(
        orders, li, [("o_orderkey", "l_orderkey")], strategy="auto",
        unique_master=True,
    )["joined"]
    vol = update(
        both,
        volume=(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(27,6)"
        ),
    )
    return vol.groupBy("o_year").agg(
        (
            F.coalesce(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                ).cast("double"),
                F.lit(0.0),
            )
            / F.sum("volume").cast("double")
        ).alias("mkt_share"),
        F.sum("volume").cast("double").alias("total_volume"),
    )


def q12_late_priority_lines(spark, sf):
    """TPC-H Q12-style (adapted: the slim schema has no l_shipmode /
    l_commitdate, so "late" = shipped ≥30 days after the order date and
    the group key is l_linestatus): count high- vs low-priority late
    lines per line status.

    Shape: orders joins the date-windowed fact on its key under "auto"
    (shuffled equi-join at scale, AQE-skew eligible), the lateness
    predicate is a post-join column comparison, and the two counts are
    conditional sums in ONE map-side-combinable aggregate."""
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    joined = master_join(
        orders, li, [("o_orderkey", "l_orderkey")], strategy="auto",
        unique_master=True,
    )["joined"]
    late = joined.filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


def q13_customer_distribution(spark, sf):
    """TPC-H Q13-style: distribution of customers by order count,
    excluding low-priority orders — the LEFT-join-with-join-predicate +
    double-aggregation shape.

    Scale shape: orders aggregates to one (custkey, count) row per
    customer BEFORE the join (the classic agg-below-outer-join
    rewrite), so the left join carries one row per customer per side
    instead of one per order; zero-order customers come back via
    coalesce(cnt, 0).  The second aggregate groups on the tiny count
    domain."""
    per_cust = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
    )
    cust = _t(spark, sf, "customer").select("c_custkey")
    counted = (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("__cnt__"), F.lit(0).cast("long")).alias("c_count"))
    )
    return counted.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q15_top_supplier(spark, sf):
    """TPC-H Q15-style: the supplier(s) with maximum quarterly revenue —
    the scalar-subquery-on-an-aggregated-view shape.

    The per-supplier revenue view is one keyed aggregate over the date-
    windowed fact; its max is a 1-row broadcast; the equality filter is
    exact because revenue is an exact decimal sum cast to double on both
    engines (same bits ⇒ same max ⇒ same survivors).  Supplier names
    arrive by broadcast join after the filter, when only the winners
    remain."""
    rev = (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx__"))
    winners = rev.join(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("__mx__")
    )
    supp = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return master_join(
        supp, winners, [("s_suppkey", "l_suppkey")], strategy="broadcast",
        unique_master=True,
    )["joined"].select(
        F.col("l_suppkey").alias("s_suppkey"), "s_name", "total_revenue"
    )


def q17_small_quantity_revenue(spark, sf):
    """TPC-H Q17-style: revenue lost to small orders — lines of
    Brand#1 small parts whose quantity is under 20% of that part's
    average order quantity.

    The correlated AVG subquery decorrelates into one per-part aggregate
    over the SAME pre-filtered fact rows (the filter is on part columns
    only, so per-part stats over the filtered subset equal stats over
    the full table), broadcast-joined back by part key — one fact scan
    total.  The threshold is 0.2 × (exact-decimal sum ÷ count) with the
    arithmetic spelled identically on both engines."""
    parts = _t(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = master_join(
        parts,
        _t(spark, sf, "lineitem").select(
            "l_partkey", "l_quantity", "l_extendedprice"
        ),
        [("p_partkey", "l_partkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"]
    thr = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (_dsum(F.col("l_quantity"), 2) / F.count(F.lit(1)))
        ).alias("__thr__")
    )
    small = li.join(F.broadcast(thr.withColumnRenamed("l_partkey", "__pk__")),
                    F.col("l_partkey") == F.col("__pk__")).filter(
        F.col("l_quantity") < F.col("__thr__")
    )
    return small.agg(
        (
            F.coalesce(_dsum(F.col("l_extendedprice"), 2), F.lit(0.0)) / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q21_waiting_suppliers(spark, sf):
    """TPC-H Q21-style (adapted: no commit/receipt dates, so "kept the
    order waiting" = the supplier's line came back 'R' in a finalized
    multi-supplier order where NO other supplier's line did): per
    supplier, how many such sole-blame lines.

    The classic EXISTS + NOT-EXISTS pair over the same fact decorrelates
    into ONE per-order aggregate — n_suppliers and n_R_suppliers as two
    distinct-counts — joined back to the R-lines by order key.  At
    100 TB that is two keyed shuffles over slim columns instead of two
    correlated self-joins of lineitem against itself; the oracle states
    the EXISTS form and DuckDB decorrelates it its own way, so agreement
    checks semantics, not plan."""
    f_orders = _t(spark, sf, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = master_join(
        f_orders,
        _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag"),
        [("o_orderkey", "l_orderkey")],
        strategy="auto",
        unique_master=True,
    )["joined"].select("l_orderkey", "l_suppkey", "l_returnflag")
    # two-level aggregate instead of a double COUNT(DISTINCT): the
    # (order, supplier) pre-agg is one map-side-combinable shuffle and
    # avoids Catalyst's Expand (which would double the shuffled rows to
    # serve two distinct aggregates in one pass)
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("__has_r__")
    )
    ostats = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp__"),
        F.sum("__has_r__").alias("__n_r_supp__"),
    )
    r_lines = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    blamed = (
        r_lines.join(
            ostats.withColumnRenamed("l_orderkey", "__ok__"),
            F.col("l_orderkey") == F.col("__ok__"),
        )
        .filter((F.col("__n_supp__") > 1) & (F.col("__n_r_supp__") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    supp = master_join(
        _t(spark, sf, "nation").filter(
            F.col("n_name").isin("NATION_1", "NATION_2")
        ).select("n_nationkey"),
        _t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey"),
        [("n_nationkey", "s_nationkey")],
        strategy="broadcast",
        unique_master=True,
    )["joined"].select("s_suppkey", "s_name")
    return master_join(
        supp, blamed, [("s_suppkey", "l_suppkey")], strategy="broadcast",
        unique_master=True,
    )["joined"].groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


# ---------------------------------------------------------------------------
# Partsupp-dependent TPC-H composites (VERDICT r05 Next #4): partsupp is
# synthesized deterministically from part x supplier (sources/tpch.py) so
# Spark and DuckDB derive the identical relation with no side-channel file.
# ---------------------------------------------------------------------------


#: supplier-count memo per sf_dir — one count() job per sweep, not one
#: per partsupp-dependent composite (VERDICT r06 Next #4)
_SCNT_MEMO: dict = {}


def _partsupp(spark, sf):
    from asakusafw_spark_spark.sources.tpch import synthesize_partsupp

    if sf not in _SCNT_MEMO:
        _SCNT_MEMO[sf] = int(_t(spark, sf, "supplier").count())
    return synthesize_partsupp(
        _t(spark, sf, "part"), _t(spark, sf, "supplier"),
        s_cnt=_SCNT_MEMO[sf],
    )


def q2_min_cost_supplier(spark, sf):
    """TPC-H Q2-style minimum-cost supplier: for ECONOMY parts of size
    15, the EUROPE supplier(s) offering the part at the region-minimum
    supplycost.

    Scale shape: the part filter broadcasts FIRST (partsupp touches only
    qualifying parts), the supplier→nation→region dimension chain
    broadcasts onto partsupp, and the per-part minimum runs over the
    already-tiny candidate set — the correlated subquery in the spec
    text becomes one window min, no self-join, no second partsupp scan."""
    from pyspark.sql import Window

    part = _t(spark, sf, "part")
    supplier = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation")
    region = _t(spark, sf, "region")

    tp = part.filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey", "p_type")
    eu = (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        _partsupp(spark, sf)
        .join(F.broadcast(tp), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("ps_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("__mc", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("__mc"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            "ps_supplycost",
        )
    )


def q9_product_type_profit(spark, sf):
    """TPC-H Q9-style product-type profit: per supplier nation and order
    year, SUM(l_extendedprice*(1-l_discount) - ps_supplycost*l_quantity)
    over lineitems of 'red%' parts.

    Scale shape: the name-filtered part list broadcasts onto partsupp
    (4 rows/part), that slim cost map broadcasts onto lineitem along
    with supplier→nation — the fact table is filtered and enriched in
    its scan stage; the only shuffle joins the surviving lineitems with
    the slim (o_orderkey, year) projection of orders, then one hash
    aggregate on (nation, year) with the exact-decimal sum."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    red_parts = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    ps = _partsupp(spark, sf).join(
        F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey")
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost")
    sn = (
        _t(spark, sf, "supplier")
        .join(
            F.broadcast(_t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    enriched = (
        li.join(
            F.broadcast(ps),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return enriched.groupBy("n_name", "o_year").agg(
        _dsum(amount).alias("profit")
    )


def q11_important_stock(spark, sf):
    """TPC-H Q11-style important stock: per part, the total
    supplycost*availqty held by NATION_15 suppliers, keeping parts whose
    value exceeds 1/500 of the nation-wide total.

    Scale shape: nation-filtered suppliers broadcast onto partsupp, one
    hash aggregate per part, and the HAVING threshold is a 1-row
    broadcast stat frame cross-joined back (the established scalar
    pattern) — partsupp is scanned once."""
    nat_supp = (
        _t(spark, sf, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_15")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    held = (
        _partsupp(spark, sf)
        .join(F.broadcast(nat_supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("__v"),
        )
    )
    per_part = held.groupBy("ps_partkey").agg(_dsum(F.col("__v")).alias("value"))
    total = per_part.agg(
        _dsum(F.col("value")).alias("__total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("__total") / 500)
        .select("ps_partkey", "value")
    )


def q16_parts_supplier_relationship(spark, sf):
    """TPC-H Q16-style: distinct supplier count per (brand, type, size)
    for selected sizes, excluding one brand, PROMO types, and suppliers
    with negative balances (the testdata has no s_comment, so the
    'complaints' exclusion keys on s_acctbal < 0 — same anti-join shape).

    Scale shape: the exclusion list broadcasts as an anti-join into the
    partsupp scan; COUNT(DISTINCT) shuffles once on the slim
    (brand, type, size, suppkey) projection."""
    part = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    ps = _partsupp(spark, sf).join(
        F.broadcast(bad_supp),
        F.col("ps_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


def q20_potential_promotion(spark, sf):
    """TPC-H Q20-style potential part promotion: NATION_3 suppliers
    holding more than half the 1996 shipped quantity of some 'red%'
    part they supply.

    Scale shape: lineitem aggregates FIRST on (partkey, suppkey) — the
    fact never joins at row grain; the name-filtered partsupp side
    broadcasts onto that aggregate; the surviving supplier keys
    broadcast as a semi-join into the supplier dimension."""
    red_parts = (
        _t(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    ps = _partsupp(spark, sf).join(
        F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey")
    ).select("ps_partkey", "ps_suppkey", "ps_availqty")
    shipped = (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(_dsum(F.col("l_quantity"), 2).alias("__qty"))
    )
    qualifying = (
        shipped.join(
            F.broadcast(ps),
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > F.col("__qty") * 0.5)
        .select("ps_suppkey")
        .distinct()
    )
    nat3 = (
        _t(spark, sf, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return nat3.join(
        qualifying,
        nat3.s_suppkey == qualifying.ps_suppkey,
        "left_semi",
    )


def q_bloom_join(spark, sf):
    """Bloom-prefiltered selective join: high-value orders (too big to
    pretend-broadcast, selective vs the fact) pre-filter lineitem
    through a broadcast hashed-bucket set BEFORE the shuffled exact
    join.  The pre-filter admits false positives only, so the joined
    port is byte-identical to the plain join — which is exactly what
    the oracle states (DuckDB runs the straightforward join; agreement
    proves the bloom path drops no true match)."""
    from asakusafw_spark_spark.operators import bloom_prefilter

    orders = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    pre = bloom_prefilter(orders, li, [("o_orderkey", "l_orderkey")], buckets=1 << 16)
    return master_join(
        orders,
        pre,
        [("o_orderkey", "l_orderkey")],
        strategy="shuffled",
        unique_master=True,
    )["joined"].select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "o_orderstatus",
        "o_totalprice",
    )


def q_scd2_apply(spark, sf):
    """SCD type-2 dimension build: each customer's orders (deduped to
    one per order date) are successive versions of a customer-state
    dimension — the earliest version is the open history, the rest
    arrive as 'U' changes, and scd2_apply chains valid_from/valid_to
    with one lead() window per key.  The oracle states the flattened
    equivalent: lead(date) over (partition by customer order by date)
    on the same deduped version set."""
    from asakusafw_spark_spark.operators import scd2_apply
    from pyspark.sql.window import Window

    o = _t(spark, sf, "orders").select("o_custkey", "o_orderdate", "o_totalprice",
                                       "o_orderkey")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy("o_orderkey")
    versions = (
        o.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("eff"),
        )
    )
    wk = Window.partitionBy("k").orderBy("eff")
    first = (
        versions.withColumn("__vn__", F.row_number().over(wk))
        .filter(F.col("__vn__") == 1)
        .select(
            "k",
            "price",
            F.col("eff").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    changes = (
        versions.withColumn("__vn__", F.row_number().over(wk))
        .filter(F.col("__vn__") > 1)
        .select("k", "price", "eff", F.lit("U").alias("__op"))
    )
    out = scd2_apply(first, changes, "k", "eff")
    return out.select("k", "price", "valid_from", "valid_to", "is_current")


def q_incremental_agg(spark, sf):
    """Incremental aggregate maintenance ≡ full recompute, cross-engine:
    a deterministic churn (decimal-exact price bump on keys ≡0 mod 7,
    deletes ≡0 mod 13, inserts cloned from keys ≡0 mod 17) produces a
    change set via snapshot_diff(include_old=True); apply_agg_delta
    folds it into the OLD per-status aggregate without touching the
    base rows.  The oracle aggregates the NEW snapshot from scratch —
    agreement proves maintained state is bit-identical to recompute."""
    from asakusafw_spark_spark.operators import apply_agg_delta, snapshot_diff

    old = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    bumped = F.round(
        F.col("o_totalprice").cast("decimal(27,2)")
        * F.lit("1.1").cast("decimal(3,1)"),
        2,
    ).cast("double")
    new = (
        old.filter(F.col("o_orderkey") % 13 != 0)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 7 == 0, bumped).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            old.filter(F.col("o_orderkey") % 17 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    base = old.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").try_cast("decimal(27,6)")).alias("sum_price"),
    )
    changes = snapshot_diff(old, new, "o_orderkey", include_old=True)
    out = apply_agg_delta(base, changes, "o_orderstatus", {"sum_price": "o_totalprice"})
    return out.select(
        "o_orderstatus", "n", F.col("sum_price").cast("double").alias("sum_price")
    )


def q_streaming_incremental_agg(spark, sf):
    """Materialized aggregate maintained THROUGH the streaming engine:
    orders arrive as two micro-batches (availableNow file stream), each
    folded into a per-status (count, decimal sum) state table by
    apply_agg_delta — never rescanning prior batches.  Decimal addition
    commutes and associates exactly, so the final state is batch-
    -partition-independent and equals the one-shot full aggregate the
    oracle computes."""
    import glob
    import os
    import shutil
    import tempfile

    from asakusafw_spark_spark.streaming import stream_agg_maintain

    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    feed = tempfile.mkdtemp(prefix="aggfeed_")
    _stage_split_feed(orders, F.col("o_orderkey") % 2, [0, 1], feed)

    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_orderstatus string, o_totalprice double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    target = tempfile.mkdtemp(prefix="aggstate_") + "/state"
    stream_agg_maintain(
        stream, target, "o_orderstatus", {"sum_price": "o_totalprice"},
        tempfile.mkdtemp(prefix="ck_agg_"),
        query_name="q_agg_" + os.path.basename(feed),
    )
    from asakusafw_spark_spark.sources.write import HadoopFs

    if not HadoopFs(spark, target).exists(target):
        # an all-empty stream legitimately leaves no state table
        return spark.createDataFrame(
            [], "o_orderstatus string, n long, sum_price double"
        )
    back = spark.read.parquet(target)
    return back.select(
        "o_orderstatus", "n", F.col("sum_price").cast("double").alias("sum_price")
    )


def q_audience_overlap(spark, sf):
    """Theta-sketch set algebra (functions/stats.py audience_overlap):
    pairwise distinct/overlap/union/difference of user audiences across
    event types — one data scan into 5 sketch rows, then pure sketch
    ops on the 10 pairs; never a pairwise join of rows.  Exact at these
    cardinalities (each type's audience ≤ 1,500 distinct users at
    sf0.1, far under the lg_k=14 exact-mode bound of ~16k), so the
    DuckDB twin is the literal DISTINCT-join arithmetic."""
    from asakusafw_spark_spark.functions import audience_overlap

    return audience_overlap(
        _t(spark, sf, "events").select("event_type", "user_id"),
        "event_type", "user_id",
    )


def q_streaming_distinct_sketch(spark, sf):
    """Materialized DISTINCT COUNT maintained through the streaming
    engine (stream_distinct_sketch_maintain): events arrive as two
    micro-batches, each folding a per-event-type HLL sketch into a
    state table; the final merged estimates are compared to exact
    COUNT(DISTINCT user_id).  Exactness note: lg_config_k is pinned to
    16, whose DataSketches coupon (exact) mode holds to ~k/4 = 16,384
    distincts — far above the 1,500 distinct users per type at sf0.1
    (measured: lgK=12 leaves exact mode at 1,500 and estimates 1,488;
    lgK≥14 is exact there).  BUT coupon-mode estimates are still only
    collision-exact: the r10 sf1 sweep caught a single 26-bit coupon
    collision at 3,000 distincts/key (estimate 2999 vs exact 3000), so
    asserting estimate == exact cross-engine is WRONG at scale.  The
    honest, SF-independent contract this query now returns per type:
    the EXACT distinct count (strict-hash vs DuckDB), whether the
    MAINTAINED state's estimate equals the one-shot
    ``hll_sketch_agg`` over the same rows (pins the streamed fold —
    measured bit-equal including through the collision), and whether
    the estimate is within 1% of exact (pins estimator sanity; HLL
    lgK=16 RSE is 0.41%).  Re-seen users across batches fold in as
    register no-ops — the invariant the pytest also pins directly on
    the register state."""
    import glob
    import os
    import shutil
    import tempfile

    from asakusafw_spark_spark.functions import merge_distinct_sketches
    from asakusafw_spark_spark.streaming import (
        stream_distinct_sketch_maintain,
    )

    ev = _t(spark, sf, "events").select("event_id", "event_type", "user_id")
    feed = tempfile.mkdtemp(prefix="skfeed_")
    _stage_split_feed(ev, F.col("event_id") % 2, [0, 1], feed)

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    target = tempfile.mkdtemp(prefix="skstate_") + "/state"
    stream_distinct_sketch_maintain(
        stream, target, "event_type", "user_id",
        tempfile.mkdtemp(prefix="ck_sk_"),
        lg_config_k=16,
        query_name="q_sk_" + os.path.basename(feed),
    )
    from asakusafw_spark_spark.sources.write import HadoopFs

    if not HadoopFs(spark, target).exists(target):
        return spark.createDataFrame(
            [],
            "event_type string, n_distinct_users long, "
            "fold_matches_oneshot boolean, est_within_pct boolean",
        )
    maintained = merge_distinct_sketches(
        spark.read.parquet(target), "event_type", out_col="est"
    )
    oneshot = ev.groupBy(F.col("event_type").alias("__et")).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(16))
        ).alias("oneshot_est"),
        F.countDistinct("user_id").alias("n_distinct_users"),
    )
    # null-safe join: a null event_type group exists on BOTH sides and
    # must pair up, not silently drop (r13 null-injected oracle sweep)
    return maintained.join(
        oneshot, maintained["event_type"].eqNullSafe(F.col("__et"))
    ).select(
        "event_type",
        "n_distinct_users",
        (F.col("est") == F.col("oneshot_est")).alias("fold_matches_oneshot"),
        (
            F.abs(F.col("est") - F.col("n_distinct_users"))
            <= 0.01 * F.col("n_distinct_users")
        ).alias("est_within_pct"),
    )


def q_streaming_theta_maintain(spark, sf):
    """Materialized DISTINCT COUNT WITH SET ALGEBRA maintained through
    the streaming engine (stream_theta_sketch_maintain): events arrive
    as two micro-batches, each folding a per-event-type THETA sketch
    into a state table; the query then answers BOTH the per-type
    distinct count AND each type's user overlap with the 'view' cohort
    straight from the maintained sketch state — the cross-cohort
    question HLL state cannot answer.  Theta sketches are exact under
    ~2^lg_k retained entries (lg_k=14 → ~16k, far above the ~1.5k
    distinct users per type at sf0.1), so both columns hash-match the
    exact oracle deterministically; theta union is idempotent, so
    re-seen users across batches fold in as no-ops."""
    import glob
    import os
    import shutil
    import tempfile

    from asakusafw_spark_spark.streaming import stream_theta_sketch_maintain

    ev = _t(spark, sf, "events").select("event_id", "event_type", "user_id")
    feed = tempfile.mkdtemp(prefix="thfeed_")
    _stage_split_feed(ev, F.col("event_id") % 2, [0, 1], feed)

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, user_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    target = tempfile.mkdtemp(prefix="thstate_") + "/state"
    stream_theta_sketch_maintain(
        stream, target, "event_type", "user_id",
        tempfile.mkdtemp(prefix="ck_th_"),
        query_name="q_th_" + os.path.basename(feed),
    )
    from asakusafw_spark_spark.sources.write import HadoopFs

    if not HadoopFs(spark, target).exists(target):
        return spark.createDataFrame(
            [], "event_type string, n_distinct_users long, "
            "overlap_with_view long"
        )
    state = spark.read.parquet(target)
    # LEFT join on a constant key (not crossJoin): when the 'view'
    # cohort is absent the crossJoin would annihilate every row, while
    # the oracle's LEFT JOIN keeps each event_type with overlap 0.
    view_sk = (
        state.filter(F.col("event_type") == "view")
        .select(F.lit(1).alias("__k"), F.col("sketch").alias("__view"))
    )
    est = F.theta_sketch_estimate
    return (
        state.withColumn("__k", F.lit(1))
        .join(F.broadcast(view_sk), "__k", "left")
        .select(
            "event_type",
            est(F.col("sketch")).cast("long").alias("n_distinct_users"),
            F.when(F.col("__view").isNull(), F.lit(0).cast("long"))
            .otherwise(
                est(F.theta_intersection("sketch", "__view")).cast("long")
            )
            .alias("overlap_with_view"),
        )
    )


def q_lm_score(spark, sf):
    """Bigram-LM quality scoring (CCNet-style perplexity signal) over
    the documents corpus, self-trained with add-0.5 smoothing.
    Per-bigram log-probs round to 6 decimals BEFORE the exact-decimal
    sum, so the per-doc mean is reduction-order-independent and the two
    engines' ln() ulp differences vanish."""
    from asakusafw_spark_spark.functions import bigram_lm_score

    docs = _t(spark, sf, "documents")
    return bigram_lm_score(docs)


def q_constraint_report(spark, sf):
    """Data-quality constraint suite over lineitem: every row-local
    check (not-null, accepted values, range) folds into ONE scan-stage
    aggregate; key uniqueness is one groupBy; referential integrity to
    orders is one left-anti equi-join.  The report is (constraint,
    violations) — the oracle recomputes each count with plain SQL and
    UNION ALL."""
    from asakusafw_spark_spark.functions import check_constraints

    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    return check_constraints(
        li,
        not_null=["l_orderkey", "l_linenumber"],
        unique=[["l_orderkey", "l_linenumber"]],
        accepted_values={"l_returnflag": ["A", "N"]},  # 'R' rows violate
        ranges={"l_discount": (0.0, 0.05)},            # > .05 violates
        where={"qty_cap": F.col("l_quantity") <= 45},
        foreign_keys=[("l_orderkey", orders, "o_orderkey")],
    )


def q_merge_evolve(spark, sf):
    """Schema-evolving merge: updates introduce a channel column the
    base dataset never had; existing rows backfill NULL, update rows
    carry the value.  The oracle reconstructs the merged state with a
    CASE over the original table (update keys ≡0 mod 10 replaced with
    channel='web')."""
    import tempfile

    from asakusafw_spark_spark.sources.write import merge_upsert

    base = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = tempfile.mkdtemp(prefix="evolve_") + "/orders"
    base.write.parquet(target)
    upd = base.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_channel", F.lit("web")
    )
    merge_upsert(target, upd, "o_orderkey", evolve_schema=True)
    back = spark.read.parquet(target)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_channel").alias("n_web"),
        _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


def q_manifest_stats(spark, sf):
    """Footer-driven dataset manifest: write a 4-file copy of documents,
    read every file's footer distributed (mapInPandas over the path
    list — no data scan), and check the invariants the oracle can state
    statically: the file count asked for, and footer num_rows summing
    to the table's row count."""
    import tempfile

    from asakusafw_spark_spark.sources import dataset_manifest

    docs = _t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="manifest_") + "/docs"
    docs.repartition(4).write.parquet(out)
    m = dataset_manifest(spark, out)
    return m.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("num_rows").alias("total_rows"),
    )


def q_analyze_table(spark, sf):
    """One-pass ANALYZE over orders: per-column non-null/exact-distinct
    counts and string-rendered min/max (bigint, string, and timestamp
    columns render identically on both engines)."""
    from asakusafw_spark_spark.functions import analyze_table

    orders = _t(spark, sf, "orders")
    return analyze_table(
        orders,
        ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
        exact_distinct=True,
    )


def q_streaming_quality_report(spark, sf):
    """Streaming data-quality monitoring: lineitem arrives as two
    micro-batches, each appending its row-local constraint counts to a
    report table.  Row-local violations are additive across batches, so
    the report's per-constraint SUM equals the full-table counts the
    oracle computes — batching cannot change the answer."""
    import glob
    import os
    import shutil
    import tempfile

    from asakusafw_spark_spark.streaming import stream_quality_monitor

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_discount", "l_quantity"
    )
    feed = tempfile.mkdtemp(prefix="qfeed_")
    _stage_split_feed(li, F.col("l_orderkey") % 2, [0, 1], feed)

    stream = (
        spark.readStream.schema(
            "l_orderkey long, l_returnflag string, l_discount double, "
            "l_quantity double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    report = tempfile.mkdtemp(prefix="qrep_") + "/report"
    stream_quality_monitor(
        stream, report, tempfile.mkdtemp(prefix="ck_qm_"),
        query_name="q_qm_" + os.path.basename(feed),
        not_null=["l_orderkey"],
        accepted_values={"l_returnflag": ["A", "N"]},
        ranges={"l_discount": (0.0, 0.05)},
        where={"qty_cap": F.col("l_quantity") <= 45},
    )
    from asakusafw_spark_spark.sources.write import HadoopFs

    if not HadoopFs(spark, report).exists(report):
        # an all-empty stream produces no report batches
        return spark.createDataFrame(
            [], "constraint string, violations long, n_batches long"
        )
    rep = spark.read.parquet(report)
    return rep.groupBy("constraint").agg(
        F.sum("violations").alias("violations"),
        F.count(F.lit(1)).alias("n_batches"),
    )


def q_unpivot(spark, sf):
    """UNPIVOT/melt: lineitem's four numeric measures become
    (variable, value) rows — a pure stack() projection, no shuffle.
    Oracle: UNION ALL of one SELECT per measure."""
    from asakusafw_spark_spark.operators import unpivot

    li = _t(spark, sf, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return unpivot(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="measure",
        value_name="value",
    )


def q_flatten_struct(spark, sf):
    """Nested-ingestion flattening: orders packed into a two-level
    struct column then recursively flattened back to leaf columns —
    must equal the plain projection (pure select, column pruning
    reaches the scan)."""
    from asakusafw_spark_spark.operators import flatten_struct

    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.struct(
                F.col("o_totalprice").alias("price"),
                F.col("o_orderpriority").alias("priority"),
            ).alias("detail"),
        ).alias("info"),
    )
    return flatten_struct(o).select(
        "o_orderkey",
        F.col("info_status").alias("status"),
        F.col("info_detail_price").alias("price"),
        F.col("info_detail_priority").alias("priority"),
    )


def q_zorder_roundtrip(spark, sf):
    """Z-order clustering is content-lossless: lineitem re-written on a
    Morton curve over (l_orderkey, l_extendedprice) reads back equal to
    the pristine table (oracle: plain SELECT).  Layout — tight per-file
    min/max on BOTH clustered columns — is asserted by the footer-stats
    test; this query pins that re-clustering never perturbs data."""
    import tempfile

    from asakusafw_spark_spark.sources import write_zordered

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    target = tempfile.mkdtemp(prefix="zorder_") + "/li"
    write_zordered(li, target, ["l_orderkey", "l_extendedprice"], bits=4,
                   num_files=8)
    return spark.read.parquet(target)


def q_cap_per_group(spark, sf):
    """Anti-dominance cap: at most 10 documents per source, selected by
    seed-stable hash order (deterministic reservoir)."""
    from asakusafw_spark_spark.functions import cap_per_group

    docs = _t(spark, sf, "documents")
    return cap_per_group(docs, by="source", n=10, key_col="doc_id").select(
        "doc_id", "source"
    )


def q_winsorize(spark, sf):
    """Per-returnflag winsorization of extended price at [p05, p95] —
    exact interpolated percentiles (≡ DuckDB quantile_cont), clamp as a
    broadcast-joined projection."""
    from asakusafw_spark_spark.functions import winsorize

    li = _t(spark, sf, "lineitem")
    out = winsorize(li, "l_extendedprice", by="l_returnflag", lower=0.05, upper=0.95)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_extendedprice_winsorized").alias("price_w"),
    )


def q_master_join_multikey(spark, sf):
    """Composite (2-column) group key: enrich lineitems from a
    high-quantity master keyed on (orderkey, linenumber)."""
    li = _t(spark, sf, "lineitem")
    masters = li.filter(F.col("l_quantity") > 40).select(
        F.col("l_orderkey").alias("m_ok"),
        F.col("l_linenumber").alias("m_ln"),
        F.col("l_extendedprice").alias("m_price"),
    )
    out = master_join(
        masters,
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        [("m_ok", "l_orderkey"), ("m_ln", "l_linenumber")],
        mapping={
            "l_orderkey": "t.l_orderkey",
            "l_linenumber": "t.l_linenumber",
            "l_quantity": "t.l_quantity",
            "m_price": "m.m_price",
        },
    )
    return out["joined"]


def q_range_join_bands(spark, sf):
    """Keyless band lookup: classify orders into literal price bands
    (broadcast nested-loop over the tiny band table — range_join)."""
    from asakusafw_spark_spark.operators import range_join

    bands = spark.createDataFrame(
        [
            ("small", 0.0, 100000.0),
            ("medium", 100000.0, 250000.0),
            ("large", 250000.0, 1e12),
        ],
        "band string, lo double, hi double",
    )
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    out = range_join(
        bands,
        orders,
        value_col="o_totalprice",
        lo_col="lo",
        hi_col="hi",
        inclusive="[)",
    )
    return out["joined"].select(
        "o_orderkey", "o_totalprice", F.col("band").alias("price_band")
    )


def q_percentile_agg(spark, sf):
    """Exact percentiles (linear interpolation) per group — bit-identical
    to DuckDB quantile_cont."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.95)").alias("p95_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
    )


def q_grouping_sets(spark, sf):
    """Arbitrary GROUPING SETS (rollup/cube's general form): totals by
    (returnflag), by (linestatus), and overall — the () set computed
    with ANSI empty-input semantics (one global row even over an empty
    table; operators.ansi_grouping_sets)."""
    from asakusafw_spark_spark.operators import ansi_grouping_sets

    return ansi_grouping_sets(
        _t(spark, sf, "lineitem"),
        [("l_returnflag",), ("l_linestatus",), ()],
        {"n_items": F.count(F.lit(1))},
    )


def q_summarize_q1(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    li = li.withColumns(
        {
            "disc_price": F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "charge": F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax")),
        }
    )
    # ONE aggregate (r16, guide §2.4): the count/max/min block and the
    # exact-decimal sums used to be two groupBys over the same scan glued
    # by a null-safe join — 2 Exchanges + 2 scans + a BroadcastHashJoin
    # for what is a single GROUP BY.  The decimal casts move into
    # pre-projected columns so @Summarize's SUM kind accumulates the
    # exact decimals (identical expression tree to the old _dsum), and
    # the join disappears; null-key groups come out of the single
    # groupBy exactly as the oracle's single GROUP BY emits them.
    li = li.withColumns(
        {
            "__qty_dec": F.col("l_quantity").try_cast("decimal(27,2)"),
            "__price_dec": F.col("l_extendedprice").try_cast("decimal(27,2)"),
            "__disc_dec": F.col("disc_price").try_cast("decimal(27,6)"),
            "__charge_dec": F.col("charge").try_cast("decimal(27,6)"),
        }
    )
    out = summarize(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "count_order": ("count", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "sum_qty": ("sum", "__qty_dec"),
            "sum_base_price": ("sum", "__price_dec"),
            "sum_disc_price": ("sum", "__disc_dec"),
            "sum_charge": ("sum", "__charge_dec"),
        },
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "count_order",
        "max_qty",
        "min_price",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
    )


def q_fold(spark, sf):
    li = _t(spark, sf, "lineitem").select("l_suppkey", "l_quantity", "l_extendedprice")
    return fold(
        li,
        ["l_suppkey"],
        exprs={
            "l_quantity": _dsum(F.col("l_quantity"), 2),
            "l_extendedprice": F.max("l_extendedprice"),
        },
    )


def q_cogroup(spark, sf):
    import pandas as pd

    orders = _t(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")

    def fn(key, opdf: pd.DataFrame, lpdf: pd.DataFrame) -> dict:
        # dict return → engine's batched single-record fast path.
        # min_count=1 = SQL SUM null semantics: a group whose every
        # quantity is NULL sums to NULL, not pandas' skipna 0.0
        # (divergence caught by the r13 null-injected oracle sweep)
        qty = lpdf["l_quantity"].sum(min_count=1) if len(lpdf) else None
        return {
            "o_orderkey": key[0],
            "n_orders": len(opdf),
            "n_items": len(lpdf),
            "sum_qty": None if qty is None or pd.isna(qty) else round(float(qty), 2),
        }

    return cogroup(
        [
            Grouping(orders, ["o_orderkey"]),
            Grouping(li, ["l_orderkey"], [("l_linenumber", "asc")]),
        ],
        fn,
        "o_orderkey long, n_orders long, n_items long, sum_qty double",
    )


def q_cogroup3(spark, sf):
    import pandas as pd

    customer = _t(spark, sf, "customer").select("c_custkey")
    orders = _t(spark, sf, "orders").select("o_custkey", "o_orderkey")
    events = _t(spark, sf, "events").select("user_id", "event_id")

    def fn(key, cpdf, opdf, epdf) -> dict:
        return {
            "k": key[0],
            "n_cust": len(cpdf),
            "n_orders": len(opdf),
            "n_events": len(epdf),
        }

    return cogroup(
        [
            Grouping(customer, ["c_custkey"]),
            Grouping(orders, ["o_custkey"]),
            Grouping(events, ["user_id"]),
        ],
        fn,
        "k long, n_cust long, n_orders long, n_events long",
    )


def q_group_sort(spark, sf):
    import pandas as pd

    orders = _t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )

    def latest(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.iloc[[0]]

    return group_sort(
        orders,
        ["o_custkey"],
        [("o_orderdate", "desc"), ("o_orderkey", "asc")],
        latest,
        orders.schema,
    )


def q_topk(spark, sf):
    orders = _t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return top_k_per_group(
        orders, ["o_custkey"], [("o_totalprice", "desc"), ("o_orderkey", "asc")], 3
    )


def q_distinct(spark, sf):
    proj = _t(spark, sf, "customer").select("c_mktsegment", "c_nationkey")
    return distinct_records(proj)


# ---------------------------------------------------------------------------
# LLM-data-pipeline queries (documents / embeddings tables)
# ---------------------------------------------------------------------------


def q_redact(spark, sf):
    """PII scrubbing (native regexp_replace chain, zero Python): PII is
    INJECTED deterministically per doc (email + phone + IP built from
    doc_id) so the redaction rules demonstrably fire, then scrubbed with
    the default rule set.  Oracle: the identical concat + RE2-compatible
    regex chain in DuckDB."""
    from asakusafw_spark_spark.functions import redact

    docs = _t(spark, sf, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1555000"),
        F.col("doc_id").cast("string"),
        F.lit(" at 10.0.0."),
        (F.col("doc_id") % 255).cast("string"),
    )
    return docs.select("doc_id", redact(dirty).alias("clean"))


def q_vocab_top_k(spark, sf):
    """Corpus vocabulary top-50 (tf + doc-freq + rank) — distributed
    TakeOrderedAndProject, no global sort."""
    from asakusafw_spark_spark.functions import vocab_top_k

    return vocab_top_k(_t(spark, sf, "documents"), k=50)


def q_tfidf(spark, sf):
    """Per-document TF-IDF (smoothed IDF over the FULL corpus), sampled
    to every 20th doc at the output — the doc-frequency statistics
    deliberately come from all documents, the filter applies after."""
    from asakusafw_spark_spark.functions import tfidf

    out = tfidf(_t(spark, sf, "documents"), min_df=2)
    return out.filter(F.col("doc_id") % 20 == 0)


def q_text_analysis(spark, sf):
    from asakusafw_spark_spark.functions.dedup import ensure_parallelism

    docs = ensure_parallelism(_t(spark, sf, "documents"))
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        lang_id("text").alias("lang_guess"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fp"),
    )


def q_text_repetition(spark, sf):
    """Gopher-style repetition drop signals (token-count approximation of
    Rae et al. 2021 §A1.1) — phrase-level repetition that the
    distinct-token quality score misses."""
    from asakusafw_spark_spark.functions import repetition_signals
    from asakusafw_spark_spark.functions.dedup import ensure_parallelism

    return repetition_signals(ensure_parallelism(_t(spark, sf, "documents")))


def q_cogroup_chunked(spark, sf):
    """Chunk-streaming cogroup (reference Iterable group inputs backed by
    spill buffers, CoGroupOperatorFragment.scala:28-63): per customer,
    order count + max order price + name, consumed INCREMENTALLY from
    (input, chunk) pieces — memory bounded by one Arrow batch regardless
    of group size.  Only order-free exact aggregates (count/max) so the
    chunk iteration order can't perturb the oracle hash."""
    import pandas as pd

    cust = _t(spark, sf, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf, "orders").select("o_custkey", "o_totalprice")

    def fn(key, chunks):
        seen = False
        name = None
        n = 0
        mx = None
        for i, df in chunks:
            if i == 0:
                seen = True
                name = df.iloc[0]["c_name"]
            else:
                n += len(df)
                m = df["o_totalprice"].max()
                if pd.notna(m) and (mx is None or float(m) > mx):
                    mx = float(m)
        if not seen:
            return None  # orphan orders: oracle's LEFT JOIN drops them too
        return {
            "c_custkey": key[0],
            "c_name": name,
            "n_orders": n,
            "max_price": mx,
        }

    return cogroup(
        [
            Grouping(cust, ["c_custkey"]),
            Grouping(orders, ["o_custkey"]),
        ],
        fn,
        "c_custkey long, c_name string, n_orders long, max_price double",
        chunked=True,
    )


def q_dedup_exact(spark, sf):
    return dedup_exact(_t(spark, sf, "documents"))


def q_sample_stratified(spark, sf):
    # deterministic per-language sampling quotas (hash-derived, no rand())
    from asakusafw_spark_spark.functions.sampling import hash_sample

    docs = _t(spark, sf, "documents")
    rates = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1}
    return hash_sample(docs, rates, "doc_id", strata_col="lang").select(
        "doc_id", "lang", "source"
    )


def q_train_val_split(spark, sf):
    from asakusafw_spark_spark.functions.sampling import assign_split

    docs = _t(spark, sf, "documents")
    out = assign_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, "doc_id")
    return out.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))


def q_contamination_check(spark, sf):
    # benchmark hygiene: training docs sharing any 5-gram with the "eval"
    # slice (every 10th doc stands in for a held-out benchmark)
    from asakusafw_spark_spark.functions.dedup import ngram_contamination

    docs = _t(spark, sf, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    eval_set = docs.filter(F.col("doc_id") % 10 == 0)
    return ngram_contamination(train, eval_set, n=5)


def q_corpus_stats(spark, sf):
    from asakusafw_spark_spark.functions.text import corpus_stats

    return corpus_stats(_t(spark, sf, "documents"))


def q_embedding_centroids(spark, sf):
    from asakusafw_spark_spark.functions.similarity import label_centroids

    return label_centroids(_t(spark, sf, "embeddings"))


def q_output_roundtrip(spark, sf):
    """Direct I/O sinks under the ORACLE: orders flow out through BOTH
    sink families — two-phase-committed parquet (TransactionalOutput →
    write_flat) and pattern-grouped per-status CSV (write_grouped, Hadoop
    FS promotion) — then back in through direct_input/read_parquet; the
    query returns per-status counts and exact sums from the ROUNDTRIPPED
    data, which must hash-match the oracle computed on the pristine
    table.  Covers DirectOutputPrepare Flat/Group + Setup/Commit
    (reference DirectOutputPrepare.scala, TransactionManager.scala)."""
    import tempfile
    import uuid

    from asakusafw_spark_spark.sources import (
        TransactionalOutput,
        direct_input,
        write_grouped,
    )

    base = f"{tempfile.gettempdir()}/spark_graft_rt_{uuid.uuid4().hex[:8]}"
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    with TransactionalOutput(base, spark=spark) as tx:
        tx.prepare("orders_snapshot", orders)
    written = write_grouped(
        orders,
        f"{base}/grouped",
        "st={o_orderstatus}/orders.csv",
        ordering=[("o_orderkey", "asc")],
        format="csv",
    )
    csv_schema = "o_orderkey long, o_orderstatus string, o_totalprice double"
    if written:
        csv_back = direct_input(
            spark, f"{base}/grouped/st=*/orders.csv", format="csv",
            schema=csv_schema,
        )
    else:  # empty input wrote no grouped files; a glob read would fail
        csv_back = spark.createDataFrame([], csv_schema)
    pq_back = read_parquet(spark, f"{base}/orders_snapshot")
    c = csv_back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_csv"),
        _dsum(F.col("o_totalprice"), 2).alias("sum_csv"),
    )
    p = pq_back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_parquet"),
        _dsum(F.col("o_totalprice"), 2).alias("sum_parquet"),
    )
    return c.join(p, "o_orderstatus")


def q_group_view_lookup(spark, sf):
    """GroupView broadcast side-input under the oracle: a nation-keyed
    view (driver-bounded broadcast, reference MapBroadcast) consulted
    per record inside an Arrow-batched mapInPandas — the escape hatch
    for lookups a join can't express — then aggregated.  Oracle is the
    equivalent plain join."""
    import pandas as pd

    from asakusafw_spark_spark.operators import group_view

    nation = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    view = group_view(nation, ["n_nationkey"])

    def lookup(batches):
        for pdf in batches:
            rows = view.value
            names = [
                (rows.get((int(k),), [{}])[0].get("n_name"))
                for k in pdf["c_nationkey"]
            ]
            yield pd.DataFrame({"n_name": names})

    named = cust.mapInPandas(lookup, "n_name string")
    return named.groupBy("n_name").agg(F.count(F.lit(1)).alias("n_customers"))


def q_bucketed_join(spark, sf):
    """Shuffle-elision via bucketed storage (reference PARTITIONED
    subplan outputs): both sides written bucketed on the join key, then
    sort-merge joined WITHOUT any Exchange (asserted by test_io; here
    the RESULT is oracle-checked).  Fixed table names + overwrite mode:
    repeated runs replace rather than accumulate catalog entries."""
    from asakusafw_spark_spark.sources import write_bucketed

    tag = "q"
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = _t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, f"bjo_{tag}", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        f"bjl_{tag}", ["o_orderkey"], 8, sort_by=["o_orderkey"],
    )
    o = spark.table(f"bjo_{tag}")
    l = spark.table(f"bjl_{tag}")
    joined = o.hint("merge").join(l, "o_orderkey")
    return joined.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_quantity"), 2).alias("sum_qty"),
    )


def q_token_budget(spark, sf):
    # corpus token budgeting: whitespace vs BPE-piece counts per source
    from asakusafw_spark_spark.functions.text import bpe_token_count, token_count

    docs = _t(spark, sf, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("ws_tokens"),
        F.sum(bpe_token_count("text")).alias("bpe_tokens"),
    )


def q_dedup_minhash_lsh(spark, sf):
    return minhash_lsh_pairs(_t(spark, sf, "documents"), threshold=0.5)


def q_dedup_clusters(spark, sf):
    """Full fuzzy-dedup decision pipeline: MinHash-LSH pairs → connected
    components (iterative min-label propagation) → per-doc cluster label,
    min-id keeper flag, cluster size.  Oracle: the same pair SQL fed to a
    recursive transitive-closure CTE."""
    from asakusafw_spark_spark.functions import dup_clusters

    docs = _t(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    return dup_clusters(
        pairs, nodes=docs.select("doc_id"), node_col="doc_id"
    )


def q_dedup_corpus(spark, sf):
    """Terminal dedup step: MinHash-LSH pairs → connected components →
    the DEDUPED corpus itself (one keeper doc per cluster, every
    original column + absorbed-cluster size).  Oracle: the
    dedup_clusters recursive CTE filtered to keepers, joined back."""
    from asakusafw_spark_spark.functions import dedup_corpus

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "source", "text")
    return dedup_corpus(docs, threshold=0.5).select(
        "doc_id", "lang", "source", "cluster_size"
    )


def q_dedup_corpus_best(spark, sf):
    """Quality-keeper dedup: same clusters as ``dedup_corpus``, but each
    cluster keeps its LONGEST member (max n_chars, min-id tiebreak) —
    the keeper policy curation pipelines actually want.  Oracle: the
    recursive-CTE clustering with a two-stage argmax."""
    from asakusafw_spark_spark.functions import dedup_corpus

    docs = _t(spark, sf, "documents").select(
        "doc_id", "lang", "source", "text", "n_chars"
    )
    return dedup_corpus(docs, threshold=0.5, keep_by="n_chars").select(
        "doc_id", "lang", "source", "cluster_size"
    )


def q_quality_filter(spark, sf):
    """Per-language bottom-quintile quality cut (cume_dist window —
    rank semantics, no float interpolation, so the kept set is
    deterministic and oracle-exact; percent_rank would wrongly drop
    all-tied groups).  The approx=True variant (percentile_approx
    cutoffs, no per-group sort) is the 100 TB path."""
    from asakusafw_spark_spark.functions import quality_quantile_filter

    docs = _t(spark, sf, "documents")
    out = quality_quantile_filter(docs, drop_frac=0.2, by=("lang",))
    return out.select("doc_id", "lang", "quality")


def q_merge_upsert(spark, sf):
    """CDC merge roundtrip through the upsert sink: initial load →
    one merge carrying updates (price bump), tombstones, and inserts →
    read back → aggregate.  Oracle: the same merge as pure SQL."""
    import tempfile

    from asakusafw_spark_spark.sources.write import merge_upsert

    base = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    target = tempfile.mkdtemp(prefix="merge_target_") + "/orders"
    merge_upsert(target, base, "o_orderkey")
    upd = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn(
            "o_totalprice",
            F.round(
                F.col("o_totalprice").cast("decimal(27,2)")
                * F.lit("1.1").cast("decimal(3,1)"),
                2,
            ).cast("double"),
        )
        .withColumn("__del", F.lit(False))
    )
    dels = base.filter(F.col("o_orderkey") % 10 == 1).withColumn("__del", F.lit(True))
    news = (
        base.filter(F.col("o_orderkey") % 10 == 2)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
        .withColumn("__del", F.lit(False))
    )
    merge_upsert(
        target,
        upd.unionByName(dels).unionByName(news),
        "o_orderkey",
        delete_col="__del",
    )
    back = spark.read.parquet(target)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


def q_mix_corpus(spark, sf):
    """Deterministic data-mixture sampling: four sources blended toward
    a 2000-token budget (one over-quota source capped at rate<1, the
    absent sources at rate 0); output = the sampled (doc_id, source)
    set, replay-identical by construction."""
    from asakusafw_spark_spark.functions import mix_corpus

    docs = _t(spark, sf, "documents")
    out = mix_corpus(
        docs,
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        token_budget=2000,
    )
    return out.select("doc_id", "source")


def q_shard_assignment(spark, sf):
    """Deterministic training-shard assignment: per-shard counts and the
    min/max order hash (exact int64 both engines — the full assignment
    is hash-derived, so the oracle checks the actual shard function)."""
    from asakusafw_spark_spark.functions import assign_shards

    docs = _t(spark, sf, "documents").select("doc_id")
    return (
        assign_shards(docs, 8, "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("shard_order").alias("min_order"),
            F.max("shard_order").alias("max_order"),
        )
    )


def q_pack_sequences(spark, sf):
    """Concat-then-chunk sequence packing (512-token packs, per-source
    domains, deterministic hash layout): each doc's pack id + token
    offset — pure window math, one shuffle, replay-identical."""
    from asakusafw_spark_spark.functions import pack_sequences

    docs = _t(spark, sf, "documents")
    return pack_sequences(docs, 512, by="source").select(
        "doc_id", "source", "n_tokens", "pack_id", "pack_pos"
    )


def q_materialize_packs(spark, sf):
    """Packing materialized into training rows: per (source, pack) the
    ordered concatenated text, comma-joined doc ids, token total —
    window shuffle + ONE bounded hash aggregate (per-group state ≤ the
    pack budget by construction)."""
    from asakusafw_spark_spark.functions import materialize_packs

    docs = _t(spark, sf, "documents")
    return materialize_packs(docs, 512, by="source").select(
        "source", "pack_id", "n_docs", "n_tokens", "doc_ids", "pack_text"
    )


def q_chunk_documents(spark, sf):
    """Token-budgeted sliding-window chunking (40-token chunks, 8-token
    overlap) — pure native explode/slice, no shuffle, no Python."""
    from asakusafw_spark_spark.functions import chunk_documents

    return chunk_documents(_t(spark, sf, "documents"), chunk_tokens=40, overlap=8)


def q_streaming_cdc_upsert(spark, sf):
    """CDC micro-batches applied THROUGH the streaming engine
    (file stream → foreachBatch → merge_upsert), then read back and
    aggregated.  The two batches touch disjoint key classes, so the
    final state is batch-order-independent and equals the single-merge
    oracle (same SQL as ``merge_upsert``)."""
    import glob
    import os
    import shutil
    import tempfile

    from asakusafw_spark_spark.streaming import stream_merge_upsert

    base = _t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    target = tempfile.mkdtemp(prefix="cdc_target_") + "/orders"
    base.write.parquet(target)

    b1 = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn(
            "o_totalprice",
            F.round(
                F.col("o_totalprice").cast("decimal(27,2)")
                * F.lit("1.1").cast("decimal(3,1)"),
                2,
            ).cast("double"),
        )
        .withColumn("__del", F.lit(False))
    )
    b2 = (
        base.filter(F.col("o_orderkey") % 10 == 1)
        .withColumn("__del", F.lit(True))
        .unionByName(
            base.filter(F.col("o_orderkey") % 10 == 2)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
            .withColumn("__del", F.lit(False))
        )
    )
    cdc_dir = tempfile.mkdtemp(prefix="cdc_stream_")
    for i, b in enumerate([b1, b2]):
        stage = tempfile.mkdtemp(prefix="cdc_part_") + "/out"
        b.coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dest = f"{cdc_dir}/{i:04d}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))  # batch order

    stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, __del boolean"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(cdc_dir)
    )
    stream_merge_upsert(
        stream, target, "o_orderkey", tempfile.mkdtemp(prefix="ck_cdc_"),
        delete_col="__del", query_name="q_cdc_" + os.path.basename(cdc_dir),
    )
    back = spark.read.parquet(target)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
    )


def q_streaming_dedup_ingest(spark, sf):
    """Ingestion dedup THROUGH the streaming engine: the odd-id half of
    the corpus arrives as a 2-file stream, each micro-batch dedupes
    against a static index of the even-id history, survivors append.
    Batch boundaries cannot change the survivor set (static index,
    per-doc decisions, and the oversized-bucket cap counts HISTORY rows
    only — a batch-inclusive count would make admission depend on
    micro-batch size, the divergence the r09 sf1 sweep caught), so the
    read-back equals the batch ``dedup_incremental`` oracle exactly."""
    import glob
    import os
    import shutil
    import tempfile

    from asakusafw_spark_spark.functions import build_dedup_index
    from asakusafw_spark_spark.streaming import stream_dedup_ingest

    docs = _t(spark, sf, "documents")
    index = build_dedup_index(docs.filter(F.col("doc_id") % 2 == 0))
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    stream_dir = tempfile.mkdtemp(prefix="ingest_stream_")
    _stage_split_feed(batch, F.col("doc_id") % 4, [1, 3], stream_dir)

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    target = tempfile.mkdtemp(prefix="ingest_target_") + "/docs"
    os.makedirs(target, exist_ok=True)  # empty stream appends nothing
    stream_dedup_ingest(
        stream, index, target, tempfile.mkdtemp(prefix="ck_ingest_"),
        threshold=0.5, query_name="q_ingest_" + os.path.basename(stream_dir),
    )
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(target)
    return back.select("doc_id", "lang", "source", "n_chars")


def q_dedup_ngram_jaccard(spark, sf):
    # max_doc_freq=5 actually prunes at the oracle corpus (29 shingles have
    # df>5 at sf0.01), so the driver verifies the CAPPED semantics — the
    # scale path — not just the exact quadratic one
    return ngram_jaccard_pairs(_t(spark, sf, "documents"), threshold=0.3, max_doc_freq=5)


def q_text_simhash(spark, sf):
    from asakusafw_spark_spark.functions.dedup import ensure_parallelism

    return ensure_parallelism(_t(spark, sf, "documents")).select(
        "doc_id", simhash("text").alias("simhash")
    )


def q_dedup_simhash_groups(spark, sf):
    return simhash_dup_groups(_t(spark, sf, "documents"))


def q_dedup_simhash_pairs(spark, sf):
    from asakusafw_spark_spark.functions import simhash_pairs

    # defaults: bits=64 (16-bit chunks), max_bucket=500 — the
    # scale-safe configuration the r09 sf1 crash mandated
    return simhash_pairs(_t(spark, sf, "documents"), max_hamming=3)


def q_url_canonical_dedup(spark, sf):
    """Crawl-style URL dedup: canonicalize (lowercase scheme/host,
    default-port strip, fragment drop, trailing-slash trim, tracking
    params removed, query params sorted) then ONE hash aggregate.  The
    testdata has no URL column, so both engines CONSTRUCT the same
    surface forms from lineitem (scheme/port/slash/param-order/fragment
    variety keyed on (l_orderkey, l_linenumber)) — per-part groups then
    collapse to one canonical URL with counted surface forms."""
    from asakusafw_spark_spark.functions import dedup_urls

    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_linenumber")
    v = (F.col("l_orderkey") * 4 + F.col("l_linenumber")).cast("long")
    raw = F.concat(
        F.when(v % 2 == 0, F.lit("http")).otherwise(F.lit("HTTPS")),
        F.lit("://Shop.Example.COM"),
        F.when(
            v % 3 == 0,
            F.when(v % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        ).when(v % 3 == 1, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/parts/"),
        F.col("l_partkey").cast("string"),
        F.when(v % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(v % 2 == 0, F.lit("?b=2&a=1&utm_source=feed")).otherwise(
            F.lit("?a=1&b=2")
        ),
        F.when(v % 5 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    from asakusafw_spark_spark.functions.dedup import ensure_parallelism

    # The sf* lineitem files are single-row-group parquet, so the scan
    # yields ~1 effective split and the canonicalizer (the CPU-heavy
    # stage) runs on one core.  ensure_parallelism spreads the slim url
    # column when (and only when) the file listing says the scan is
    # narrower than the cluster — on a real 100 TB input it's a no-op.
    return dedup_urls(ensure_parallelism(li).select(raw.alias("url")))


def q_dedup_edit_distance(spark, sf):
    """Fuzzy-dup pairs with an EXACT character-edit-distance bound:
    MinHash-LSH candidates → native levenshtein ≤ 20 (the corpus's
    planted near-dups differ by one appended token; exact dups are
    distance 0).  Set-similarity (Jaccard) is order-free; edit distance
    is the byte-drift ground truth — both verifiers share one banded
    candidate generator."""
    from asakusafw_spark_spark.functions import edit_distance_pairs

    return edit_distance_pairs(_t(spark, sf, "documents"), max_distance=20)


def q_similarity_bruteforce(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


def q_similarity_lsh_ann(spark, sf):
    # multi-table LSH: 6 planes x 4 tables — candidates from a bucket match
    # in ANY table, each pair scored once. tools/ann_recall.py: recall@10
    # 0.226 vs 0.070 single-table at the same planes (3.2x)
    emb = _t(spark, sf, "embeddings")
    return lsh_ann_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, planes=6, num_tables=4
    )


def q_similarity_ivf(spark, sf):
    from asakusafw_spark_spark.functions import ivf_topk

    emb = _t(spark, sf, "embeddings")
    # quantizer="ids" pinned: the SQL-replicable centroid choice DuckDB
    # can re-derive (the function default is kmeans @ nprobe=4 — the
    # higher-recall path, but not oracle-expressible)
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=8, nprobe=2,
        quantizer="ids",
    )


def q_similarity_near_dup(spark, sf):
    emb = _t(spark, sf, "embeddings")
    # synthetic embeddings are near-orthogonal (max pairwise cosine ~0.51),
    # so the threshold is set where real pairs exist; 2 planes → 4 buckets
    # → dense-enough candidates for a non-empty, still-oracle-exact result
    return cosine_near_dup(emb, threshold=0.45, planes=2)


def q_streaming_window(spark, sf):
    """Hourly windowed aggregation executed THROUGH the streaming engine
    (file stream → watermark → window → availableNow drain), returned as
    the drained batch table.  Oracle: plain GROUP BY date_trunc."""
    import shutil
    import tempfile
    import uuid

    from asakusafw_spark_spark.streaming import (
        run_available_now,
        stream_parquet_source,
        windowed_aggregate,
    )

    stage = tempfile.mkdtemp(prefix="stream_events_")
    _stage_events(sf, stage)
    stream = stream_parquet_source(
        spark,
        stage,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
        ts_is_nanos=True,
    )
    stream = _event_window(stream)
    # event-time validation before the watermark (r15 extreme-ts
    # contract): a single year-9999 event would advance the watermark
    # and nondeterministically drop later micro-batches
    agg = windowed_aggregate(
        stream,
        "ts",
        "1 hour",
        {
            "n": F.count(F.lit(1)),
            "v_sum": F.sum(F.col("value").try_cast("decimal(27,6)")).cast("double"),
        },
        keys=["event_type"],
    )
    name = "q_stream_" + uuid.uuid4().hex[:8]
    # few grouping keys (hour × event_type) → 8 state stores, not 32
    run_available_now(agg, name, tempfile.mkdtemp(prefix="ck_"), state_partitions=8)
    return spark.table(name)


def q_streaming_sessionize(spark, sf):
    """Session windows THROUGH the streaming engine (file stream →
    watermark → session_window → availableNow drain, complete mode).
    Oracle: the same gap-islands SQL as batch sessionize."""
    import shutil
    import tempfile
    import uuid

    from asakusafw_spark_spark.streaming import (
        run_available_now,
        sessionize,
        stream_parquet_source,
    )

    stage = tempfile.mkdtemp(prefix="stream_events_")
    _stage_events(sf, stage)
    stream = stream_parquet_source(
        spark,
        stage,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
        ts_is_nanos=True,
    )
    stream = _event_window(stream)
    # event-time validation before the watermark (r15 extreme-ts
    # contract): a single year-9999 event would advance the watermark
    # and nondeterministically drop later micro-batches
    sess = sessionize(
        stream,
        "ts",
        "30 minutes",
        ["user_id"],
        {
            "n_events": F.count(F.lit(1)),
            "v_sum": F.sum(F.col("value").try_cast("decimal(27,6)")).cast("double"),
        },
    )
    name = "q_stream_sess_" + uuid.uuid4().hex[:8]
    run_available_now(
        sess, name, tempfile.mkdtemp(prefix="ck_"), mode="complete", state_partitions=8
    )
    return spark.table(name)


def q_streaming_dedup(spark, sf):
    """Streaming exact dedup (watermark-bounded state) drained through
    availableNow; output = the deduped key set, which is deterministic
    regardless of which physical record won."""
    import shutil
    import tempfile
    import uuid

    from asakusafw_spark_spark.streaming import (
        run_available_now,
        stream_dedup,
        stream_parquet_source,
    )

    stage = tempfile.mkdtemp(prefix="stream_events_")
    _stage_events(sf, stage)
    stream = stream_parquet_source(
        spark,
        stage,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
        ts_is_nanos=True,
    )
    stream = _event_window(stream)
    # event-time validation before the watermark (r15 extreme-ts
    # contract): a single year-9999 event would advance the watermark
    # and nondeterministically drop later micro-batches
    deduped = stream_dedup(stream, ["user_id", "event_type"], "ts").select(
        "user_id", "event_type", "ts"
    )
    name = "q_stream_dedup_" + uuid.uuid4().hex[:8]
    run_available_now(
        deduped, name, tempfile.mkdtemp(prefix="ck_"), mode="append", state_partitions=8
    )
    return spark.table(name)


def q_streaming_interval_join(spark, sf):
    """Stream-stream event-time interval join: each purchase matched to
    the same user's clicks in the 10 minutes before it, drained via
    availableNow.  The interval condition bounds join state — the
    scalable shape (unbounded stream-stream joins grow state forever)."""
    import shutil
    import tempfile
    import uuid

    from asakusafw_spark_spark.streaming import (
        run_available_now,
        stream_interval_join,
        stream_parquet_source,
    )

    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )

    def ev_stream():
        stage = tempfile.mkdtemp(prefix="stream_ev_")
        _stage_events(sf, stage)
        # event-time validation BEFORE the watermark on BOTH streams
        # (r15 extreme-ts contract; combined-gate red, VERDICT r15 #1):
        # a hot user's far-future row advanced one side's watermark and
        # dropped 4 true pairs on the combined corpus (72 vs 76).
        return _event_window(
            stream_parquet_source(spark, stage, schema, ts_is_nanos=True)
        )

    purchases = (
        ev_stream()
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("p_id"), F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"))
    )
    clicks = (
        ev_stream()
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"))
    )
    joined = stream_interval_join(
        purchases,
        clicks,
        [("p_user", "c_user")],
        left_ts="p_ts",
        right_ts="c_ts",
        lower="0 seconds",
        upper="10 minutes",
    ).select("p_id", "c_id")
    name = "q_stream_ij_" + uuid.uuid4().hex[:8]
    run_available_now(
        joined, name, tempfile.mkdtemp(prefix="ck_"), mode="append", state_partitions=8
    )
    return spark.table(name)


def q_streaming_stateful_count(spark, sf):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running counts drained via availableNow.  Counts are
    order-independent → oracle-exact (the float running_sum is dropped
    here precisely because cross-batch float accumulation order is not
    part of the contract)."""
    import shutil
    import tempfile
    import uuid

    from asakusafw_spark_spark.streaming import (
        run_available_now,
        stateful_running_agg,
        stream_parquet_source,
    )

    stage = tempfile.mkdtemp(prefix="stream_events_")
    _stage_events(sf, stage)
    stream = stream_parquet_source(
        spark,
        stage,
        "event_id long, ts long, user_id long, event_type string, value double, props string",
        ts_is_nanos=True,
    )
    # event-time validation before the watermark, same contract as the
    # whole streaming family (r16): stateful_running_agg carries a
    # watermark, so a far-future row in an early micro-batch would mark
    # later valid batches late — invisible today only because the
    # single-file stage drains in ONE batch.
    stream = _event_window(stream)
    agg = stateful_running_agg(stream, ["user_id"], "value")
    name = "q_stream_state_" + uuid.uuid4().hex[:8]
    run_available_now(
        agg, name, tempfile.mkdtemp(prefix="ck_"), mode="update", state_partitions=8
    )
    return spark.table(name).select("user_id", "running_count")


def q_iterative_rounds(spark, sf):
    """Iterative batch (§3.3): one flow re-executed over parameter
    rounds (market segment per round); parameter-independent nodes are
    built once and persisted across rounds.  Output = union of per-round
    results tagged with the round's parameter."""
    from asakusafw_spark_spark.plans.iterative import IterativeRunner

    runner = IterativeRunner()
    runner.node(
        "joined",
        lambda sp, p: master_join(
            _t(sp, sf, "customer").select("c_custkey", "c_nationkey", "c_mktsegment"),
            _t(sp, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
            [("c_custkey", "o_custkey")],
            unique_master=True,  # c_custkey is the customer PK
            mapping={
                "o_totalprice": "t.o_totalprice",
                "c_nationkey": "m.c_nationkey",
                "c_mktsegment": "m.c_mktsegment",
            },
        )["joined"],
    )  # no param_keys → built ONCE, persisted, shared by all rounds
    runner.node(
        "seg_rev",
        lambda sp, p, joined: summarize(
            joined.filter(F.col("c_mktsegment") == p["segment"]),
            ["c_nationkey"],
            {"n_orders": ("count", "o_totalprice")},
        ).withColumn("segment", F.lit(p["segment"])),
        inputs=["joined"],
        param_keys=["segment"],
    )
    results = []
    runner.run(
        spark,
        rounds=[{"segment": "BUILDING"}, {"segment": "MACHINERY"}],
        collect=lambda i, p, frames: results.append(frames["seg_rev"]),
    )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def q_iterative_transactional_output(spark, sf):
    """Iterative batch × transactional Direct I/O (§3.3 × §2.5): each
    parameter round STAGES its per-segment output under ONE transaction
    and a single commit after the last round promotes everything — the
    reference's DirectOutputSetupForIterative → per-round
    DirectOutputPrepareForIterative → DirectOutputCommitForIterative
    composition (extensions/iterativebatch/runtime/core/.../graph/
    DirectOutputSetupForIterative.scala:30-41,
    DirectOutputCommitForIterative.scala:33-96: one TransactionManager
    commit over every round's resolved container path).  The query
    returns the COMMITTED dataset read back through partition
    discovery, so the oracle hash covers staging, promotion, the
    success marker, and the round-variable path resolution
    (seg={segment}).  The parameter-free join node is built once and
    shared by all rounds (NEVER recompute kind)."""
    import tempfile
    import uuid

    from asakusafw_spark_spark.plans.iterative import IterativeRunner

    base = f"{tempfile.gettempdir()}/spark_graft_itx_{uuid.uuid4().hex[:8]}"
    runner = IterativeRunner()
    runner.node(
        "joined",
        lambda sp, p: master_join(
            _t(sp, sf, "customer").select("c_custkey", "c_nationkey", "c_mktsegment"),
            _t(sp, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
            [("c_custkey", "o_custkey")],
            unique_master=True,  # c_custkey is the customer PK
            mapping={
                "o_totalprice": "t.o_totalprice",
                "c_nationkey": "m.c_nationkey",
                "c_mktsegment": "m.c_mktsegment",
            },
        )["joined"],
    )  # no param_keys → built ONCE, persisted, shared by all rounds
    runner.node(
        "seg_rev",
        lambda sp, p, joined: joined.filter(
            F.col("c_mktsegment") == p["segment"]
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice"), 2).alias("sum_price"),
        ),
        inputs=["joined"],
        param_keys=["segment"],
    )
    runner.sink("seg_rev", "segs/seg={segment}")
    runner.run_transactional(
        spark,
        rounds=[
            {"segment": "BUILDING"},
            {"segment": "MACHINERY"},
            {"segment": "AUTOMOBILE"},
        ],
        base_path=base,
    )
    back = spark.read.parquet(f"{base}/segs")  # seg= partition discovery
    return back.select(
        "c_nationkey",
        "n_orders",
        "sum_price",
        F.col("seg").alias("segment"),
    )


# -- shared DuckDB SQL fragments for the sketch oracles ---------------------

_DUCK_SHINGLES = """
    SELECT doc_id AS id,
           list_distinct(CASE WHEN len(toks) >= 3
             THEN list_transform(range(1, len(toks) - 1),
                                 i -> array_to_string(toks[i:i+2], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS shingles
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents)
"""


def _duck_shingles_n(n: int) -> str:
    """word_shingles(text, n) in DuckDB (distinct word n-grams)."""
    return f"""
    SELECT doc_id AS id,
           list_distinct(CASE WHEN len(toks) >= {n}
             THEN list_transform(range(1, len(toks) - {n - 2}),
                                 i -> array_to_string(toks[i:i+{n - 1}], ' '))
             ELSE [array_to_string(toks, ' ')] END) AS shingles
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM documents)
"""


#: functions.sampling.unit_hash in DuckDB: 60-bit md5-prefix of
#: "<key>:42" mod 1e6, scaled to [0, 1)
_DUCK_UNIT_HASH = (
    "(CAST('0x' || substr(md5(CAST({key} AS VARCHAR) || ':42'), 1, 15) AS BIGINT)"
    " % 1000000) / 1000000.0"
)


def _duck_sig_terms(k: int = 8, seed: int = 42) -> str:
    terms = [
        f"list_min(list_transform(hs, h -> (h*{a}+{b})%{MERSENNE_P}))"
        for a, b in _affine_params(k, seed)
    ]
    return "[" + ", ".join(terms) + "]"


def _duck_minhash_lsh_sql(threshold: float = 0.5, k: int = 8, bands: int = 4,
                          max_bucket: int = 500) -> str:
    # Multi-referenced CTEs are AS MATERIALIZED: DuckDB INLINES plain
    # CTEs, so `sigs` (referenced by banded0 + both sides of the verify
    # join) and `banded` (self-joined) would each re-run the whole
    # shingle+md5+minhash pipeline per reference — measured 2.1× on the
    # pair query and 10.5× on the recursive clustering oracles at sf1
    # (227.6 s → 21.6 s), value-hash identical.
    r = k // bands
    band_rows = ", ".join(
        "{{'band': {b}, 'key': CAST(sig[{i1}] AS VARCHAR) || ':' || "
        "CAST(sig[{i2}] AS VARCHAR)}}".format(b=b, i1=b * r + 1, i2=b * r + 2)
        for b in range(bands)
    )
    return f"""
        WITH base AS ({_DUCK_SHINGLES}),
        hashed AS (
          SELECT id, shingles,
                 list_transform(shingles,
                   s -> CAST('0x' || substr(md5(s),1,15) AS BIGINT) % {MERSENNE_P}) AS hs
          FROM base),
        sigs AS MATERIALIZED (SELECT id, shingles, {_duck_sig_terms(k)} AS sig FROM hashed),
        banded0 AS (
          SELECT id, shingles, bk.band AS band, bk.key AS key
          FROM sigs, UNNEST([{band_rows}]) AS t(bk)),
        -- oversized-bucket cap (mirrors minhash_lsh_pairs max_bucket)
        bkeep AS (
          SELECT band, key FROM banded0
          GROUP BY band, key HAVING COUNT(*) <= {max_bucket}),
        banded AS MATERIALIZED (
          SELECT banded0.* FROM banded0 JOIN bkeep USING (band, key)),
        -- ids only through the candidate aggregate (shingle LISTS per
        -- candidate pair inside a GROUP BY are non-spillable and blew
        -- the 48GB oracle budget at sf1); lists re-join at scoring
        -- time, where the filter consumes the join stream
        cand AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
          WHERE a.id < b.id GROUP BY 1, 2),
        scored AS (
          SELECT c.id_a, c.id_b,
                 CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
                 CAST(len(sa.shingles) + len(sb.shingles)
                      - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                   AS jac
          FROM cand c
          JOIN sigs sa ON sa.id = c.id_a
          JOIN sigs sb ON sb.id = c.id_b)
        SELECT id_a, id_b, round(jac, 6) AS jaccard
        FROM scored WHERE jac >= {threshold}
    """


def _duck_edit_distance_sql(max_distance: int = 20, k: int = 8,
                            bands: int = 4, max_bucket: int = 500) -> str:
    """edit_distance_pairs in DuckDB: the minhash band candidate
    machinery + a byte-exact levenshtein verify (== Spark's
    character-based verify on the ASCII oracle corpus)."""
    r = k // bands
    band_rows = ", ".join(
        "{{'band': {b}, 'key': CAST(sig[{i1}] AS VARCHAR) || ':' || "
        "CAST(sig[{i2}] AS VARCHAR)}}".format(b=b, i1=b * r + 1, i2=b * r + 2)
        for b in range(bands)
    )
    return f"""
        WITH base AS ({_DUCK_SHINGLES}),
        hashed AS (
          SELECT id, shingles,
                 list_transform(shingles,
                   s -> CAST('0x' || substr(md5(s),1,15) AS BIGINT) % {MERSENNE_P}) AS hs
          FROM base),
        sigs AS (SELECT id, {_duck_sig_terms(k)} AS sig FROM hashed),
        banded0 AS (
          SELECT id, bk.band AS band, bk.key AS key
          FROM sigs, UNNEST([{band_rows}]) AS t(bk)),
        bkeep AS (
          SELECT band, key FROM banded0
          GROUP BY band, key HAVING COUNT(*) <= {max_bucket}),
        banded AS MATERIALIZED (
          SELECT banded0.* FROM banded0 JOIN bkeep USING (band, key)),
        cand AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
          WHERE a.id < b.id GROUP BY 1, 2)
        SELECT c.id_a, c.id_b,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance
        FROM cand c
        JOIN documents da ON da.doc_id = c.id_a
        JOIN documents db ON db.doc_id = c.id_b
        WHERE abs(length(da.text) - length(db.text)) <= {max_distance}
          AND levenshtein(da.text, db.text) <= {max_distance}
    """


_DUCK_URL_CANON = r"""
    WITH raw AS (
      SELECT (CASE WHEN v % 2 = 0 THEN 'http' ELSE 'HTTPS' END)
             || '://Shop.Example.COM'
             || (CASE WHEN v % 3 = 0
                      THEN (CASE WHEN v % 2 = 0 THEN ':80' ELSE ':443' END)
                      WHEN v % 3 = 1 THEN ':8080' ELSE '' END)
             || '/parts/' || CAST(l_partkey AS VARCHAR)
             || (CASE WHEN v % 4 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN v % 2 = 0 THEN '?b=2&a=1&utm_source=feed'
                      ELSE '?a=1&b=2' END)
             || (CASE WHEN v % 5 = 0 THEN '#sec' ELSE '' END) AS url
      FROM (SELECT l_orderkey * 4 + l_linenumber AS v, l_partkey FROM lineitem)
    ),
    defrag AS (SELECT url, regexp_replace(trim(url), '#.*$', '') AS u0 FROM raw),
    parts AS (
      SELECT url,
        lower(regexp_extract(u0, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(u0, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0,
        regexp_replace(
          regexp_extract(u0, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
          '/+$', '') AS path,
        regexp_extract(u0, '\?([^#]*)', 1) AS query
      FROM defrag),
    canon AS (
      SELECT url,
        scheme || '://' ||
        (CASE WHEN scheme = 'http' AND host0 LIKE '%:80'
                THEN substr(host0, 1, len(host0) - 3)
              WHEN scheme = 'https' AND host0 LIKE '%:443'
                THEN substr(host0, 1, len(host0) - 4)
              ELSE host0 END) || path ||
        (CASE WHEN len(plist) > 0 THEN '?' || array_to_string(plist, '&')
              ELSE '' END) AS canonical_url
      FROM (SELECT url, scheme, host0, path,
                   list_sort(list_filter(
                     string_split(regexp_replace(query,
                       '(?:^|&)(?:utm_[a-z]+|gclid|fbclid|msclkid|ref)=[^&]*',
                       '', 'g'), '&'),
                     p -> p <> '')) AS plist
            FROM parts))
    SELECT canonical_url, COUNT(*) AS n_rows,
           COUNT(DISTINCT url) AS n_forms
    FROM canon GROUP BY 1
"""


def _duck_incremental_sql(threshold: float = 0.5, k: int = 8, bands: int = 4,
                          max_bucket: int = 500) -> str:
    """dedup_against_corpus (even ids = history, odd ids = batch) in DuckDB."""
    r = k // bands
    band_rows = ", ".join(
        "{{'band': {b}, 'key': CAST(sig[{i1}] AS VARCHAR) || ':' || "
        "CAST(sig[{i2}] AS VARCHAR)}}".format(b=b, i1=b * r + 1, i2=b * r + 2)
        for b in range(bands)
    )
    return f"""
        WITH base AS ({_DUCK_SHINGLES}),
        hashed AS (
          SELECT id, shingles,
                 list_transform(shingles,
                   s -> CAST('0x' || substr(md5(s),1,15) AS BIGINT) % {MERSENNE_P}) AS hs
          FROM base),
        sigs AS MATERIALIZED (SELECT id, shingles, {_duck_sig_terms(k)} AS sig FROM hashed),
        banded0 AS (
          SELECT id, shingles, bk.band AS band, bk.key AS key
          FROM sigs, UNNEST([{band_rows}]) AS t(bk)),
        -- oversized-bucket cap over HISTORY rows only (mirrors
        -- dedup_against_corpus max_bucket: batch rows don't count, so
        -- admission is micro-batch-boundary-independent); batch rows in
        -- buckets with no history presence drop out too (no match
        -- possible)
        bkeep AS (
          SELECT band, key FROM banded0 WHERE id % 2 = 0
          GROUP BY band, key HAVING COUNT(*) <= {max_bucket}),
        banded AS MATERIALIZED (
          SELECT banded0.* FROM banded0 JOIN bkeep USING (band, key)),
        cand AS (
          SELECT a.id AS old_id, b.id AS new_id
          FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
          WHERE a.id % 2 = 0 AND b.id % 2 = 1 GROUP BY 1, 2),
        matched AS (
          SELECT DISTINCT c.new_id FROM cand c
          JOIN sigs sa ON sa.id = c.old_id
          JOIN sigs sb ON sb.id = c.new_id
          WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
                CAST(len(sa.shingles) + len(sb.shingles)
                     - len(list_intersect(sa.shingles, sb.shingles))
                     AS DOUBLE) >= {threshold})
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE doc_id % 2 = 1
          AND doc_id NOT IN (SELECT new_id FROM matched)
    """


def _duck_ngram_jaccard_sql(threshold: float = 0.3, max_doc_freq: int = 5) -> str:
    # mirrors ngram_jaccard_pairs' doc-freq cut: shingles in > max_doc_freq
    # docs are dropped from intersections; unions keep FULL set sizes
    return f"""
        WITH base AS ({_DUCK_SHINGLES}),
        ex AS MATERIALIZED (SELECT id, len(shingles) AS sz, unnest(shingles) AS sh FROM base),
        keep AS (SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) <= {max_doc_freq}),
        exk AS MATERIALIZED (SELECT ex.* FROM ex JOIN keep USING (sh)),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n,
                 any_value(a.sz) AS sa, any_value(b.sz) AS sb
          FROM exk a JOIN exk b ON a.sh = b.sh AND a.id < b.id
          GROUP BY 1, 2)
        SELECT id_a, id_b, round(CAST(n AS DOUBLE) / (sa + sb - n), 6) AS jaccard
        FROM inter WHERE round(CAST(n AS DOUBLE) / (sa + sb - n), 6) >= {threshold}
    """


def _duck_simhash_sql(bits: int = 64, table: str = "documents") -> str:
    """``SELECT doc_id, <sketch> AS sh FROM <table>`` — the DuckDB twin
    of :func:`asakusafw_spark_spark.functions.simhash` (two independent
    32-bit md5 halves per token; sketch assembled from exact 32-bit
    half-sums with the signed-hi recombine so bit 63 never overflows a
    BIGINT; integer ops only → bit-identical across engines)."""

    def vote(lst: str, b: int) -> str:
        return (
            f"list_sum(list_transform({lst}, h -> CASE WHEN (h >> {b}) & 1 = 1 "
            f"THEN 1 ELSE -1 END))"
        )

    lo = " + ".join(
        f"(CASE WHEN {vote('hs1', b)} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(min(bits, 32))
    )
    hashes = f"""
        SELECT doc_id,
               list_transform(string_split_regex(trim(text), '\\s+'),
                 s -> CAST('0x' || substr(md5(s),1,8) AS BIGINT)) AS hs1,
               list_transform(string_split_regex(trim(text), '\\s+'),
                 s -> CAST('0x' || substr(md5(s),9,8) AS BIGINT)) AS hs2
        FROM {table}
    """
    if bits <= 32:
        return f"SELECT doc_id, {lo} AS sh FROM ({hashes})"
    hi = " + ".join(
        f"(CASE WHEN {vote('hs2', b)} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(bits - 32)
    )
    return f"""
        SELECT doc_id,
               (CASE WHEN hi >= 2147483648 THEN hi - 4294967296 ELSE hi END)
                 * 4294967296 + lo AS sh
        FROM (SELECT doc_id, {lo} AS lo, {hi} AS hi FROM ({hashes}))
    """


def _duck_lang_hits() -> tuple[str, str]:
    codes = sorted(STOPWORDS)
    hits = ", ".join(
        "len(list_intersect(toks, ["
        + ", ".join(f"'{w}'" for w in STOPWORDS[c])
        + f"])) AS h_{c}"
        for c in codes
    )
    case = f"CASE WHEN greatest({', '.join('h_' + c for c in codes)}) <= 0 THEN 'unknown'"
    for i, c in enumerate(codes[:-1]):
        conds = " AND ".join(f"h_{c} >= h_{o}" for o in codes[i + 1 :])
        case += f" WHEN {conds} THEN '{c}'"
    case += f" ELSE '{codes[-1]}' END"
    return hits, case


#: merge_upsert / streaming_cdc_upsert shared oracle: the pure-SQL
#: equivalent of the CDC merge both queries perform (price bump for
#: keys %10=0, tombstone %10=1, insert shifted copies of %10=2)
_MERGE_ORACLE = """
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders),
    merged AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(round(TRY_CAST(o_totalprice AS DECIMAL(27,2)) * 1.1, 2) AS DOUBLE)
               AS o_totalprice
      FROM base WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             o_totalprice
      FROM base WHERE o_orderkey % 10 = 2
      UNION ALL
      SELECT * FROM base WHERE o_orderkey % 10 NOT IN (0, 1)
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
             AS sum_price
    FROM merged GROUP BY o_orderstatus
"""


def _duck_text_analysis_sql() -> str:
    # null/empty text tokenizes to [] (the engine tokens() contract):
    # zero hits -> 'unknown', n_tokens 0, quality 0.0
    hits, case = _duck_lang_hits()
    return f"""
        WITH t AS (
          SELECT doc_id, text,
                 CASE WHEN text IS NULL OR trim(text) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(text), '\\s+') END AS toks
          FROM documents),
        h AS (SELECT doc_id, text, toks, {hits} FROM t)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               {case} AS lang_guess,
               CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
                 (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.4
                 + least(1.0, (CAST(length(regexp_replace(text,'\\s+','','g')) AS DOUBLE)
                               / len(toks)) / 8.0) * 0.3
                 + (CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)
                    / length(text)) * 0.3, 6) END AS quality,
               md5(lower(trim(regexp_replace(text,'\\s+',' ','g')))) AS fp
        FROM h
    """


def _duck_vec(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


_DUCK_COSINE = (
    "round(list_sum(list_transform(list_zip(qv, cv), p -> p[1]*p[2]))"
    " / (sqrt(list_sum(list_transform(qv, x -> x*x)))"
    " * sqrt(list_sum(list_transform(cv, x -> x*x)))), 6)"
)


def _duck_null_faithful_sim(sim_expr: str, a: str, b: str) -> str:
    """Wrap a DuckDB cosine so a null ELEMENT in either vector yields
    NULL, mirroring Spark's fold propagation (r16): DuckDB's
    list_sum/list_aggregate SKIP null elements (SUM semantics) and
    would fabricate a partial dot where the engine has NULL.  Whole-
    NULL vectors already yield NULL on both sides.  Paired with the
    engine's _rank_topk contract (NULL sim = unscorable = dropped
    before ranking), and with NULLS-LAST DESC ordering — the default
    in BOTH engines — wherever NULL-faithful sims feed a ranking."""
    has_null = (
        f"(len(list_filter({a}, e -> e IS NULL)) > 0"
        f" OR len(list_filter({b}, e -> e IS NULL)) > 0)"
    )
    return f"(CASE WHEN {has_null} THEN NULL ELSE {sim_expr} END)"


def _duck_bruteforce_sql(k: int = 5, nq: int = 10) -> str:
    return f"""
        WITH q AS (SELECT vec_id AS query_id, {_duck_vec('embedding')} AS qv
                   FROM embeddings WHERE vec_id < {nq}),
        c AS (SELECT vec_id AS neighbor_id, {_duck_vec('embedding')} AS cv
              FROM embeddings),
        s AS (SELECT query_id, neighbor_id,
                     {_duck_null_faithful_sim(_DUCK_COSINE, 'qv', 'cv')} AS sim
              FROM q, c WHERE query_id <> neighbor_id)
        SELECT query_id, neighbor_id, sim FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS rn FROM s
          WHERE sim IS NOT NULL
        ) WHERE rn <= {k}
    """


def _duck_bucket_expr(vec_expr: str, planes: int = 6, seed: int = 42, dim: int = 64) -> str:
    parts = []
    for p in range(planes):
        plane = "[" + ", ".join(str(_plane_component(p, d, seed)) for d in range(dim)) + "]"
        proj = (
            f"list_sum(list_transform(list_zip({vec_expr}, {plane}), "
            f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )
        parts.append(f"(CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(parts)


def _duck_ivf_sql(k: int = 5, nq: int = 10, n_centroids: int = 8, nprobe: int = 2) -> str:
    cos_qc = _duck_null_faithful_sim(
        "round(list_sum(list_transform(list_zip(qv, cv), p -> p[1]*p[2]))"
        " / (sqrt(list_sum(list_transform(qv, x -> x*x)))"
        " * sqrt(list_sum(list_transform(cv, x -> x*x)))), 6)",
        "qv", "cv",
    )
    cos_nc = cos_qc.replace("qv", "nv")
    return f"""
        WITH cents AS (SELECT vec_id AS cid, {_duck_vec('embedding')} AS cv
                       FROM embeddings ORDER BY vec_id LIMIT {n_centroids}),
        corpus AS (SELECT vec_id AS neighbor_id, {_duck_vec('embedding')} AS nv
                   FROM embeddings),
        cassign AS (
          SELECT neighbor_id, nv, cid FROM (
            SELECT corpus.*, cents.cid,
                   row_number() OVER (PARTITION BY neighbor_id
                       ORDER BY {cos_nc} DESC, cents.cid ASC) AS pr
            FROM corpus, cents) WHERE pr = 1),
        q AS (SELECT vec_id AS query_id, {_duck_vec('embedding')} AS qv
              FROM embeddings WHERE vec_id < {nq}),
        qprobe AS (
          SELECT query_id, qv, cid FROM (
            SELECT q.*, cents.cid,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY {cos_qc} DESC, cents.cid ASC) AS pr
            FROM q, cents) WHERE pr <= {nprobe}),
        s AS (SELECT query_id, neighbor_id,
                     {_duck_null_faithful_sim(
                         "round(list_sum(list_transform(list_zip(qv, nv), p -> p[1]*p[2]))"
                         " / (sqrt(list_sum(list_transform(qv, x -> x*x)))"
                         " * sqrt(list_sum(list_transform(nv, x -> x*x)))), 6)",
                         "qv", "nv",
                     )} AS sim
              FROM qprobe JOIN cassign USING (cid)
              WHERE query_id <> neighbor_id)
        SELECT query_id, neighbor_id, sim FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS rn FROM s
          WHERE sim IS NOT NULL
        ) WHERE rn <= {k}
    """


def _duck_lsh_ann_sql(
    k: int = 5, nq: int = 10, planes: int = 6, num_tables: int = 1, seed: int = 42
) -> str:
    # multi-table LSH: per-table bucket with seed + 7919·t (matches
    # functions.similarity.LSH_TABLE_SEED_STRIDE); pairs matching in
    # several tables dedupe before scoring
    arms = " UNION ALL ".join(
        f"SELECT vec_id AS neighbor_id, {_duck_vec('embedding')} AS cv, "
        f"{t} AS tbl, {_duck_bucket_expr('embedding', planes, seed=seed + 7919 * t)} "
        f"AS bucket FROM embeddings"
        for t in range(num_tables)
    )
    return f"""
        WITH cb AS ({arms}),
        qb AS (SELECT neighbor_id AS query_id, cv AS qv, tbl, bucket
               FROM cb WHERE neighbor_id < {nq}),
        pairs AS (SELECT query_id, neighbor_id,
                         any_value(qv) AS qv, any_value(cv) AS cv
                  FROM cb JOIN qb USING (tbl, bucket)
                  WHERE query_id <> neighbor_id
                  GROUP BY query_id, neighbor_id),
        s AS (SELECT query_id, neighbor_id,
                     {_duck_null_faithful_sim(_DUCK_COSINE, 'qv', 'cv')} AS sim
              FROM pairs)
        SELECT query_id, neighbor_id, sim FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id ASC) AS rn FROM s
          WHERE sim IS NOT NULL
        ) WHERE rn <= {k}
    """


def q_embedding_dup_clusters(spark, sf):
    """dup_clusters composes across modalities: embedding-cosine near-dup
    pairs (LSH-bucketed) → connected components → per-vector keeper
    decision.  Same operator, different pair generator."""
    from asakusafw_spark_spark.functions import cosine_near_dup, dup_clusters

    emb = _t(spark, sf, "embeddings")
    pairs = cosine_near_dup(emb, threshold=0.45, planes=2)
    return dup_clusters(pairs, nodes=emb.select("vec_id"), node_col="vec_id")


def _shipment_edges(o, li):
    """Bidirectional customer<->supplier edges in ONE pass over the
    lineitem-orders join: each fact row explodes to both directions
    (a fwd-frame union would run the join twice)."""
    c = F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
    s = F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.explode(
                F.array(
                    F.struct(c.alias("src"), s.alias("dst")),
                    F.struct(s.alias("src"), c.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )


def q_pagerank(spark, sf):
    """Fixed-point PageRank (functions/graph.py) over the bidirectional
    customer<->supplier shipment graph (an edge per distinct pair where
    customer c bought a part shipped by supplier s, plus the reverse —
    the random walk alternates sides of the bipartite graph, so ranks
    have real dynamics): 3 iterations, damping 85%, scale 1e12.  Every
    step is integer floor-division arithmetic on BIGINTs, so the DuckDB
    twin (the same iterations unrolled as CTEs) matches bit-for-bit —
    the determinism contract that makes an ITERATIVE algorithm strict-
    value-hash oracle-able.  Reference parity: the iterative-batch
    round loop (SURVEY §3.3) as a data-parallel workload."""
    from asakusafw_spark_spark.functions import pagerank

    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = _shipment_edges(o, li)
    return pagerank(edges, iterations=3)


def q_pagerank_personalized(spark, sf):
    """Personalized PageRank (random walk with restart) from the
    NATION_7 supplier cohort over the bidirectional shipment graph:
    teleport and initial mass only on the cohort — the standard
    relatedness-to-a-seed-set ranking (recommendations, entity
    expansion).  Same fixed-point BIGINT contract as `pagerank`, so the
    DuckDB unrolled twin matches bit-for-bit."""
    from asakusafw_spark_spark.functions import pagerank

    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = _shipment_edges(o, li)
    sup = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation").where(F.col("n_name") == "NATION_7")
    sources = sup.join(nat, sup.s_nationkey == nat.n_nationkey).select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
    )
    # degenerate corpora (robustness sweep: empty / null-heavy tables)
    # yield an empty cohort, which pagerank correctly REFUSES (the
    # sources-is-empty guard); a pipeline query maps that to an empty
    # ranking rather than an exception
    if sources.limit(1).isEmpty():
        return spark.createDataFrame([], "node string, rank long")
    return pagerank(edges, iterations=3, sources=sources)


def q_triangle_count(spark, sf):
    """Triangle count (functions/graph.py) of the embedding near-dup
    graph (cosine_near_dup pairs at threshold 0.45 / 2 planes — the
    same generator as embedding_dup_clusters): every triangle is three
    pairwise-agreeing near-dups, so the count measures duplicate-
    cluster density.  Degree-oriented wedge join Spark-side (m^1.5
    bound, hub-safe); the DuckDB twin counts a<b<c closed triples —
    orientation-independent, same exact integer."""
    from asakusafw_spark_spark.functions import cosine_near_dup, triangle_count

    emb = _t(spark, sf, "embeddings")
    pairs = cosine_near_dup(emb, threshold=0.45, planes=2)
    return triangle_count(pairs, src="id_a", dst="id_b")


def q_bfs_levels(spark, sf):
    """Multi-source BFS distance (functions/graph.py bfs_levels) over
    the bidirectional customer<->supplier shipment graph, sources = the
    suppliers of one nation (NATION_7): hop count from the cohort, 4
    rounds.  Frontier iteration Spark-side; the DuckDB twin unrolls the
    equivalent level-wise relaxation (min(level, in-neighbor+1) per
    round) — exact integers, strict hash oracle.  The DISTANCE member
    of the graph family (components = connectivity, pagerank =
    centrality)."""
    from asakusafw_spark_spark.functions import bfs_levels

    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    edges = _shipment_edges(o, li)
    sup = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation").where(F.col("n_name") == "NATION_7")
    sources = sup.join(nat, sup.s_nationkey == nat.n_nationkey).select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
    )
    return bfs_levels(edges, sources, max_iters=4)


def _bfs_oracle_sql(max_iters: int = 4) -> str:
    """Level-wise relaxation unrolled as CTEs: l_k(v) = min(l_{k-1}(v),
    1 + min over in-edges).  Computes the same fixed point as the
    engine's frontier BFS; exact integer levels."""
    # Every CTE is AS MATERIALIZED: DuckDB inlines plain CTEs, and the
    # unrolled relaxation references l{i-1} TWICE per level — inlined,
    # the l0 pipeline (and the 6M-row e0 join inside edges) re-runs
    # 2^max_iters times.  Measured at sf1: 146.8 s → ~5 s, hash-identical.
    ctes = [
        """e0 AS MATERIALIZED (
            SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        )""",
        "edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
        """l0 AS MATERIALIZED (
            SELECT DISTINCT 's' || s_suppkey AS node, CAST(0 AS BIGINT) AS level
            FROM supplier JOIN nation ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_7'
        )""",
    ]
    for i in range(1, max_iters + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
            SELECT node, CAST(MIN(level) AS BIGINT) AS level FROM (
                SELECT node, level FROM l{i - 1}
                UNION ALL
                SELECT e.dst AS node, p.level + 1 AS level
                FROM edges e JOIN l{i - 1} p ON e.src = p.node
            ) u GROUP BY node
        )""")
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, level FROM l{max_iters}"


def q_bpe_pair_counts(spark, sf):
    """The BPE-training inner-loop statistic (functions/bpe.py):
    adjacent-symbol pair frequencies over the corpus word histogram,
    weighted by word count — characters + '</w>' end-of-word marker at
    step 0.  One corpus scan → word hash-agg → native zip_with pair
    expansion → pair hash-agg; the DuckDB twin substr-walks each word.
    This is the step whose DISTRIBUTION is the whole point of training
    a tokenizer on 100 TB; the merge loop reuses it per round."""
    from asakusafw_spark_spark.functions import (
        bpe_pair_counts, initial_symbols, word_histogram,
    )

    hist = word_histogram(_t(spark, sf, "documents")).select(
        initial_symbols("word").alias("syms"), "wcount"
    )
    return bpe_pair_counts(hist)


#: Pinned 24-merge BPE table: the EXACT output of
#: ``bpe_train(documents@sf0.01, num_merges=24)`` (training itself is
#: pinned == against a pure-Python reference in tests/test_bpe.py and
#: its inner-loop statistic has the strict `bpe_pair_counts` oracle).
#: Pinning the table as literals makes APPLICATION — which is fully
#: deterministic — strictly oracle-checkable in SQL (VERDICT r09 #5).
_BPE_PINNED_MERGES = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"), ("o", "w"),
    ("ow", "</w>"), ("o", "r"), ("s", "t"), ("h", "</w>"), ("a", "t"),
    ("l", "u"), ("i", "n"), ("a", "</w>"), ("g", "</w>"), ("y", "</w>"),
    ("a", "r"), ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
]


def q_bpe_tokenize(spark, sf):
    """BPE tokenizer APPLICATION at corpus scale: encode every document
    with a pinned 24-merge table (the Arrow-batched pair-priority
    encoder, functions/bpe.py) → per-doc BPE token counts.  The DuckDB
    twin replays the same priority loop as a recursive CTE over the
    DISTINCT word set (find lowest-rank adjacent pair → greedy
    left-to-right merge pass → repeat to fixpoint), so the strict
    value-hash covers the full encode semantics — merge priority,
    non-overlapping greedy passes, '</w>' handling, char fallback."""
    from asakusafw_spark_spark.functions import bpe_apply

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return bpe_apply(docs, _BPE_PINNED_MERGES).select(
        "doc_id", F.size("bpe_tokens").cast("long").alias("n_bpe_tokens")
    )


def _duck_bpe_apply_sql(merges: "list[tuple[str, str]]") -> str:
    """DuckDB twin of ``bpe_apply`` with a LITERAL merge table: a
    recursive CTE over the distinct word set replays the encoder's
    priority loop exactly — each step finds the lowest-rank merge
    whose pair is adjacent somewhere in the symbol list, applies it in
    ONE greedy left-to-right non-overlapping pass, and recurses until
    no table pair is present.

    The greedy pass is expressed positionally: for ``l != r`` adjacent
    matches can never overlap, so every match merges; for ``l == r``
    (runs like 'aaa') a match at position i merges iff its offset from
    the start of the run of ``l`` symbols is even — the pigeonhole
    form of "merge unless the previous position already merged".
    Output: per-doc total symbol count, joined back through each
    document's (non-distinct) word list."""

    def sel(i: str) -> str:
        rs = (
            f"(1 + coalesce(list_max(list_filter(range(1, {i}), "
            f"j -> syms[j] <> l)), 0))"
        )
        return (
            f"(syms[{i}] = l AND syms[{i}+1] = r AND "
            f"(l <> r OR (({i} - {rs}) % 2 = 0)))"
        )

    rank_whens = " ".join(
        f"WHEN syms[i] = '{l}' AND syms[i+1] = '{r}' THEN {k}"
        for k, (l, r) in enumerate(merges)
    )
    best = (
        f"list_min(list_transform(range(1, len(syms)), "
        f"i -> CASE {rank_whens} END))"
    )
    l_of = "CASE br " + " ".join(
        f"WHEN {k} THEN '{l}'" for k, (l, _) in enumerate(merges)
    ) + " END"
    r_of = "CASE br " + " ".join(
        f"WHEN {k} THEN '{r}'" for k, (_, r) in enumerate(merges)
    ) + " END"
    merged = (
        "list_filter(list_transform(range(1, len(syms) + 1), i -> "
        f"CASE WHEN {sel('i')} THEN l || r "
        f"WHEN i > 1 AND {sel('(i-1)')} THEN NULL "
        "ELSE syms[i] END), x -> x IS NOT NULL)"
    )
    return rf"""
        WITH RECURSIVE
        w AS (
          SELECT DISTINCT t.tok AS word
          FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
          WHERE t.tok <> ''
        ),
        enc AS (
          SELECT word,
                 list_append(list_transform(range(1, length(word) + 1),
                                            i -> substr(word, i, 1)),
                             '</w>') AS syms
          FROM w
          UNION ALL
          SELECT word, {merged} AS syms
          FROM (
            SELECT word, syms, {l_of} AS l, {r_of} AS r
            FROM (SELECT word, syms, {best} AS br FROM enc)
            WHERE br IS NOT NULL
          )
        ),
        final AS (
          SELECT word, len(syms) AS n_syms FROM enc WHERE {best} IS NULL
        ),
        doc_words AS (
          SELECT doc_id, t.tok AS word
          FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
          WHERE t.tok <> ''
        )
        SELECT d.doc_id,
               CAST(coalesce(SUM(f.n_syms), 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d
        LEFT JOIN doc_words dw ON dw.doc_id = d.doc_id
        LEFT JOIN final f ON f.word = dw.word
        GROUP BY d.doc_id
    """


def _duck_embedding_cc_sql(rounds: int = 30) -> str:
    """DuckDB twin of ``dup_clusters`` over embedding-cosine near-dup
    pairs — min-label connected components via UNROLLED hook +
    pointer-jump rounds instead of a recursive transitive-closure CTE.

    Why: the old ``reach`` closure materializes Σ|component|² rows; on
    the 20k-vector sf1 corpus chance cosine-0.45 pairs stitch a large
    component and the closure ground for hours (the r10 sweep's one
    timeout) while the Spark side finished in 100 s.  Hook (take the
    min of your own and your neighbors' labels) + jump (take your
    label's label) at least doubles the distance a component minimum
    has propagated each round, so ``rounds`` = 30 converges for any
    graph these tables can express — same O(log n) shape as the engine's
    large-star/small-star loop — at O((n + m) · rounds) total rows.
    MATERIALIZED hints keep DuckDB from re-inlining the pair generator
    into every round."""
    parts = [
        f"pairs AS MATERIALIZED ({_duck_near_dup_sql(threshold=0.45, planes=2)})",
        """edges AS MATERIALIZED (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            )""",
        "l0 AS MATERIALIZED (SELECT vec_id AS n, vec_id AS lbl FROM embeddings)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""h{i} AS MATERIALIZED (
              SELECT l.n, LEAST(l.lbl, COALESCE(MIN(nb.lbl), l.lbl)) AS lbl
              FROM l{i - 1} l
              LEFT JOIN edges e ON e.a = l.n
              LEFT JOIN l{i - 1} nb ON nb.n = e.b
              GROUP BY l.n, l.lbl
            )"""
        )
        parts.append(
            f"""l{i} AS MATERIALIZED (
              SELECT h1.n, LEAST(h1.lbl, h2.lbl) AS lbl
              FROM h{i} h1 JOIN h{i} h2 ON h2.n = h1.lbl
            )"""
        )
    parts.append(
        f"""lab_all AS (
              SELECT n AS vec_id, lbl AS cluster_id FROM l{rounds}
            )"""
    )
    parts.append(
        """sizes AS (
              SELECT cluster_id, COUNT(*) AS cluster_size
              FROM lab_all GROUP BY cluster_id
            )"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
            SELECT a.vec_id, a.cluster_id,
                   a.vec_id = a.cluster_id AS is_keeper, s.cluster_size
            FROM lab_all a JOIN sizes s USING (cluster_id)
        """
    )


def _pagerank_oracle_sql(iterations: int = 3, damping: int = 85,
                         scale: int = 10**12,
                         personalized: bool = False) -> str:
    """Unroll the fixed-point PageRank iterations as DuckDB CTEs —
    `//` (DuckDB) and `DIV` (Spark) are the same floor division on
    non-negative BIGINTs, so the hashes agree exactly.  With
    ``personalized``, teleport mass and initial mass go only to the
    NATION_7 supplier cohort (the engine query's source set)."""
    # Shared structural CTEs are AS MATERIALIZED (DuckDB inlines plain
    # CTEs): `nodes` is referenced from every unrolled level via the
    # teleport denominator, so the 6M-row e0 join re-ran once per
    # iteration per reference.  Measured at sf1: 268.3 s → ~8 s,
    # hash-identical (the personalized variant, whose denominator
    # counts the small srcs cohort instead, was already 38 s).
    ctes = [
        """e0 AS MATERIALIZED (
            SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        )""",
        "edges AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
        "outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
    ]
    if personalized:
        ctes += [
            """srcs AS MATERIALIZED (
                SELECT DISTINCT 's' || s_suppkey AS node
                FROM supplier JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name = 'NATION_7'
            )""",
            """nodes AS MATERIALIZED (
                SELECT src AS node FROM edges
                UNION SELECT dst FROM edges
                UNION SELECT node FROM srcs
            )""",
        ]
        n_sub = "(SELECT COUNT(*) FROM srcs)"
        base = (
            f"CASE WHEN s.node IS NOT NULL THEN "
            f"({scale} * {100 - damping}) // (100 * {n_sub}) ELSE 0 END"
        )
        src_join = "LEFT JOIN srcs s ON n.node = s.node"
        ctes.append(f"""r0 AS (
            SELECT n.node,
                   CASE WHEN s.node IS NOT NULL
                        THEN {scale} // {n_sub} ELSE 0 END AS rank
            FROM nodes n {src_join}
        )""")
    else:
        ctes.append(
            "nodes AS MATERIALIZED "
            "(SELECT src AS node FROM edges UNION SELECT dst FROM edges)"
        )
        n_sub = "(SELECT COUNT(*) FROM nodes)"
        base = f"({scale} * {100 - damping}) // (100 * {n_sub})"
        src_join = ""
        ctes.append(f"r0 AS (SELECT node, {scale} // {n_sub} AS rank FROM nodes)")
    for i in range(1, iterations + 1):
        ctes.append(f"""c{i} AS MATERIALIZED (
            SELECT e.dst AS node,
                   CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS contrib
            FROM edges e
            JOIN r{i - 1} r ON e.src = r.node
            JOIN outdeg d ON e.src = d.src
            GROUP BY e.dst
        )""")
        ctes.append(f"""r{i} AS MATERIALIZED (
            SELECT n.node,
                   {base} + ({damping} * COALESCE(c.contrib, 0)) // 100 AS rank
            FROM nodes n LEFT JOIN c{i} c ON n.node = c.node {src_join}
        )""")
    # empty personalized cohort → empty ranking, mirroring the engine
    # query's guard (pagerank itself REFUSES an empty sources set; the
    # pipeline query maps that to an empty frame — without this WHERE
    # the unrolled SQL would divide by the zero cohort count instead)
    guard = (
        f" WHERE (SELECT COUNT(*) FROM srcs) > 0" if personalized else ""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(rank AS BIGINT) AS rank FROM r{iterations}"
        + guard
    )


def _duck_near_dup_sql(threshold: float = 0.9, planes: int = 6) -> str:
    """Norms are hoisted per ROW into the materialized build side (the
    SQL mirror of the r11 Spark-side hoist) and the dot product is
    native ``list_dot_product`` instead of the interpreted
    zip→transform→sum lambda chain: both sum left-to-right, verified
    bit-identical (count + value hash) over every sf1 candidate pair —
    and 169.3 s → 9.9 s at sf1 for the pair query (the per-pair lambda
    evals, ~800M of them, were the cost; this SQL also feeds
    triangle_count and the embedding-CC oracle)."""
    bucket = _duck_bucket_expr("embedding", planes)
    vec = _duck_vec("embedding")
    return f"""
        WITH b AS MATERIALIZED (
            SELECT vec_id AS id, {vec} AS v,
                   sqrt(list_sum(list_transform({vec}, x -> x*x))) AS nrm,
                   {bucket} AS bucket FROM embeddings
            -- null-ELEMENT vectors excluded (r16, extreme/combined
            -- corpora): the engine buckets them but their sim is NULL
            -- (null propagates through the dot/norm folds) so they can
            -- never emit a pair; DuckDB's list_dot_product ERRORS on a
            -- list containing NULL instead of returning NULL, so the
            -- twin drops those rows up front.  Whole-NULL vectors stay:
            -- list_dot_product(NULL, v) is NULL on this side and the
            -- sim filter drops them, same as the engine.
            WHERE embedding IS NULL
               OR len(list_filter(embedding, e -> e IS NULL)) = 0),
        pairs AS (SELECT a.id AS id_a, b2.id AS id_b, a.v AS qv, b2.v AS cv,
                         a.nrm AS na, b2.nrm AS nb
                  FROM b a JOIN b b2 USING (bucket) WHERE a.id < b2.id)
        SELECT id_a, id_b,
               round(list_dot_product(qv, cv) / (na * nb), 6) AS sim
        FROM pairs
        WHERE round(list_dot_product(qv, cv) / (na * nb), 6) >= {threshold}
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ROTATION: the driver CORRECTNESS report truncates at ~50
    # entries, so dict ORDER decides which queries get a fresh
    # oracle row (run tools/staleness.py for the schedule).
    all_q = {
        # NOTE: literal order here is NOT the driver window — the
        # `head` list below (r10 rotation) defines the first 50.
        "q6_forecast_revenue": q6_forecast_revenue,
        "q7_volume_shipping": q7_volume_shipping,
        "q8_market_share": q8_market_share,
        "quantile_bucket": q_quantile_bucket,
        "quantize_embeddings": q_quantize_embeddings,
        "redact": q_redact,
        "retention": q_retention,
        "scd2_apply": q_scd2_apply,
        "scrub_spans": q_scrub_spans,
        "similarity_quantized_topk": q_similarity_quantized,
        "snapshot_diff": q_snapshot_diff,
        "streaming_dedup_ingest": q_streaming_dedup_ingest,
        "text_index_search": q_text_index_search,
        "tfidf": q_tfidf,
        "unpivot_measures": q_unpivot,
        "vocab_top_k": q_vocab_top_k,
        "winsorize": q_winsorize,
        "resample_locf": q_resample_locf,
        "streaming_theta_maintain": q_streaming_theta_maintain,
        "pagerank": q_pagerank,
        "pagerank_personalized": q_pagerank_personalized,
        "bfs_levels": q_bfs_levels,
        "triangle_count": q_triangle_count,
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_tokenize": q_bpe_tokenize,
        "merge_upsert": q_merge_upsert,
        "approx_distinct": q_approx_distinct,
        "approx_percentile": q_approx_percentile,
        "branch": q_branch,
        "bucketed_join": q_bucketed_join,
        "cogroup_chunked": q_cogroup_chunked,
        "contamination_check": q_contamination_check,
        "convert": q_convert,
        "corpus_stats": q_corpus_stats,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_edit_distance": q_dedup_edit_distance,
        "url_canonical_dedup": q_url_canonical_dedup,
        "dedup_simhash_groups": q_dedup_simhash_groups,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "embedding_centroids": q_embedding_centroids,
        "embedding_dup_clusters": q_embedding_dup_clusters,
        "extend": q_extend,
        "extract": q_extract,
        "flatten_structs": q_flatten_struct,
        "fold_partial": q_fold_partial,
        "group_view_lookup": q_group_view_lookup,
        "hadoop_input_newapi": q_hadoop_input_newapi,
        "master_branch": q_master_branch,
        "master_check_found": q_master_check_found,
        "master_check_missed": q_master_check_missed,
        "master_join": q_master_join,
        "master_join_missed": q_master_join_missed,
        "master_join_update": q_master_join_update,
        "master_selection_custom_fn": q_master_selection_custom_fn,
        "master_selection_ordering": q_master_selection_ordering,
        "project": q_project,
        "q11_important_stock": q11_important_stock,
        "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
        "q20_potential_promotion": q20_potential_promotion,
        "q9_product_type_profit": q9_product_type_profit,
        "restructure": q_restructure,
        "sample_stratified": q_sample_stratified,
        "similarity_bruteforce_topk": q_similarity_bruteforce,
        "similarity_ivf": q_similarity_ivf,
        "similarity_lsh_ann": q_similarity_lsh_ann,
        "similarity_near_dup": q_similarity_near_dup,
        "split": q_split,
        "streaming_cdc_upsert": q_streaming_cdc_upsert,
        "text_analysis": q_text_analysis,
        "text_repetition": q_text_repetition,
        "text_simhash": q_text_simhash,
        "token_budget": q_token_budget,
        "train_val_split": q_train_val_split,
        "update": q_update,
        # --- covered by LOCAL_VERIFY at both SFs ---
        "iterative_transactional_output": q_iterative_transactional_output,
        "audience_overlap": q_audience_overlap,
        "retention_expire": q_retention_expire,
        "output_roundtrip": q_output_roundtrip,
        "streaming_incremental_agg": q_streaming_incremental_agg,
        "streaming_distinct_sketch": q_streaming_distinct_sketch,
        "iterative_rounds": q_iterative_rounds,
        "checkpoint": q_checkpoint,
        "logging": q_logging,
        "direct_input": q_direct_input,
        "confluent": q_confluent,
        "distinct": q_distinct,
        "intersect_keys": q_intersect_keys,
        "except_keys": q_except_keys,
        "rank_in_group": q_rank_in_group,
        "rollup_agg": q_rollup_agg,
        "cube_agg": q_cube_agg,
        "moving_avg": q_moving_avg,
        "running_total": q_running_total,
        "percentile_agg": q_percentile_agg,
        "pivot_agg": q_pivot_agg,
        "analyze_table": q_analyze_table,
        "bloom_join": q_bloom_join,
        "bm25": q_bm25,
        "cap_per_group": q_cap_per_group,
        "compaction_roundtrip": q_compaction_roundtrip,
        "constraint_report": q_constraint_report,
        "dedup_corpus_best": q_dedup_corpus_best,
        "dedup_incremental": q_dedup_incremental,
        "extract_json": q_extract_json,
        "funnel": q_funnel,
        "hadoop_input": q_hadoop_input,
        "incremental_agg": q_incremental_agg,
        "lm_score": q_lm_score,
        "materialize_packs": q_materialize_packs,
        "merge_evolve": q_merge_evolve,
        "normalize_text": q_normalize_text,
        "pack_sequences": q_pack_sequences,
        "q10_returned_items": q10_returned_items,
        "q12_late_priority_lines": q12_late_priority_lines,
        "q13_customer_distribution": q13_customer_distribution,
        "q14_promo_revenue": q14_promo_revenue,
        "q15_top_supplier": q15_top_supplier,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q19_discounted_revenue": q19_discounted_revenue,
        "q21_waiting_suppliers": q21_waiting_suppliers,
        "q22_global_sales_opportunity": q22_global_sales_opportunity,
        "q4_order_priority": q4_order_priority,
        "hadoop_output_newapi": q_hadoop_output_newapi,
        "cli_roundtrip": q_cli_roundtrip,
        "heavy_hitters": q_heavy_hitters,
        "sample_exact_n": q_sample_exact_n,
        "k_anonymity_report": q_k_anonymity_report,
        "suppress_rare_groups": q_suppress_rare_groups,
        "seqfile_roundtrip": q_seqfile_roundtrip,
        "fixed_width_input": q_fixed_width_input,
        "streaming_quality_report": q_streaming_quality_report,
        "zorder_roundtrip": q_zorder_roundtrip,
        "manifest_stats": q_manifest_stats,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "asof_join": q_asof_join,
        "chunk_documents": q_chunk_documents,
        "cogroup": q_cogroup,
        "cogroup3": q_cogroup3,
        "dedup_clusters": q_dedup_clusters,
        "dedup_corpus": q_dedup_corpus,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "flagship_revenue_per_nation": _flagship,
        "fold": q_fold,
        "fold_custom": q_fold_custom,
        "group_sort": q_group_sort,
        "grouping_sets": q_grouping_sets,
        "master_join_multikey": q_master_join_multikey,
        "master_join_shuffled": q_master_join_shuffled,
        "master_join_where": q_master_join_where,
        "mix_corpus": q_mix_corpus,
        "multimodal_features": q_multimodal_features,
        "q18_large_volume_customer": q18_large_volume_customer,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "quality_filter": q_quality_filter,
        "range_join_bands": q_range_join_bands,
        "sessionize": q_sessionize,
        "shard_assignment": q_shard_assignment,
        "streaming_dedup": q_streaming_dedup,
        "streaming_interval_join": q_streaming_interval_join,
        "streaming_sessionize": q_streaming_sessionize,
        "streaming_stateful_count": q_streaming_stateful_count,
        "streaming_windowed_agg": q_streaming_window,
        "summarize_any": q_summarize_any,
        "summarize_q1": q_summarize_q1,
        "top_k_per_group": q_topk,
        "training_pipeline": q_training_pipeline,
    }
    # --- r13 window head (50 = 33 + 3 + 14; rotation ledger is the
    #     union of all CORRECTNESS_r*.json windows — per-query
    #     last-verified round, `python tools/staleness.py`):
    #     1. the ENTIRE remaining r09 block — all 33 queries at the
    #        3-round staleness boundary;
    #     2. the registry queries riding code EDITED in r13:
    #        scrub_spans (scrub_duplicate_spans rebuilt: scan-split
    #        guard, starts-based cover agg, int-position reassembly)
    #        plus pagerank / pagerank_personalized (final-ranks
    #        registration in functions/graph.py; triangle_count, the
    #        other graph edit, is already in the r09 block);
    #     3. 14 of the r10 block (staleness 2, alphabetical head); the
    #        r10 remainder (still ≤3-stale then) leads the r14 window.
    head = [
        # r16 window (VERDICT r15 Next #4: no query staler than 3 rounds;
        # judge histogram r12:26 r13:47 r14:45 r15:50)
        # 1. the FULL r12-stale block (26 — at the staleness boundary)
        "bloom_join", "branch", "distinct", "except_keys",
        "extract_json", "funnel", "incremental_agg", "intersect_keys",
        "lm_score", "logging", "moving_avg", "normalize_text",
        "percentile_agg", "pivot_agg", "q10_returned_items",
        "q12_late_priority_lines", "q13_customer_distribution",
        "q14_promo_revenue", "q15_top_supplier",
        "q17_small_quantity_revenue", "q19_discounted_revenue",
        "q21_waiting_suppliers", "q22_global_sales_opportunity",
        "q4_order_priority", "rank_in_group", "running_total",
        # 2. r16-edited code paths: the three combined-gate fixes
        #    (interval-join event-time bound, the two oracle
        #    null-equality twins), the centralized _event_window
        #    refactor across the streaming family + sessionize +
        #    resample, the null-explicit quantize contract, and the
        #    grouping-sets build-time-snapshot assert
        "streaming_interval_join", "resample_locf", "dedup_corpus_best",
        "streaming_windowed_agg", "streaming_sessionize",
        "streaming_dedup", "streaming_stateful_count", "sessionize",
        "quantize_embeddings", "similarity_quantized_topk",
        "rollup_agg", "cube_agg", "grouping_sets",
        # 3. r13-stale riskiest slice (subprocess CLI, streaming sketch
        #    maintainer, warehouse merge, iterative graph/CC, pandas
        #    cogroup, red-history bpe_tokenize, as-of join, span scrub,
        #    fixed-width reader; the r13 remainder leads the r17 window)
        "cli_roundtrip", "streaming_theta_maintain", "merge_upsert",
        "embedding_dup_clusters", "pagerank", "bpe_tokenize",
        "dedup_corpus", "cogroup", "asof_join", "scrub_spans",
        "fixed_width_input",
    ]
    ordered = {k: all_q[k] for k in head}
    ordered.update((k, v) for k, v in all_q.items() if k not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    return {
        "pagerank": _pagerank_oracle_sql(iterations=3),
        "pagerank_personalized": _pagerank_oracle_sql(
            iterations=3, personalized=True
        ),
        "bfs_levels": _bfs_oracle_sql(max_iters=4),
        # triangle count over the near-dup pair graph: pairs already
        # come id_a < id_b from the generator, so they ARE the
        # canonical undirected edges; count closed a<b<c triples
        "triangle_count": f"""
            WITH p AS MATERIALIZED ({_duck_near_dup_sql(threshold=0.45, planes=2)}),
            ce AS MATERIALIZED (SELECT DISTINCT id_a AS a, id_b AS b FROM p)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM ce e1
            JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b
        """,
        "bpe_tokenize": _duck_bpe_apply_sql(_BPE_PINNED_MERGES),
        "bpe_pair_counts": r"""
            WITH w AS (
              SELECT t.tok AS word
              FROM documents, unnest(string_split_regex(trim(text), '\s+')) AS t(tok)
              WHERE t.tok <> ''
            ), hist AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
            chpairs AS (
              SELECT substr(word, g.i, 1) AS "left",
                     substr(word, g.i + 1, 1) AS "right", c
              FROM hist, unnest(generate_series(1, length(word) - 1)) AS g(i)
              UNION ALL
              SELECT substr(word, length(word), 1), '</w>', c FROM hist
            )
            SELECT "left", "right", CAST(SUM(c) AS BIGINT) AS pair_count
            FROM chpairs GROUP BY 1, 2
        """,
        "flagship_revenue_per_nation": """
            SELECT n_name,
                   CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation   ON n_nationkey = c_nationkey
            GROUP BY n_name
        """,
        "project": "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
        "extend": """
            SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice,
                   CAST(NULL AS DOUBLE) AS p_margin
            FROM part
        """,
        "restructure": """
            SELECT c_custkey, c_mktsegment, CAST(NULL AS DOUBLE) AS c_score FROM customer
        """,
        "extract": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) AS revenue
            FROM lineitem
        """,
        "update": """
            SELECT o_orderkey, o_totalprice,
                   substr(o_orderpriority, 1, 1) AS o_orderpriority,
                   o_totalprice > 200000.0 AS big
            FROM orders
        """,
        "convert": """
            SELECT o_orderkey, CAST(o_orderkey % 7 AS BIGINT) AS bucket FROM orders
        """,
        "branch": """
            SELECT l_orderkey, l_linenumber, l_returnflag,
                   CASE l_returnflag WHEN 'R' THEN 'returned'
                                     WHEN 'A' THEN 'accepted'
                                     ELSE 'open' END AS branch
            FROM lineitem
        """,
        "split": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer)
        """,
        "master_join": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
            FROM orders JOIN customer ON c_custkey = o_custkey
        """,
        "master_join_missed": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey NOT IN (
                SELECT c_custkey FROM customer WHERE c_acctbal >= 5000.0
            )
        """,
        "master_check_found": """
            SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 25)
        """,
        "master_check_missed": """
            SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
            WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size > 25)
        """,
        "master_branch": """
            SELECT c_custkey, c_nationkey, c_acctbal,
                   CASE WHEN n_nationkey IS NULL THEN 'unknown'
                        WHEN n_regionkey <= 1 THEN 'west'
                        ELSE 'east' END AS branch
            FROM customer LEFT JOIN nation ON n_nationkey = c_nationkey
        """,
        "master_join_update": """
            SELECT o_orderkey, o_custkey, o_totalprice + c_acctbal AS o_totalprice
            FROM orders JOIN customer ON c_custkey = o_custkey
        """,
        "master_selection_ordering": """
            SELECT s_suppkey, c_custkey AS best_custkey, c_acctbal AS best_acctbal
            FROM supplier
            JOIN (
                SELECT c_nationkey, c_custkey, c_acctbal,
                       row_number() OVER (PARTITION BY c_nationkey
                                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                FROM customer
            ) best ON best.c_nationkey = s_nationkey AND rn = 1
        """,
        "master_selection_custom_fn": """
            SELECT s_suppkey, c_custkey AS best_custkey, c_acctbal AS best_acctbal
            FROM supplier
            JOIN (
                SELECT c_nationkey, c_custkey, c_acctbal,
                       row_number() OVER (PARTITION BY c_nationkey
                                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
                       count(*) OVER (PARTITION BY c_nationkey) AS cnt
                FROM customer
            ) best ON best.c_nationkey = s_nationkey AND rn = LEAST(2, cnt)
        """,
        "master_join_where": """
            SELECT o_orderkey, o_totalprice, c_acctbal
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_acctbal * 100 >= o_totalprice
        """,
        "summarize_q1": """
            SELECT l_returnflag, l_linestatus,
                   COUNT(*) AS count_order,
                   MAX(l_quantity) AS max_qty,
                   MIN(l_extendedprice) AS min_price,
                   CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "fold": """
            SELECT l_suppkey,
                   CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS l_quantity,
                   MAX(l_extendedprice) AS l_extendedprice
            FROM lineitem GROUP BY l_suppkey
        """,
        "fold_custom": """
            SELECT l_suppkey,
                   CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS l_quantity,
                   MAX(l_extendedprice) AS l_extendedprice
            FROM lineitem GROUP BY l_suppkey
        """,
        "fold_partial": """
            SELECT l_returnflag,
                   MAX(l_quantity) AS l_quantity,
                   MIN(l_extendedprice) AS l_extendedprice
            FROM lineitem GROUP BY l_returnflag
        """,
        "master_join_shuffled": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
            FROM orders JOIN customer ON c_custkey = o_custkey
        """,
        "master_join_multikey": """
            -- master selection: ≤1 master per tx — default ordering (all
            -- master columns asc) picks MIN(price) within each key group
            SELECT t.l_orderkey, t.l_linenumber, t.l_quantity,
                   m.m_price
            FROM lineitem t
            JOIN (SELECT l_orderkey, l_linenumber,
                         MIN(l_extendedprice) AS m_price
                  FROM lineitem WHERE l_quantity > 40
                  GROUP BY l_orderkey, l_linenumber) m
              ON m.l_orderkey = t.l_orderkey AND m.l_linenumber = t.l_linenumber
        """,
        "range_join_bands": """
            SELECT o_orderkey, o_totalprice, b.band AS price_band
            FROM orders
            JOIN (VALUES ('small', 0.0, 100000.0),
                         ('medium', 100000.0, 250000.0),
                         ('large', 250000.0, 1e12)) AS b(band, lo, hi)
              ON o_totalprice >= b.lo AND o_totalprice < b.hi
        """,
        "percentile_agg": """
            SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.5) AS median_qty,
                   quantile_cont(l_quantity, 0.95) AS p95_qty,
                   quantile_cont(l_extendedprice, 0.5) AS median_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "grouping_sets": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
        "asof_join": """
            WITH cand AS (
                SELECT e.event_id, e.user_id, e.ts,
                       o.o_orderkey, o.o_totalprice,
                       row_number() OVER (PARTITION BY e.event_id
                           ORDER BY o.o_orderdate DESC, o.o_orderkey ASC) AS rn
                FROM events e
                JOIN orders o ON o.o_custkey = e.user_id
                             AND o.o_orderdate <= e.ts)
            SELECT event_id, user_id, ts,
                   o_orderkey AS last_orderkey, o_totalprice AS last_totalprice
            FROM cand WHERE rn = 1
        """,
        "direct_input": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
        "hadoop_input": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                   CAST(n_regionkey AS BIGINT) AS n_regionkey
            FROM nation
        """,
        "hadoop_input_newapi": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                   CAST(n_regionkey AS BIGINT) AS n_regionkey
            FROM nation
        """,
        "hadoop_output_newapi": """
            SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
                   CAST(s_nationkey AS BIGINT) AS s_nationkey
            FROM supplier
        """,
        "cli_roundtrip": """
            SELECT n_regionkey, COUNT(*) AS n_nations,
                   MIN(n_name) AS first_name
            FROM nation GROUP BY n_regionkey
        """,
        "heavy_hitters": """
            WITH c AS (SELECT user_id, COUNT(*) AS cnt
                       FROM events GROUP BY user_id),
                 t AS (SELECT SUM(cnt) AS total FROM c)
            SELECT user_id, cnt,
                   CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share
            FROM c, t
            WHERE cnt >= 2
              AND CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) >= 0.008
        """,
        "sample_exact_n": f"""
            SELECT doc_id, text, lang, source, n_chars
            FROM documents
            ORDER BY {_DUCK_UNIT_HASH.format(key="doc_id")}, doc_id
            LIMIT 97
        """,
        "retention_expire": """
            SELECT CAST(ts AS DATE) AS day,
                   COUNT(*) AS n_events,
                   CAST(SUM(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(27,6))) AS DOUBLE)
                       AS sum_value
            FROM events
            WHERE CAST(ts AS DATE) >= DATE '2024-01-11'
            GROUP BY 1
        """,
        "k_anonymity_report": """
            SELECT c_nationkey, c_mktsegment,
                   COUNT(*) AS group_size,
                   COUNT(*) >= 10 AS anonymous
            FROM customer GROUP BY c_nationkey, c_mktsegment
        """,
        "suppress_rare_groups": """
            SELECT c_custkey,
                   CASE WHEN cnt >= 10 THEN c_nationkey END AS c_nationkey,
                   CASE WHEN cnt >= 10 THEN c_mktsegment END AS c_mktsegment
            FROM (
                SELECT c_custkey, c_nationkey, c_mktsegment,
                       COUNT(*) OVER (
                           PARTITION BY c_nationkey, c_mktsegment
                       ) AS cnt
                FROM customer
            )
        """,
        "seqfile_roundtrip": """
            SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name
            FROM region
        """,
        "fixed_width_input": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                   CAST(n_regionkey AS BIGINT) AS n_regionkey
            FROM nation
        """,
        "streaming_distinct_sketch": """
            SELECT event_type,
                   COUNT(DISTINCT user_id) AS n_distinct_users,
                   TRUE AS fold_matches_oneshot,
                   TRUE AS est_within_pct
            FROM events GROUP BY event_type
        """,
        "streaming_theta_maintain": """
            WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
                 v AS (SELECT user_id FROM s WHERE event_type = 'view')
            SELECT s.event_type,
                   COUNT(*) AS n_distinct_users,
                   COUNT(*) FILTER (WHERE v.user_id IS NOT NULL)
                       AS overlap_with_view
            FROM s LEFT JOIN v ON s.user_id = v.user_id
            GROUP BY s.event_type
        """,
        "audience_overlap": """
            WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
                 c AS (SELECT event_type, COUNT(*) AS n FROM s GROUP BY 1),
                 ov AS (SELECT a.event_type AS ga, b.event_type AS gb,
                               COUNT(*) AS o
                        FROM s a JOIN s b ON a.user_id = b.user_id
                                        AND a.event_type < b.event_type
                        GROUP BY 1, 2)
            SELECT ca.event_type AS group_a, cb.event_type AS group_b,
                   ca.n AS distinct_a, cb.n AS distinct_b,
                   COALESCE(ov.o, 0) AS overlap,
                   ca.n + cb.n - COALESCE(ov.o, 0) AS union_count,
                   ca.n - COALESCE(ov.o, 0) AS only_a
            FROM c ca
            JOIN c cb ON ca.event_type < cb.event_type
            LEFT JOIN ov ON ov.ga = ca.event_type AND ov.gb = cb.event_type
        """,
        "q2_min_cost_supplier": f"""
            WITH {_ps_cte()},
            eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
                   FROM supplier
                   JOIN nation ON s_nationkey = n_nationkey
                   JOIN region ON n_regionkey = r_regionkey
                        AND r_name = 'EUROPE'),
            cand AS (SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
                            ps_supplycost,
                            MIN(ps_supplycost) OVER (PARTITION BY ps_partkey)
                                AS mc
                     FROM partsupp
                     JOIN part ON ps_partkey = p_partkey
                          AND p_size = 15 AND p_type = 'ECONOMY'
                     JOIN eu ON ps_suppkey = s_suppkey)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
            FROM cand WHERE ps_supplycost = mc
        """,
        "q9_product_type_profit": f"""
            WITH {_ps_cte()}
            SELECT n_name,
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount)
                                 - ps_supplycost * l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS profit
            FROM lineitem
            JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN orders ON l_orderkey = o_orderkey
            GROUP BY n_name, o_year
        """,
        "q11_important_stock": f"""
            WITH {_ps_cte()},
            held AS (SELECT ps_partkey,
                            CAST(SUM(TRY_CAST(ps_supplycost * ps_availqty AS DECIMAL(27,6))) AS DOUBLE)
                                AS value
                     FROM partsupp
                     JOIN supplier ON ps_suppkey = s_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
                          AND n_name = 'NATION_15'
                     GROUP BY ps_partkey)
            SELECT ps_partkey, value FROM held
            WHERE value > (SELECT CAST(SUM(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(27,6)))
                                       AS DOUBLE)
                           FROM held) / 500
        """,
        "q16_parts_supplier_relationship": f"""
            WITH {_ps_cte()}
            SELECT p_brand, p_type, p_size,
                   COUNT(DISTINCT ps_suppkey) AS supplier_cnt
            FROM partsupp JOIN part ON ps_partkey = p_partkey
            WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND ps_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
        """,
        "q20_potential_promotion": f"""
            WITH {_ps_cte()},
            shipped AS (SELECT l_partkey, l_suppkey,
                               CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2)))
                                    AS DOUBLE) AS qty
                        FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                          AND l_shipdate <  TIMESTAMP '1997-01-01'
                        GROUP BY l_partkey, l_suppkey)
            SELECT s_suppkey, s_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
            WHERE s_suppkey IN (
                SELECT ps_suppkey FROM partsupp
                JOIN part ON ps_partkey = p_partkey AND p_name LIKE 'red%'
                JOIN shipped ON l_partkey = ps_partkey
                     AND l_suppkey = ps_suppkey
                WHERE ps_availqty > qty * 0.5)
        """,
        "redact": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         text || ' contact user' || CAST(doc_id AS VARCHAR)
                              || '@example.com or +1555000' || CAST(doc_id AS VARCHAR)
                              || ' at 10.0.0.' || CAST(doc_id % 255 AS VARCHAR),
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                       '<IP>', 'g'),
                     '\\+[0-9]{7,15}\\b', '<PHONE>', 'g') AS clean
            FROM documents
        """,
        "vocab_top_k": """
            WITH ex AS (
              SELECT doc_id, t.tok AS token
              FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(tok)
              WHERE t.tok <> ''
            ), s AS (
              SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
              FROM ex GROUP BY token
            )
            SELECT token, tf, df, rank FROM (
              SELECT token, tf, df,
                     ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) AS rank
              FROM s
            ) sub WHERE rank <= 50
        """,
        "tfidf": """
            WITH ex AS (
              SELECT doc_id, t.tok AS token
              FROM documents, unnest(string_split_regex(trim(text), '\\s+')) AS t(tok)
              WHERE t.tok <> ''
            ), tf AS (
              SELECT doc_id, token, COUNT(*) AS tf FROM ex GROUP BY doc_id, token
            ), dfq AS (
              SELECT token, COUNT(*) AS doc_freq FROM tf
              GROUP BY token HAVING COUNT(*) >= 2
            ), n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents)
            SELECT tf.doc_id, tf.token, tf.tf, dfq.doc_freq,
                   round(tf.tf * (ln((n.n + 1.0) / (dfq.doc_freq + 1.0)) + 1), 6)
                     AS tfidf
            FROM tf JOIN dfq USING (token) CROSS JOIN n
            WHERE tf.doc_id % 20 = 0
        """,
        "pack_sequences": """
            WITH t AS (
              SELECT doc_id, source,
                     CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS n_tokens,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack:42'),
                          1, 15) AS BIGINT) AS oh
              FROM documents
            ), c AS (
              SELECT doc_id, source, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY source
                                         ORDER BY oh, doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens
                       AS start
              FROM t
            )
            SELECT doc_id, source, n_tokens,
                   CAST(start // 512 AS BIGINT) AS pack_id,
                   CAST(start % 512 AS BIGINT) AS pack_pos
            FROM c
        """,
        "materialize_packs": """
            WITH t AS (
              SELECT doc_id, source, text,
                     CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+'))
                     END AS n_tokens,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack:42'),
                          1, 15) AS BIGINT) AS oh
              FROM documents
            ), c AS (
              SELECT doc_id, source, text, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY source
                                         ORDER BY oh, doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens
                       AS start
              FROM t
            )
            SELECT source, CAST(start // 512 AS BIGINT) AS pack_id,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY start % 512, CAST(doc_id AS VARCHAR))
                     AS doc_ids,
                   -- COALESCE: an all-null-text pack aggregates to NULL
                   -- in string_agg; the engine's concat_ws yields ''
                   COALESCE(string_agg(text, ' '
                              ORDER BY start % 512, CAST(doc_id AS VARCHAR)),
                            '') AS pack_text
            FROM c GROUP BY source, CAST(start // 512 AS BIGINT)
        """,
        "dedup_incremental": _duck_incremental_sql(threshold=0.5),
        # identical survivor set: static index + per-doc decisions make
        # the streamed ingest equal the single-batch dedup
        "streaming_dedup_ingest": _duck_incremental_sql(threshold=0.5),
        "bm25": """
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(trim(text), '\\s+') END AS t
              FROM documents
            ), stats AS (
              SELECT COUNT(DISTINCT doc_id) AS n,
                     CAST(SUM(len(t)) AS BIGINT) AS tl
              FROM toks
            ), ex AS (
              SELECT doc_id, len(t) AS dl, u.tok
              FROM toks, unnest(t) AS u(tok)
              WHERE u.tok IN ('query', 'spark', 'table')
            ), tf AS (
              SELECT doc_id, dl, tok, COUNT(*) AS tf
              FROM ex GROUP BY doc_id, dl, tok
            ), dfq AS (
              SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
            )
            SELECT doc_id,
                   round(CAST(SUM(TRY_CAST(
                     ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl
                            / (CAST(tl AS DOUBLE) / n)))
                     AS DECIMAL(27,12))) AS DOUBLE), 6) AS score
            FROM tf JOIN dfq USING (tok) CROSS JOIN stats
            GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC
            LIMIT 25
        """,
        "text_index_search": """
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(trim(text), '\\s+') END AS t
              FROM documents
            ), stats AS (
              SELECT COUNT(DISTINCT doc_id) AS n,
                     CAST(SUM(len(t)) AS BIGINT) AS tl
              FROM toks
            ), ex AS (
              SELECT doc_id, len(t) AS dl, u.tok
              FROM toks, unnest(t) AS u(tok)
              WHERE u.tok IN ('customer', 'filter', 'join')
            ), tf AS (
              SELECT doc_id, dl, tok, COUNT(*) AS tf
              FROM ex GROUP BY doc_id, dl, tok
            ), dfq AS (
              SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
            )
            SELECT doc_id,
                   round(CAST(SUM(TRY_CAST(
                     ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl
                            / (CAST(tl AS DOUBLE) / n)))
                     AS DECIMAL(27,12))) AS DOUBLE), 6) AS score
            FROM tf JOIN dfq USING (tok) CROSS JOIN stats
            GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC
            LIMIT 25
        """,
        "compaction_roundtrip": (
            "SELECT doc_id, lang, source, n_chars FROM documents"
        ),
        "snapshot_diff": """
            SELECT o_orderkey, o_custkey,
                   CAST(round(TRY_CAST(o_totalprice AS DECIMAL(27,2)) * 1.1, 2)
                        AS DOUBLE) AS o_totalprice,
                   'U' AS __op
            FROM orders
            WHERE o_orderkey % 10 = 0
              AND CAST(round(TRY_CAST(o_totalprice AS DECIMAL(27,2)) * 1.1, 2)
                       AS DOUBLE) <> o_totalprice
            UNION ALL
            SELECT o_orderkey, o_custkey, o_totalprice, 'D'
            FROM orders WHERE o_orderkey % 10 = 1
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, o_totalprice, 'I'
            FROM orders WHERE o_orderkey % 10 = 2
        """,
        "normalize_text": """
            SELECT doc_id,
                   trim(regexp_replace(
                     lower(
                       regexp_replace(
                         regexp_replace(
                           translate('“MIXED Case” — ' || text ||
                                     '  trailing' || chr(9) || 'spaces' ||
                                     chr(160) || 'and' || chr(7) ||
                                     'control … END',
                                     '‘’“”–— ',
                                     '''''""--' || ' '),
                           '…', '...', 'g'),
                         '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')),
                     '\\s+', ' ', 'g')) AS clean
            FROM documents
        """,
        "retention": """
            WITH firsts AS (
              SELECT user_id,
                     CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort
              FROM events GROUP BY user_id
            ), activity AS (
              SELECT DISTINCT e.user_id, f.cohort,
                     CAST(FLOOR(date_diff('day', f.cohort, CAST(e.ts AS DATE))
                                / 1.0) AS INT) AS period_k
              FROM events e JOIN firsts f ON f.user_id = e.user_id
            ), act AS (
              SELECT * FROM activity WHERE period_k >= 0 AND period_k < 14
            ), counts AS (
              SELECT cohort, period_k, COUNT(*) AS n_users
              FROM act GROUP BY cohort, period_k
            ), sizes AS (
              SELECT cohort, COUNT(*) AS cohort_size FROM firsts GROUP BY cohort
            )
            SELECT CAST(c.cohort AS TIMESTAMP) AS cohort, c.period_k,
                   c.n_users, s.cohort_size
            FROM counts c JOIN sizes s USING (cohort)
        """,
        "funnel": """
            WITH s1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ), s2 AS (
              SELECT e.user_id, MIN(e.ts) AS t2
              FROM events e JOIN s1 ON s1.user_id = e.user_id
                                   AND e.ts > s1.t1
              WHERE e.event_type = 'click' GROUP BY e.user_id
            ), s3 AS (
              SELECT e.user_id, MIN(e.ts) AS t3
              FROM events e JOIN s2 ON s2.user_id = e.user_id
                                   AND e.ts > s2.t2
              WHERE e.event_type = 'purchase' GROUP BY e.user_id
            )
            SELECT s1.user_id, s1.t1, s2.t2, s3.t3
            FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        """,
        "quantile_bucket": """
            WITH cuts AS (
              SELECT c_nationkey,
                     quantile_cont(CAST(c_acctbal AS DOUBLE), 0.25) AS q0,
                     quantile_cont(CAST(c_acctbal AS DOUBLE), 0.5)  AS q1,
                     quantile_cont(CAST(c_acctbal AS DOUBLE), 0.75) AS q2
              FROM customer GROUP BY c_nationkey
            )
            SELECT c_custkey, c.c_nationkey,
                   CASE WHEN c_acctbal IS NULL THEN NULL
                        ELSE 1
                          + (CASE WHEN CAST(c_acctbal AS DOUBLE) > q0 THEN 1 ELSE 0 END)
                          + (CASE WHEN CAST(c_acctbal AS DOUBLE) > q1 THEN 1 ELSE 0 END)
                          + (CASE WHEN CAST(c_acctbal AS DOUBLE) > q2 THEN 1 ELSE 0 END)
                   END AS bal_bucket
            FROM customer c JOIN cuts USING (c_nationkey)
        """,
        "q19_discounted_revenue": """
            SELECT CAST(COALESCE(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))), 0) AS DOUBLE)
                     AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 35)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 50)
        """,
        "q22_global_sales_opportunity": """
            WITH thr AS (
              SELECT CAST(SUM(TRY_CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
                     / COUNT(*) AS t
              FROM customer WHERE c_acctbal > 0
            )
            SELECT c_nationkey, COUNT(*) AS n_cust,
                   CAST(SUM(TRY_CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
                     AS total_bal
            FROM customer, thr
            WHERE c_acctbal > thr.t
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
        """,
        "q6_forecast_revenue": """
            SELECT CAST(COALESCE(SUM(TRY_CAST(l_extendedprice * l_discount AS DECIMAL(27,6))), 0) AS DOUBLE)
                     AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "bloom_join": """
            SELECT l_orderkey, l_linenumber, l_extendedprice,
                   o_orderstatus, o_totalprice
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_totalprice > 250000
        """,
        "scd2_apply": """
            WITH versions AS (
              SELECT o_custkey AS k, o_totalprice AS price,
                     o_orderdate AS eff
              FROM (
                SELECT o_custkey, o_orderdate, o_totalprice,
                       row_number() OVER (
                         PARTITION BY o_custkey, o_orderdate
                         ORDER BY o_orderkey) AS rn
                FROM orders
              ) d WHERE rn = 1
            )
            SELECT k, price,
                   eff AS valid_from,
                   lead(eff) OVER (PARTITION BY k ORDER BY eff) AS valid_to,
                   lead(eff) OVER (PARTITION BY k ORDER BY eff) IS NULL
                     AS is_current
            FROM versions
        """,
        "incremental_agg": """
            WITH newsnap AS (
              SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 7 = 0
                          THEN CAST(round(TRY_CAST(o_totalprice AS DECIMAL(27,2))
                                          * 1.1, 2) AS DOUBLE)
                          ELSE o_totalprice END AS p
              FROM orders WHERE o_orderkey % 13 <> 0
              UNION ALL
              SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
              FROM orders WHERE o_orderkey % 17 = 0
            )
            SELECT o_orderstatus, COUNT(*) AS n,
                   CAST(SUM(TRY_CAST(p AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
            FROM newsnap GROUP BY o_orderstatus
        """,
        "streaming_incremental_agg": """
            SELECT o_orderstatus, COUNT(*) AS n,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                     AS sum_price
            FROM orders GROUP BY o_orderstatus
        """,
        "lm_score": """
            WITH tok AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents
              WHERE text IS NOT NULL AND trim(text) <> ''
            ), bg AS (
              SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
              FROM tok, unnest(range(1, len(toks))) AS r(i)
              WHERE len(toks) >= 2
            ), c12 AS (
              SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2
            ), c1 AS (
              SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1
            ), v AS (
              SELECT COUNT(DISTINCT w2) AS v FROM bg
            ), scored AS (
              SELECT bg.doc_id,
                     round(ln((CAST(c12.c12 AS DOUBLE) + 0.5)
                              / (CAST(c1.c1 AS DOUBLE) + 0.5 * v.v)), 6)
                       AS logp
              FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
            ), agg AS (
              SELECT doc_id, COUNT(*) AS n_bigrams,
                     CAST(SUM(TRY_CAST(logp AS DECIMAL(27,6))) AS DOUBLE)
                       / COUNT(*) AS lm_score
              FROM scored GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(agg.n_bigrams, 0) AS n_bigrams,
                   agg.lm_score
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN agg USING (doc_id)
        """,
        "constraint_report": """
            SELECT 'not_null(l_orderkey)' AS constraint,
                   CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT)
                     AS violations FROM lineitem
            UNION ALL
            SELECT 'not_null(l_linenumber)',
                   CAST(COUNT(*) FILTER (WHERE l_linenumber IS NULL) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'accepted_values(l_returnflag)',
                   CAST(COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
                        AND l_returnflag NOT IN ('A', 'N')) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'range(l_discount)',
                   CAST(COUNT(*) FILTER (WHERE l_discount IS NOT NULL
                        AND l_discount NOT BETWEEN 0.0 AND 0.05) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'where(qty_cap)',
                   CAST(COUNT(*) FILTER (
                        WHERE NOT COALESCE(l_quantity <= 45, FALSE)) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'unique(l_orderkey,l_linenumber)',
                   CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
            FROM (SELECT COUNT(*) AS n FROM lineitem
                  GROUP BY l_orderkey, l_linenumber) g
            WHERE n > 1
            UNION ALL
            SELECT 'foreign_key(l_orderkey->o_orderkey)',
                   CAST(COUNT(*) AS BIGINT)
            FROM lineitem
            WHERE l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_orderkey = l_orderkey)
        """,
        "unpivot_measures": """
            SELECT l_orderkey, l_linenumber,
                   'l_quantity' AS measure,
                   CAST(l_quantity AS DOUBLE) AS value
            FROM lineitem WHERE l_orderkey % 50 = 0
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   CAST(l_extendedprice AS DOUBLE)
            FROM lineitem WHERE l_orderkey % 50 = 0
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount',
                   CAST(l_discount AS DOUBLE)
            FROM lineitem WHERE l_orderkey % 50 = 0
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax',
                   CAST(l_tax AS DOUBLE)
            FROM lineitem WHERE l_orderkey % 50 = 0
        """,
        "flatten_structs": """
            SELECT o_orderkey,
                   o_orderstatus AS status,
                   o_totalprice AS price,
                   o_orderpriority AS priority
            FROM orders
        """,
        "streaming_quality_report": """
            SELECT 'not_null(l_orderkey)' AS constraint,
                   CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT)
                     AS violations,
                   CAST(2 AS BIGINT) AS n_batches
            FROM lineitem
            UNION ALL
            SELECT 'accepted_values(l_returnflag)',
                   CAST(COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL
                        AND l_returnflag NOT IN ('A', 'N')) AS BIGINT),
                   CAST(2 AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'range(l_discount)',
                   CAST(COUNT(*) FILTER (WHERE l_discount IS NOT NULL
                        AND l_discount NOT BETWEEN 0.0 AND 0.05) AS BIGINT),
                   CAST(2 AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'where(qty_cap)',
                   CAST(COUNT(*) FILTER (
                        WHERE NOT COALESCE(l_quantity <= 45, FALSE)) AS BIGINT),
                   CAST(2 AS BIGINT)
            FROM lineitem
        """,
        "merge_evolve": """
            SELECT o_orderstatus, COUNT(*) AS n,
                   CAST(COUNT(CASE WHEN o_orderkey % 10 = 0
                                   THEN 'web' END) AS BIGINT) AS n_web,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                     AS sum_price
            FROM orders GROUP BY o_orderstatus
        """,
        "manifest_stats": """
            -- empty-input contract (r14 empty gate): a 0-row
            -- repartition(4) write emits ONE schema-carrying part file,
            -- not 4 — Spark writes a file per non-empty task plus a
            -- single empty file to preserve the schema
            SELECT CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 4 END AS BIGINT)
                     AS n_files,
                   CAST(COUNT(*) AS BIGINT) AS total_rows
            FROM documents
        """,
        "analyze_table": """
            SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows,
                   CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull,
                   CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                   CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
                   CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', COUNT(*),
                   CAST(COUNT(o_orderstatus) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
                   MIN(o_orderstatus), MAX(o_orderstatus)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', COUNT(*),
                   CAST(COUNT(o_orderpriority) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
                   MIN(o_orderpriority), MAX(o_orderpriority)
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', COUNT(*),
                   CAST(COUNT(o_orderdate) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
                   CAST(MIN(o_orderdate) AS VARCHAR),
                   CAST(MAX(o_orderdate) AS VARCHAR)
            FROM orders
        """,
        "zorder_roundtrip": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        """,
        "q8_market_share": """
            SELECT o_year,
                   COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                          THEN volume END) AS DOUBLE), 0)
                     / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
                   CAST(SUM(volume) AS DOUBLE) AS total_volume
            FROM (
              SELECT year(o_orderdate) AS o_year,
                     n2.n_name AS supp_nation,
                     TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) AS volume
              FROM lineitem
              JOIN part     ON p_partkey = l_partkey AND p_type = 'ECONOMY'
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation n2 ON n2.n_nationkey = s_nationkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON n1.n_nationkey = c_nationkey
              JOIN region   ON r_regionkey = n1.n_regionkey
                           AND r_name = 'ASIA'
            ) t
            GROUP BY o_year
        """,
        "q12_late_priority_lines": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                     AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
            GROUP BY l_linestatus
        """,
        "q13_customer_distribution": """
            SELECT c_count, COUNT(*) AS custdist
            FROM (
              SELECT c_custkey,
                     COALESCE(cnt, 0) AS c_count
              FROM customer
              LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
                         FROM orders
                         WHERE o_orderpriority <> '5-LOW'
                         GROUP BY o_custkey) o
                ON c_custkey = o_custkey
            ) t
            GROUP BY c_count
        """,
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey,
                     CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
                       AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier JOIN rev ON s_suppkey = l_suppkey
            WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        """,
        "q17_small_quantity_revenue": """
            WITH li AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_brand = 'Brand#1' AND p_size < 10
            ),
            thr AS (
              SELECT l_partkey,
                     0.2 * (CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2)))
                                 AS DOUBLE) / COUNT(*)) AS t
              FROM li GROUP BY l_partkey
            )
            SELECT CAST(COALESCE(SUM(TRY_CAST(l_extendedprice AS DECIMAL(27,2))), 0)
                        AS DOUBLE) / 7.0 AS avg_yearly,
                   COUNT(*) AS n_lines
            FROM li JOIN thr ON li.l_partkey = thr.l_partkey
            WHERE l_quantity < thr.t
        """,
        "q21_waiting_suppliers": """
            SELECT s_name, COUNT(*) AS numwait
            FROM supplier
            JOIN nation ON n_nationkey = s_nationkey
                       AND n_name IN ('NATION_1', 'NATION_2')
            JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
                            AND l1.l_returnflag = 'R'
            JOIN orders ON o_orderkey = l1.l_orderkey
                       AND o_orderstatus = 'F'
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
            GROUP BY s_name
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate <  TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "q14_promo_revenue": """
            SELECT 100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) END),
                               0) AS DOUBLE)
                   / CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
                     AS promo_revenue_pct
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
        """,
        "cap_per_group": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                 || ':42'), 1, 15) AS BIGINT) % 1000000)
                                / 1000000.0 ASC,
                                doc_id ASC) AS rn
              FROM documents
            ) WHERE rn <= 10
        """,
        "winsorize": """
            WITH cuts AS (
              SELECT l_returnflag,
                     quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
                     quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_orderkey, l_linenumber, l.l_returnflag,
                   CASE WHEN l_extendedprice IS NULL THEN NULL
                        ELSE least(greatest(CAST(l_extendedprice AS DOUBLE), lo), hi)
                   END AS price_w
            -- null-safe join: GROUP BY produces a null-flag cuts row,
            -- and a plain equi-join would silently drop every
            -- null-flag lineitem (the engine winsorizes them in their
            -- own group)
            FROM lineitem l JOIN cuts
              ON l.l_returnflag IS NOT DISTINCT FROM cuts.l_returnflag
        """,
        "scrub_spans": """
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(trim(text), '\\s+') END AS t
              FROM documents
            ), spans AS (
              SELECT doc_id, u.i AS pos,
                     array_to_string(list_slice(t, u.i + 1, u.i + 8), ' ') AS gram
              FROM toks, unnest(range(0, len(t) - 8 + 1)) AS u(i)
            ), dup AS (
              SELECT gram FROM spans GROUP BY gram HAVING COUNT(*) >= 2
            ), cov AS (
              SELECT DISTINCT s.doc_id, s.pos + j.j AS cv
              FROM spans s JOIN dup USING (gram), unnest(range(0, 8)) AS j(j)
            ), tk AS (
              SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) - 1 AS p
              FROM toks
            ), kept AS (
              SELECT tk.doc_id, tk.p, tk.tok
              FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id AND cov.cv = tk.p
              WHERE cov.cv IS NULL
            ), agg AS (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean,
                     COUNT(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT toks.doc_id,
                   COALESCE(agg.clean, '') AS clean,
                   CAST(len(toks.t) AS BIGINT) AS n_tokens,
                   CAST(len(toks.t) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed
            FROM toks LEFT JOIN agg USING (doc_id)
        """,
        "quantize_embeddings": """
            WITH m AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(embedding,
                                             e -> abs(CAST(e AS DOUBLE)))) AS mx
              FROM embeddings
              -- null-explicit finiteness twin (r15 ADVICE): DuckDB's
              -- bool_and SKIPS NULL elements (row kept) where Spark's
              -- forall yields NULL (row dropped) -- make the predicate
              -- decide every case explicitly: NULL vector dropped, any
              -- NULL/NaN/Inf component dropped, empty vector kept
              -- (forall over [] is TRUE).
              WHERE embedding IS NOT NULL
                AND COALESCE(list_aggregate(list_transform(embedding,
                      e -> e IS NOT NULL AND isfinite(CAST(e AS DOUBLE))),
                      'bool_and'), TRUE)
            ), qz AS (
              SELECT vec_id,
                     list_transform(embedding,
                       e -> CAST(greatest(-127, least(127,
                              floor(CAST(e AS DOUBLE) *
                                (CASE WHEN mx > 0 THEN 127.0 / mx
                                      ELSE 0.0 END)))) AS BIGINT)) AS codes,
                     CASE WHEN mx > 0 THEN mx / 127.0 ELSE 0.0 END AS inv_scale
              FROM m
            ), ex AS (
              SELECT vec_id, unnest(codes) AS c,
                     generate_subscripts(codes, 1) AS i
              FROM qz
            ), s AS (
              SELECT vec_id, CAST(SUM(c) AS BIGINT) AS code_sum,
                     CAST(SUM(abs(c)) AS BIGINT) AS code_l1,
                     CAST(SUM(c * i) AS BIGINT) AS code_wsum
              FROM ex GROUP BY vec_id
            )
            SELECT qz.vec_id, CAST(len(qz.codes) AS BIGINT) AS n_dim,
                   s.code_sum, s.code_l1, s.code_wsum, qz.inv_scale
            FROM qz LEFT JOIN s USING (vec_id)
        """,
        "similarity_quantized_topk": """
            WITH m AS (
              SELECT vec_id,
                     list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v,
                     list_max(list_transform(embedding,
                                             e -> abs(CAST(e AS DOUBLE)))) AS mx
              FROM embeddings
              -- null-explicit finiteness twin (r15 ADVICE): DuckDB's
              -- bool_and SKIPS NULL elements (row kept) where Spark's
              -- forall yields NULL (row dropped) -- make the predicate
              -- decide every case explicitly: NULL vector dropped, any
              -- NULL/NaN/Inf component dropped, empty vector kept
              -- (forall over [] is TRUE).
              WHERE embedding IS NOT NULL
                AND COALESCE(list_aggregate(list_transform(embedding,
                      e -> e IS NOT NULL AND isfinite(CAST(e AS DOUBLE))),
                      'bool_and'), TRUE)
            ), qz AS (
              SELECT vec_id,
                     list_transform(v,
                       e -> CAST(greatest(-127, least(127,
                              floor(e * (CASE WHEN mx > 0 THEN 127.0 / mx
                                              ELSE 0.0 END)))) AS BIGINT)) AS codes
              FROM m
            ), n AS (
              SELECT vec_id, codes,
                     sqrt(CAST(list_sum(list_transform(codes, c -> c * c))
                               AS DOUBLE)) AS nrm
              FROM qz
            ), s AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     CASE WHEN q.nrm > 0 AND c.nrm > 0
                          THEN round(CAST(list_sum(list_transform(
                                 list_zip(q.codes, c.codes),
                                 p -> p[1] * p[2])) AS DOUBLE)
                               / (q.nrm * c.nrm), 6)
                          ELSE 0.0 END AS sim
              FROM n q, n c
              WHERE q.vec_id % 100 = 0 AND q.vec_id <> c.vec_id
            )
            SELECT query_id, neighbor_id, sim FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id ASC) AS rn FROM s
            ) WHERE rn <= 5
        """,
        "extract_json": """
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(SUM(k) AS BIGINT) AS k_sum, MIN(k) AS k_min,
                   MAX(k) AS k_max, COUNT(DISTINCT k) AS k_distinct
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY n1.n_name, n2.n_name,
                     CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
        """,
        "q10_returned_items": """
            WITH per AS (
              SELECT o_custkey,
                     SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS rev
              FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              WHERE o_orderdate >= TIMESTAMP '1996-10-01'
                AND o_orderdate <  TIMESTAMP '1997-01-01'
                AND l_returnflag = 'R'
              GROUP BY o_custkey
            )
            SELECT per.o_custkey AS c_custkey, c.c_name,
                   CAST(per.rev AS DOUBLE) AS revenue, c.c_acctbal, n.n_name
            FROM per
            JOIN customer c ON c.c_custkey = per.o_custkey
            JOIN nation n   ON n.n_nationkey = c.c_nationkey
            ORDER BY per.rev DESC, per.o_custkey ASC
            LIMIT 20
        """,
        "logging": "SELECT * FROM nation",
        "checkpoint": """
            SELECT l_returnflag, COUNT(*) AS n_items, MAX(l_quantity) AS max_qty
            FROM lineitem WHERE l_quantity >= 25 GROUP BY l_returnflag
        """,
        "confluent": """
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 150000
            UNION ALL
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 150000
        """,
        "running_total": """
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,6))) OVER w AS DOUBLE)
                       AS running_spend,
                   COUNT(*) OVER w AS order_seq
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate ASC, o_orderkey ASC
                         ROWS UNBOUNDED PRECEDING)
        """,
        "sessionize": f"""
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 < INTERVAL 30 MINUTE
                            THEN 0 ELSE 1 END AS new_sess
                FROM events WHERE {_event_window_sql()}),
            sess AS (
                SELECT user_id, ts, value,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged)
            SELECT MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   user_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) AS v_sum
            FROM sess GROUP BY user_id, sid
        """,
        "summarize_any": """
            SELECT o_orderpriority, MIN(o_orderstatus) AS any_status, COUNT(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
                   o_orderdate
            FROM customer
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate  > TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   CAST(SUM(TRY_CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
            JOIN nation   ON n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "q18_large_volume_customer": """
            SELECT c_name, o_custkey AS c_custkey, o_orderkey, o_orderdate,
                   o_totalprice,
                   CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
            HAVING SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) > 300
            ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
            LIMIT 100
        """,
        "rollup_agg": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
                   CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "rank_in_group": """
            SELECT c_custkey, c_nationkey, c_acctbal,
                   dense_rank() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS bal_rank
            FROM customer
        """,
        "moving_avg": """
            SELECT o_custkey, o_orderkey,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,6))) OVER w AS DOUBLE)
                        / COUNT(*) OVER w AS moving_avg_5
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate ASC, o_orderkey ASC
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "pivot_agg": """
            SELECT o_orderpriority,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
            FROM orders GROUP BY o_orderpriority
        """,
        "training_pipeline": f"""
            WITH ta AS ({_duck_text_analysis_sql()}),
            filtered AS (SELECT * FROM ta WHERE quality >= 0.5),
            keepers AS (SELECT fp, MIN(doc_id) AS keeper_id
                        FROM filtered GROUP BY fp),
            kept AS (SELECT f.* FROM filtered f
                     JOIN keepers k ON f.doc_id = k.keeper_id)
            SELECT lang_guess AS lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM kept GROUP BY 1
        """,
        "cube_agg": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_price
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "intersect_keys": """
            SELECT o_custkey AS custkey FROM orders
            INTERSECT
            SELECT c_custkey AS custkey FROM customer WHERE c_acctbal >= 5000
        """,
        "except_keys": """
            SELECT c_custkey AS custkey FROM customer
            EXCEPT
            SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        """,
        "approx_distinct": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS exact_parts,
                   COUNT(*) AS n_items,
                   TRUE AS within_bound
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "approx_percentile": """
            SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.5) AS median_qty,
                   COUNT(*) AS n_items,
                   TRUE AS within_bound
            FROM lineitem GROUP BY l_returnflag
        """,
        "multimodal_features": """
            -- a NULL payload decodes to the zero vector (the
            -- fake_decoder contract), not NULL features
            SELECT doc_id AS media_id,
                   CASE WHEN text IS NULL THEN 0.0 ELSE
                     CAST('0x' || substr(md5(text), 1, 2) AS INT) / 256.0 END AS f0,
                   CASE WHEN text IS NULL THEN 0.0 ELSE
                     CAST('0x' || substr(md5(text), 15, 2) AS INT) / 256.0 END AS f7,
                   CASE WHEN text IS NULL THEN 0.0 ELSE
                     CAST('0x' || substr(md5(text), 31, 2) AS INT) / 256.0 END AS f15
            FROM documents
        """,
        "cogroup": """
            WITH o AS (SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
                 l AS (SELECT l_orderkey AS k, COUNT(*) AS n,
                              ROUND(CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE), 2) AS s
                       FROM lineitem GROUP BY 1)
            SELECT COALESCE(o.k, l.k) AS o_orderkey,
                   COALESCE(o.n, 0) AS n_orders,
                   COALESCE(l.n, 0) AS n_items,
                   l.s AS sum_qty
            FROM o FULL JOIN l ON o.k = l.k
        """,
        "cogroup3": """
            WITH c AS (SELECT c_custkey AS k, COUNT(*) AS n FROM customer GROUP BY 1),
                 o AS (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
                 e AS (SELECT user_id  AS k, COUNT(*) AS n FROM events GROUP BY 1)
            SELECT COALESCE(c.k, o.k, e.k) AS k,
                   COALESCE(c.n, 0) AS n_cust,
                   COALESCE(o.n, 0) AS n_orders,
                   COALESCE(e.n, 0) AS n_events
            FROM c FULL JOIN o ON c.k = o.k
                   FULL JOIN e ON COALESCE(c.k, o.k) = e.k
        """,
        "group_sort": """
            SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
                SELECT *, row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn = 1
        """,
        "top_k_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT *, row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "distinct": """
            SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        """,
        "text_analysis": _duck_text_analysis_sql(),
        "cogroup_chunked": """
            SELECT c.c_custkey, c.c_name,
                   COUNT(o.o_orderkey) AS n_orders,
                   MAX(o.o_totalprice) AS max_price
            FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_name
        """,
        "text_repetition": """
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents),
            g AS (
              SELECT doc_id,
                CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                                      i -> array_to_string(toks[i:i+1], ' '))
                  ELSE [] END AS g2,
                CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(toks[i:i+2], ' '))
                  ELSE [] END AS g3
              FROM t),
            s AS (
              SELECT doc_id,
                len(g2) AS n2, len(list_distinct(g2)) AS d2,
                len(g3) AS n3, len(list_distinct(g3)) AS d3,
                CASE WHEN len(g2) > 0 THEN
                  list_max(list_transform(list_distinct(g2),
                    u -> len(list_filter(g2, x -> x = u))))
                ELSE 0 END AS top2
              FROM g),
            r AS (
              SELECT doc_id,
                round(CASE WHEN n2 > 0
                  THEN 1.0 - CAST(d2 AS DOUBLE) / n2 ELSE 0.0 END, 6)
                  AS dup_2gram_ratio,
                round(CASE WHEN n3 > 0
                  THEN 1.0 - CAST(d3 AS DOUBLE) / n3 ELSE 0.0 END, 6)
                  AS dup_3gram_ratio,
                round(CASE WHEN n2 > 0
                  THEN CAST(top2 AS DOUBLE) / n2 ELSE 0.0 END, 6)
                  AS top_2gram_share
              FROM s)
            SELECT doc_id, dup_2gram_ratio, dup_3gram_ratio, top_2gram_share,
                   (top_2gram_share > 0.20 OR dup_3gram_ratio > 0.18)
                     AS repetitive
            FROM r
        """,
        "sample_stratified": f"""
            SELECT doc_id, lang, source FROM documents
            WHERE ({_DUCK_UNIT_HASH.format(key='doc_id')}) <
                  CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                            WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.25
                            WHEN 'zh' THEN 0.1 ELSE 0.0 END
        """,
        "train_val_split": f"""
            WITH u AS (SELECT lang, {_DUCK_UNIT_HASH.format(key='doc_id')} AS uh
                       FROM documents)
            SELECT CASE WHEN uh < 0.8 THEN 'train'
                        WHEN uh < 0.9 THEN 'val' ELSE 'test' END AS split,
                   lang, COUNT(*) AS n_docs
            FROM u GROUP BY 1, 2
        """,
        "contamination_check": f"""
            -- r14 rewrite (VERDICT r13 Next #7): the former tr-x-ev
            -- gram join materialized a 161M-row pair stream through a
            -- poorly-parallelized CTE scan (EXPLAIN ANALYZE: 38.7 s
            -- join + 13.6 s distinct-agg of 65 s total at sf1).  The
            -- eval side is pre-aggregated per gram (count + id list),
            -- so the join emits one row per MATCHED TRAIN GRAM
            -- (~4M rows, 40x smaller); n_shared_grams = SUM of
            -- per-gram eval counts, n_eval_docs = distinct over the
            -- flattened id lists — identical results, 71 -> 15 s.
            WITH sh AS MATERIALIZED ({_duck_shingles_n(5)}),
            g AS MATERIALIZED (SELECT id, unnest(shingles) AS gram FROM sh),
            tr AS (SELECT id AS train_id, gram FROM g WHERE id % 10 != 0),
            evg AS (SELECT gram, COUNT(*) AS n_ev, list(id) AS ev_ids
                    FROM g WHERE id % 10 = 0 GROUP BY gram),
            agg AS (SELECT train_id, SUM(n_ev) AS n_shared_grams,
                           flatten(list(ev_ids)) AS all_ev
                    FROM tr JOIN evg USING (gram) GROUP BY train_id)
            SELECT train_id, CAST(n_shared_grams AS BIGINT) AS n_shared_grams,
                   CAST(len(list_distinct(all_ev)) AS BIGINT) AS n_eval_docs
            FROM agg WHERE n_shared_grams >= 1
        """,
        "corpus_stats": """
            -- null/empty text tokenizes to [] (the engine's tokens()
            -- contract) and scores quality 0.0, mirroring the guarded
            -- per-term ratios Spark-side
            WITH t AS (SELECT lang, text,
                              CASE WHEN text IS NULL OR trim(text) = ''
                                   THEN CAST([] AS VARCHAR[])
                                   ELSE string_split_regex(trim(text), '\\s+') END AS toks
                       FROM documents),
            q AS (SELECT lang, len(toks) AS nt,
                         CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
                           (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.4
                           + least(1.0, (CAST(length(regexp_replace(text,'\\s+','','g')) AS DOUBLE)
                                         / len(toks)) / 8.0) * 0.3
                           + (CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)
                              / length(text)) * 0.3, 6) END AS qs
                  FROM t)
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(nt) AS BIGINT) AS total_tokens,
                   round(quantile_cont(nt, 0.5), 6) AS median_tokens,
                   round(AVG(qs), 6) AS avg_quality
            FROM q GROUP BY lang
        """,
        "embedding_centroids": """
            SELECT label, pos, round(AVG(v), 6) AS c, COUNT(*) AS n_vecs
            FROM (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                         CAST(unnest(embedding) AS DOUBLE) AS v
                  FROM embeddings)
            GROUP BY label, pos
        """,
        "group_view_lookup": """
            SELECT n_name, COUNT(*) AS n_customers
            FROM customer JOIN nation ON n_nationkey = c_nationkey
            GROUP BY n_name
        """,
        "bucketed_join": """
            SELECT o_custkey, COUNT(*) AS n_items,
                   CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_custkey
        """,
        "output_roundtrip": """
            SELECT o_orderstatus,
                   COUNT(*) AS n_csv,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_csv,
                   COUNT(*) AS n_parquet,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_parquet
            FROM orders GROUP BY o_orderstatus
        """,
        "token_budget": r"""
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END)
                        AS BIGINT) AS ws_tokens,
                   CAST(SUM(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]')))
                        AS BIGINT) AS bpe_tokens
            FROM documents GROUP BY source
        """,
        "dedup_exact": """
            SELECT md5(lower(trim(regexp_replace(text,'\\s+',' ','g')))) AS fp,
                   MIN(doc_id) AS keeper_id, COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "dedup_minhash_lsh": _duck_minhash_lsh_sql(threshold=0.5),
        "dedup_edit_distance": _duck_edit_distance_sql(max_distance=20),
        "url_canonical_dedup": _DUCK_URL_CANON,
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_duck_minhash_lsh_sql(threshold=0.5)}),
            edges AS MATERIALIZED (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ),
            reach AS (
              SELECT a AS n, b AS m FROM edges
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
            ),
            labels AS (
              SELECT n, LEAST(n, MIN(m)) AS cluster_id FROM reach GROUP BY n
            ),
            lab_all AS MATERIALIZED (
              SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN labels l ON l.n = d.doc_id
            ),
            sizes AS (
              SELECT cluster_id, COUNT(*) AS cluster_size
              FROM lab_all GROUP BY cluster_id
            )
            SELECT a.doc_id, a.cluster_id,
                   a.doc_id = a.cluster_id AS is_keeper, s.cluster_size
            FROM lab_all a JOIN sizes s USING (cluster_id)
        """,
        "dedup_corpus": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_duck_minhash_lsh_sql(threshold=0.5)}),
            edges AS MATERIALIZED (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ),
            reach AS (
              SELECT a AS n, b AS m FROM edges
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
            ),
            labels AS (
              SELECT n, LEAST(n, MIN(m)) AS cluster_id FROM reach GROUP BY n
            ),
            lab_all AS MATERIALIZED (
              SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN labels l ON l.n = d.doc_id
            ),
            sizes AS (
              SELECT cluster_id, COUNT(*) AS cluster_size
              FROM lab_all GROUP BY cluster_id
            )
            SELECT d.doc_id, d.lang, d.source, s.cluster_size
            FROM lab_all a
            JOIN sizes s USING (cluster_id)
            JOIN documents d ON d.doc_id = a.doc_id
            WHERE a.doc_id = a.cluster_id
        """,
        "dedup_corpus_best": f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({_duck_minhash_lsh_sql(threshold=0.5)}),
            edges AS MATERIALIZED (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ),
            reach AS (
              SELECT a AS n, b AS m FROM edges
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
            ),
            labels AS (
              SELECT n, LEAST(n, MIN(m)) AS cluster_id FROM reach GROUP BY n
            ),
            lab_all AS MATERIALIZED (
              SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN labels l ON l.n = d.doc_id
            ),
            sizes AS (
              SELECT cluster_id, COUNT(*) AS cluster_size
              FROM lab_all GROUP BY cluster_id
            ),
            scored AS MATERIALIZED (
              SELECT a.doc_id, a.cluster_id, d.n_chars
              FROM lab_all a JOIN documents d USING (doc_id)
            ),
            mx AS (
              SELECT cluster_id, MAX(n_chars) AS mx FROM scored GROUP BY cluster_id
            ),
            keepers AS (
              -- null-safe argmax (combined-gate red #2): MAX ignores
              -- NULLs, so an all-NULL-n_chars cluster has mx = NULL and
              -- a plain = drops it entirely; the engine's row_number
              -- keeper (n_chars DESC NULLS LAST, doc_id ASC) correctly
              -- keeps such docs as singleton keepers.  The contract —
              -- MAX-ignores-nulls + min-id tiebreak over NULL n_chars —
              -- is unit-pinned in tests/test_llm_ops.py.
              SELECT s.cluster_id, MIN(s.doc_id) AS doc_id
              FROM scored s
              JOIN mx ON mx.cluster_id = s.cluster_id
                     AND s.n_chars IS NOT DISTINCT FROM mx.mx
              GROUP BY s.cluster_id
            )
            SELECT d.doc_id, d.lang, d.source, z.cluster_size
            FROM keepers k
            JOIN sizes z USING (cluster_id)
            JOIN documents d ON d.doc_id = k.doc_id
        """,
        "mix_corpus": f"""
            WITH t AS (
              SELECT doc_id, source,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS nt
              FROM documents),
            tot AS (SELECT source, SUM(nt) AS toks FROM t GROUP BY source),
            r AS (
              SELECT source,
                     LEAST(1.0, 2000.0 * (CASE source
                         WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 0.3
                         WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1
                         ELSE 0.0 END) / toks) AS rate
              FROM tot)
            SELECT t.doc_id, t.source
            FROM t JOIN r USING (source)
            WHERE ({_DUCK_UNIT_HASH.format(key='doc_id')}) < rate
        """,
        "shard_assignment": """
            WITH h AS (
              SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                     || ':shard:42'), 1, 15) AS BIGINT) AS hv
              FROM documents)
            SELECT CAST(hv % 8 AS INT) AS shard, COUNT(*) AS n_docs,
                   MIN(hv) AS min_order, MAX(hv) AS max_order
            FROM h GROUP BY 1
        """,
        "chunk_documents": """
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents
              WHERE text IS NOT NULL AND trim(text) <> ''),
            s AS (
              SELECT doc_id, toks,
                     unnest(range(0, greatest(len(toks) - 8, 1), 32)) AS start
              FROM t)
            SELECT doc_id,
                   CAST(start // 32 AS BIGINT) AS chunk_id,
                   array_to_string(toks[start+1:start+40], ' ') AS chunk_text,
                   CAST(len(toks[start+1:start+40]) AS BIGINT) AS n_tokens
            FROM s
        """,
        "quality_filter": """
            -- null/empty text tokenizes to [] and scores 0.0 (engine
            -- tokens()/quality_score contract)
            WITH t AS (
              SELECT doc_id, lang, text,
                     CASE WHEN text IS NULL OR trim(text) = ''
                          THEN CAST([] AS VARCHAR[])
                          ELSE string_split_regex(trim(text), '\\s+') END AS toks
              FROM documents),
            q AS (
              SELECT doc_id, lang,
                CASE WHEN len(toks) = 0 THEN 0.0 ELSE round(
                  (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 0.4
                  + least(1.0, (CAST(length(regexp_replace(text,'\\s+','','g')) AS DOUBLE)
                                / len(toks)) / 8.0) * 0.3
                  + (CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)
                     / length(text)) * 0.3, 6) END AS quality
              FROM t),
            r AS (
              SELECT *, cume_dist() OVER (
                        PARTITION BY lang ORDER BY quality ASC) AS cd
              FROM q)
            SELECT doc_id, lang, quality FROM r WHERE cd > 0.2
        """,
        "merge_upsert": _MERGE_ORACLE,
        # same final state: the CDC batches partition the same key classes
        "streaming_cdc_upsert": _MERGE_ORACLE,
        "dedup_ngram_jaccard": _duck_ngram_jaccard_sql(threshold=0.3),
        "text_simhash": f"""
            SELECT doc_id, sh AS simhash FROM ({_duck_simhash_sql(64)})
        """,
        "dedup_simhash_groups": f"""
            WITH s AS ({_duck_simhash_sql(64)})
            SELECT sh AS simhash, MIN(doc_id) AS keeper_id,
                   COUNT(*) AS dup_count
            FROM s GROUP BY 1 HAVING COUNT(*) >= 2
        """,
        "dedup_simhash_pairs": f"""
            WITH s AS MATERIALIZED ({_duck_simhash_sql(64)}),
            ch AS MATERIALIZED (SELECT doc_id, sh, i, (sh >> (i * 16)) & 65535 AS cv
                   FROM s, (SELECT unnest(range(0, 4)) AS i)),
            keep AS (SELECT i, cv FROM ch GROUP BY i, cv
                     HAVING COUNT(*) BETWEEN 2 AND 500),
            chk AS MATERIALIZED (SELECT * FROM ch WHERE (i, cv) IN (SELECT (i, cv) FROM keep)),
            cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                     FROM chk a JOIN chk b ON a.i = b.i AND a.cv = b.cv
                     WHERE a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   CAST(bit_count(xor(sa.sh, sb.sh)) AS BIGINT) AS hamming
            FROM cand
            JOIN s sa ON sa.doc_id = id_a
            JOIN s sb ON sb.doc_id = id_b
            WHERE bit_count(xor(sa.sh, sb.sh)) <= 3
        """,
        "similarity_bruteforce_topk": _duck_bruteforce_sql(k=5, nq=10),
        "similarity_lsh_ann": _duck_lsh_ann_sql(k=5, nq=10, planes=6, num_tables=4),
        "similarity_ivf": _duck_ivf_sql(k=5, nq=10, n_centroids=8, nprobe=2),
        "similarity_near_dup": _duck_near_dup_sql(threshold=0.45, planes=2),
        "embedding_dup_clusters": _duck_embedding_cc_sql(rounds=30),
        "streaming_dedup": f"""
            SELECT DISTINCT user_id, event_type, ts FROM events WHERE {_event_window_sql()}
        """,
        "streaming_interval_join": f"""
            SELECT p.event_id AS p_id, c.event_id AS c_id
            FROM events p
            JOIN events c ON p.user_id = c.user_id
                         AND p.ts >= c.ts
                         AND p.ts <= c.ts + INTERVAL 10 MINUTE
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
              AND {_event_window_sql('p.ts')}
              AND {_event_window_sql('c.ts')}
        """,
        "streaming_stateful_count": f"""
            SELECT user_id, COUNT(*) AS running_count FROM events
            WHERE {_event_window_sql()} GROUP BY user_id
        """,
        "iterative_rounds": """
            SELECT c_nationkey, COUNT(*) AS n_orders, 'BUILDING' AS segment
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
            UNION ALL
            SELECT c_nationkey, COUNT(*) AS n_orders, 'MACHINERY' AS segment
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_mktsegment = 'MACHINERY' GROUP BY c_nationkey
        """,
        "resample_locf": f"""
            WITH sparse AS (
                SELECT event_type,
                       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
                       COUNT(value) AS n0,
                       CAST(SUM(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(27,6))) AS DOUBLE)
                           AS s0,
                       CAST(SUM(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(27,6))) AS DOUBLE)
                            / COUNT(value) AS a0
                FROM events
                WHERE {_event_window_sql()}
                GROUP BY 1, 2
            ), spans AS (
                SELECT event_type, MIN(b) AS lo, MAX(b) AS hi
                FROM sparse GROUP BY 1
            ), grid AS (
                SELECT event_type, UNNEST(range(lo, hi + 1)) AS b FROM spans
            ), filled AS (
                -- IS NOT DISTINCT FROM: the NULL event_type group grids
                -- and fills like any other key (combined-gate red #1 —
                -- a plain = never matched NULL grid keys back to their
                -- sparse rows, dropping the whole NULL-key series; the
                -- standing nulls gate masked it via correlated
                -- injection).  Engine side already groups NULL keys
                -- natively.
                SELECT g.event_type, g.b, s.n0, s.s0, s.a0
                FROM grid g LEFT JOIN sparse s
                  ON g.event_type IS NOT DISTINCT FROM s.event_type
                 AND g.b = s.b
            ), edged AS (
                SELECT *,
                       last_value(a0 IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY b
                           ROWS UNBOUNDED PRECEDING) AS pv,
                       last_value(CASE WHEN a0 IS NOT NULL THEN b END
                                  IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY b
                           ROWS UNBOUNDED PRECEDING) AS pb,
                       first_value(a0 IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY b
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS nv,
                       first_value(CASE WHEN a0 IS NOT NULL THEN b END
                                   IGNORE NULLS) OVER (
                           PARTITION BY event_type ORDER BY b
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS nb
                FROM filled
            )
            SELECT event_type,
                   TIMESTAMP '1970-01-01 00:00:00'
                       + b * INTERVAL 3600 SECOND AS bucket_start,
                   TIMESTAMP '1970-01-01 00:00:00'
                       + (b + 1) * INTERVAL 3600 SECOND AS bucket_end,
                   COALESCE(n0, 0) AS n_events,
                   last_value(s0 IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY b
                       ROWS UNBOUNDED PRECEDING) AS sum_value,
                   CASE WHEN a0 IS NOT NULL THEN a0
                        ELSE pv + (nv - pv) * ((b - pb) / (nb - pb))
                   END AS avg_value
            FROM edged
        """,
        "iterative_transactional_output": """
            SELECT c_nationkey, COUNT(*) AS n_orders,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                       AS sum_price,
                   'BUILDING' AS segment
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
            UNION ALL
            SELECT c_nationkey, COUNT(*) AS n_orders,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                       AS sum_price,
                   'MACHINERY' AS segment
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_mktsegment = 'MACHINERY' GROUP BY c_nationkey
            UNION ALL
            SELECT c_nationkey, COUNT(*) AS n_orders,
                   CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                       AS sum_price,
                   'AUTOMOBILE' AS segment
            FROM orders JOIN customer ON c_custkey = o_custkey
            WHERE c_mktsegment = 'AUTOMOBILE' GROUP BY c_nationkey
        """,
        "streaming_sessionize": f"""
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 < INTERVAL 30 MINUTE
                            THEN 0 ELSE 1 END AS new_sess
                FROM events WHERE {_event_window_sql()}),
            sess AS (
                SELECT user_id, ts, value,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged)
            SELECT MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   user_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) AS v_sum
            FROM sess GROUP BY user_id, sid
        """,
        "streaming_windowed_agg": f"""
            SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
                   date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS window_end,
                   event_type,
                   COUNT(*) AS n,
                   CAST(SUM(TRY_CAST(nullif(value, 'NaN'::DOUBLE) AS DECIMAL(27,6))) AS DOUBLE) AS v_sum
            FROM events WHERE {_event_window_sql()} GROUP BY 1, 2, 3
        """,
    }
