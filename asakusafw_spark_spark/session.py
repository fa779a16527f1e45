"""Engine-tuned SparkSession factory.

The reference forces Kryo + a registrator and sizes parallelism from
data-size classes (runtime/src/main/scala/com/asakusafw/spark/runtime/
SparkClient.scala:119-121, planner/.../PartitionGroupAnalyzer.java:55-110).
On Spark SQL none of that is needed: Tungsten UnsafeRow replaces Kryo and
AQE replaces static partition sizing.  What we DO pin down:

- AQE on (runtime coalescing + skew-join handling) — replaces the
  reference's TINY/SMALL/REGULAR/LARGE/HUGE partition-count classes.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster leave AQE to coalesce from a high initial count.
- UTC session timezone so results compare bit-for-bit with the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
- Arrow enabled for the Pandas-UDF slow path.
- ``autoBroadcastJoinThreshold`` = 20 MiB to honor the reference's
  "TINY" broadcast limit (PartitionGroupAnalyzer.java:68-78).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Reference "TINY" broadcast size limit, 20 MiB
#: (planner/.../PartitionGroupAnalyzer.java:68-78).
TINY_BROADCAST_BYTES = 20 * 1024 * 1024


def engine_builder(
    app_name: str = "asakusafw_spark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession.Builder:
    """Return a SparkSession builder with the engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a real cluster pass
    ``master=None`` with ``spark.master`` already set by spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = max(os.cpu_count() or 8, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 50k-row Arrow batches: the streaming cogroup pays per-batch
        # Python overhead, so fewer/larger batches win (~20% on grouped
        # stages); memory bound = batch-rows × row-width per worker.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(TINY_BROADCAST_BYTES))
        # answer MIN/MAX/COUNT-only scans from parquet footer statistics
        # (no row materialization); runtime bloom-filter join pruning and
        # dynamic partition pruning are already on by default in Spark 4
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # let AQE re-optimize (coalesce/skew-split) ABOVE persisted
        # frames: default-false only for plan-shape stability, results
        # are unaffected.  Every _persist consumer (iterative rounds,
        # dedup family, CC loop) otherwise runs its post-cache stages at
        # the static partition count — measured 25% off
        # iterative_transactional_output (1.86→1.24 s interleaved, r16)
        # (env-toggleable so the A/B ordered by the r16 verdict — conf
        # ON/OFF over the _persist family at 32 cores — runs the SAME
        # tree in both arms; default stays true)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            os.environ.get("SPARK_GRAFT_CACHED_REPARTITION", "true"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b


def get_spark(**kwargs) -> SparkSession:
    """Get-or-create the engine SparkSession."""
    spark = engine_builder(**kwargs).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
