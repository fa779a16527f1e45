#!/usr/bin/env python3
"""10x scale-shape probes for the STREAMING maintained-state family
(VERDICT r07 Next #6): stream_agg_maintain /
stream_distinct_sketch_maintain / stream_quantile_sketch_maintain.

The contract under test: per-batch cost is ∝ state size + batch churn,
NEVER stream history.  Two probes per maintainer:

- **10x batches** (same per-batch rows, same key space): total
  wall-clock must stay ~linear in batch count (ratio ≈ 10 for 10x the
  batches).  A history-dependent implementation (e.g. rescanning prior
  appends each trigger) would go quadratic (ratio → ~55x).
- **10x state cardinality** (same batches, same per-batch rows, 10x
  distinct keys): total must grow FAR less than 10x — only the
  state-frame merge widens; the batch scan is unchanged.

Run: python tools/scale_probe_r08.py   (results belong in BASELINE.md)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_feed(spark, root: str, batches: int, rows: int, keys: int) -> str:
    """One parquet FILE per micro-batch (maxFilesPerTrigger=1), rows
    deterministic: key = id % keys, v = id % 1000 as double.  ONE Spark
    job: partitionBy the batch id, then flatten each partition dir's
    single file into the feed."""
    feed = f"{root}/feed_b{batches}_r{rows}_k{keys}"
    stage = f"{root}/_stage_{uuid.uuid4().hex[:8]}"
    (
        spark.range(batches * rows)
        .select(
            (F.col("id") / rows).cast("int").alias("b"),
            (F.col("id") % keys).cast("string").alias("g"),
            (F.col("id") % 1000).cast("double").alias("v"),
            (F.col("id") % 5000).alias("u"),
        )
        .repartition("b")
        .write.partitionBy("b")
        .parquet(stage)
    )
    os.makedirs(feed, exist_ok=True)
    for b in range(batches):
        os.replace(
            glob.glob(f"{stage}/b={b}/part-*.parquet")[0],
            f"{feed}/{b:05d}.parquet",
        )
    shutil.rmtree(stage)
    return feed


def run_maintainer(spark, op: str, feed: str, root: str) -> float:
    from asakusafw_spark_spark.streaming import (
        stream_agg_maintain,
        stream_distinct_sketch_maintain,
        stream_quantile_sketch_maintain,
    )

    tag = uuid.uuid4().hex[:8]
    target = f"{root}/state_{tag}"
    ck = f"{root}/ck_{tag}"
    stream = (
        spark.readStream.schema("g string, v double, u long")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    t0 = time.perf_counter()
    if op == "agg":
        stream_agg_maintain(
            stream, target, "g", {"sum_v": "v"}, ck, query_name=f"p_{tag}"
        )
    elif op == "distinct":
        stream_distinct_sketch_maintain(
            stream, target, "g", "u", ck, query_name=f"p_{tag}"
        )
    elif op == "quantile":
        stream_quantile_sketch_maintain(
            stream, target, "g", "v", ck, query_name=f"p_{tag}"
        )
    dt = time.perf_counter() - t0
    n = spark.read.parquet(target).count()
    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(ck, ignore_errors=True)
    return dt, n


def main() -> None:
    from asakusafw_spark_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_r08")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="sgr8_probe_")

    B, R, G = 4, 20_000, 2_000
    feeds = {
        "base": build_feed(spark, root, B, R, G),
        "b10": build_feed(spark, root, B * 10, R, G),
        "k10": build_feed(spark, root, B, R, G * 10),
    }
    print(f"feeds under {root}: base={B}x{R} rows/{G} keys, "
          f"b10={B*10} batches, k10={G*10} keys\n")

    for op in ("agg", "distinct", "quantile"):
        tb, nb = run_maintainer(spark, op, feeds["base"], root)
        print(f"{op:9s} base       {tb:6.1f}s ({nb} keys)", flush=True)
        t10b, n10b = run_maintainer(spark, op, feeds["b10"], root)
        print(f"{op:9s} 10x batches {t10b:6.1f}s -> {t10b / tb:5.2f}x "
              f"(linear=10, quadratic~55)", flush=True)
        t10k, n10k = run_maintainer(spark, op, feeds["k10"], root)
        print(f"{op:9s} 10x state  {t10k:6.1f}s ({n10k} keys) -> "
              f"{t10k / tb:5.2f}x", flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
