#!/usr/bin/env python3
"""Skew-split demonstration on the pinned-SMJ fact joins (VERDICT r16
item 6): run q5/q7 on the skew10x corpus and capture the EXECUTED
adaptive plan (a) under default AQE skew thresholds and (b) with the
thresholds scaled down to the corpus' size, proving the pinned
sort-merge fact join stays OptimizeSkewedJoin-eligible (both SMJ
children are bare shuffles) and citing why the default threshold does
not fire at this scale.

Findings encoded by tools/skew_probe.py apply: the plan must be read
from the SAME QueryExecution that executed (collect, not a separate
write command), and AQE splits at map-output granularity so the scan
must produce many map tasks (the skew10x corpus does).

Usage: python tools/skew_demo_r17.py [skew_dir]
       (default /tmp/sf_skew10x; build it first via tools/run_gates.py
        machinery or robustness_sweep)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "plans", "r17")


def run(name: str, fn, spark, sf_dir: str, tag: str) -> dict:
    df = fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = os.path.join(PLANS, f"{name}_skew10x_{tag}.txt")
    with open(out, "w") as f:
        f.write(plan)
    n_skew_reads = len(re.findall(r"AQEShuffleRead.*skewed", plan))
    return {
        "query": name,
        "tag": tag,
        "final": "isFinalPlan=true" in plan or "AdaptiveSparkPlan" not in plan,
        "sortmergejoin": plan.count("SortMergeJoin"),
        "skewed_aqe_reads": n_skew_reads,
        "skew_mentions": plan.count("skewed"),
        "plan_file": os.path.relpath(out, REPO),
    }


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_skew10x"
    if not os.path.isdir(skew_dir):
        import tools.robustness_sweep as R

        prev = R.SRC
        R.SRC = "/root/testdata/sf0.01"
        try:
            R.build(skew_dir, skew=True)
        finally:
            R.SRC = prev

    from asakusafw_spark_spark.session import get_spark
    import __spark_entry__ as entry_mod

    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark(app_name="skew_demo_r17")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    targets = ["q5_local_supplier_volume", "q7_volume_shipping"]

    results = []
    # Arm A: driver defaults (skewedPartitionThresholdInBytes=256m,
    # skewedPartitionFactor=5.0) — expected NOT to fire at this corpus
    # size; the artifact records that measured fact.
    for name in targets:
        results.append(run(name, qs[name], spark, skew_dir, "default"))

    # Arm B: thresholds scaled to the corpus (the skew10x hot partition
    # is tens of MB; production hot partitions exceed the 256 MB
    # default) — the claim under test is the plan SHAPE is eligible.
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    try:
        for name in targets:
            results.append(run(name, qs[name], spark, skew_dir, "scaled"))
    finally:
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    # Arm C: positive demonstration on the SAME operator shape the fact
    # joins use (master_join strategy="shuffled" → SMJ over bare
    # ENSURE_REQUIREMENTS shuffles).  The skew10x corpus scans as ONE
    # map task (1.7 MB single file) and AQE splits skewed partitions at
    # MAP-OUTPUT granularity (tools/skew_probe.py finding), so the
    # corpus itself can never trip the rule; model a real multi-task
    # scan (32 maps) with an incompressible pad and a hot key, as
    # skew_probe does, and capture the executed plan with the rewrite.
    from pyspark.sql import functions as F
    from asakusafw_spark_spark.operators import master_join

    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    try:
        li = spark.read.parquet(f"{skew_dir}/lineitem.parquet").select(
            "l_orderkey").repartition(32)
        pad = F.concat(*[
            F.md5(F.concat(F.col("l_orderkey").cast("string"), F.lit(str(i))))
            for i in range(6)
        ])
        skewed = li.withColumn(
            "k",
            F.when(F.col("l_orderkey") % 10 == 0, F.lit(0)).otherwise(
                F.col("l_orderkey")),
        ).withColumn("pad", pad)
        masters = spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("payload"))
        out = master_join(
            masters, skewed, ["k"], strategy="shuffled", unique_master=True
        )["joined"]
        probe = out.agg(F.sum(F.length("pad")).alias("pad_bytes"))
        probe.collect()
        plan = probe._jdf.queryExecution().executedPlan().toString()
        pfile = os.path.join(PLANS, "master_join_shuffled_skewfire.txt")
        with open(pfile, "w") as f:
            f.write(plan)
        results.append({
            "query": "master_join_shuffled_skewfire",
            "tag": "scaled+32maps",
            "skew_rewrite_fired": "skew=true" in plan,
            "plan_file": os.path.relpath(pfile, REPO),
        })
    finally:
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    print(json.dumps({"skew_dir": skew_dir, "results": results}, indent=1))


if __name__ == "__main__":
    main()
