#!/usr/bin/env python3
"""10x scale-shape probe for the round-7 operators (same protocol as
scale_probe.py: union sf0.1 inputs 10x with DISJOINT id spaces so
distinct counts scale 10x too, compare wall-clock 1x vs 10x).

Run: python tools/scale_probe_r07.py   (results belong in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def inflate(df, id_cols, copies=10, stride=10_000_000):
    parts = []
    for c in range(copies):
        p = df
        for col in id_cols:
            p = p.withColumn(col, F.col(col) + F.lit(c * stride))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f}s  (result rows={n})")
    return dt


def main():
    from asakusafw_spark_spark.session import get_spark
    from asakusafw_spark_spark.functions import (
        audience_overlap,
        distinct_sketch_rollup,
        heavy_hitters,
        merge_distinct_sketches,
        sample_exact_n,
        suppress_rare_groups,
    )

    spark = get_spark(app_name="scale_probe_r07")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    ev.count(); cust.count()  # first-touch out of the numbers
    ev10 = inflate(ev, ["event_id", "user_id"])
    cust10 = inflate(cust, ["c_custkey", "c_nationkey"])

    # heavy_hitters: 10x rows AND 10x distinct keys (shuffle rows 10x).
    # Per-key counts are unchanged under disjoint-key inflation while the
    # total grows 10x, so the share threshold scales down 10x to keep the
    # SAME survivor set per copy (10x output rows = the honest shape).
    t1 = timed("heavy_hitters 1x", lambda: heavy_hitters(
        ev, "user_id", min_count=2, min_share=0.0008).count())
    t10 = timed("heavy_hitters 10x", lambda: heavy_hitters(
        ev10, "user_id", min_count=2, min_share=0.00008).count())
    print(f"  ratio {t10 / t1:.2f}x for 10x rows+keys\n")

    # suppress_rare_groups: 10x rows, 10x quasi combos (window shuffle 10x)
    t1 = timed("suppress_rare_groups 1x", lambda: suppress_rare_groups(
        cust, ["c_nationkey", "c_mktsegment"], k=10).count())
    t10 = timed("suppress_rare_groups 10x", lambda: suppress_rare_groups(
        cust10, ["c_nationkey", "c_mktsegment"], k=10).count())
    print(f"  ratio {t10 / t1:.2f}x for 10x rows+combos\n")

    # audience_overlap: 10x rows and 10x per-group distincts; 5 groups,
    # 10 sketch pairs either way — only the scan should grow
    t1 = timed("audience_overlap 1x", lambda: audience_overlap(
        ev, "event_type", "user_id").count())
    t10 = timed("audience_overlap 10x", lambda: audience_overlap(
        ev10, "event_type", "user_id").count())
    print(f"  ratio {t10 / t1:.2f}x for 10x rows (pair count constant)\n")

    # HLL rollup + merge at 10x groups x 10x distincts per... (day grain)
    evd = spark.read.parquet(f"{SF}/events.parquet").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    evd10 = inflate(evd, ["user_id"])
    t1 = timed("hll rollup+merge 1x", lambda: merge_distinct_sketches(
        distinct_sketch_rollup(evd, "day", "user_id")).count())
    t10 = timed("hll rollup+merge 10x", lambda: merge_distinct_sketches(
        distinct_sketch_rollup(evd10, "day", "user_id")).count())
    print(f"  ratio {t10 / t1:.2f}x for 10x rows+distincts\n")

    # sample_exact_n: TakeOrdered at 10x rows (per-task heap, driver
    # merge of n x partitions candidates)
    t1 = timed("sample_exact_n 1x", lambda: sample_exact_n(
        ev, 1000, "event_id").count())
    t10 = timed("sample_exact_n 10x", lambda: sample_exact_n(
        ev10, 1000, "event_id").count())
    print(f"  ratio {t10 / t1:.2f}x for 10x rows, fixed n\n")


if __name__ == "__main__":
    main()
