#!/usr/bin/env python3
"""Skew probe (VERDICT r01 #10): a hot key owning ~10% of all rows,
driven through (a) the shuffled sort-merge master_join — AQE
OptimizeSkewedJoin territory — and (b) the pinned-partition streaming
cogroup, where AQE skew handling is intentionally defeated by the explicit
repartition that keeps Python stages at cluster width.

Findings this probe encodes (see BASELINE.md "Skew probe"):

- AQE splits a skewed partition at MAP-OUTPUT granularity.  A small-file
  scan is ONE map task, so there is nothing to split and the rule
  correctly reports zero skewed partitions regardless of thresholds —
  the probe pre-repartitions to 32 maps to model a real multi-task scan
  (a 100 TB scan has thousands).
- Skew detection reads COMPRESSED shuffle sizes; compressible padding
  (repeated chars) never trips the threshold.  The probe pads with md5
  hex to keep bytes honest.
- Plan inspection must run on the SAME QueryExecution that executed
  (``df.collect()``); ``df.write`` plans a separate command and shows
  ``isFinalPlan=false`` with no AQE rewrites.

Usage: python tools/skew_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asakusafw_spark_spark.session import get_spark  # noqa: E402
from asakusafw_spark_spark.operators import Grouping, cogroup, master_join  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def timed_collect(df) -> tuple[float, int, str]:
    t0 = time.perf_counter()
    n = len(df.collect())
    dt = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    return dt, n, plan


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="skew_probe")
    # scale AQE's skew thresholds DOWN to the probe's data size (sf0.1's hot
    # partition is tens of MB — real clusters hit the default 256 MB): the
    # claim under test is that the shuffled-join plan SHAPE is skew-eligible
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")

    # 32 map tasks (models a real multi-file scan) + incompressible payload
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey").repartition(32)
    pad = F.concat(
        *[F.md5(F.concat(F.col("l_orderkey").cast("string"), F.lit(str(i)))) for i in range(6)]
    )
    skew_key = F.when(F.col("l_orderkey") % 10 == 0, F.lit(0)).otherwise(F.col("l_orderkey"))
    skewed = li.withColumn("k", skew_key).withColumn("pad", pad)
    uniform = li.withColumn("k", F.col("l_orderkey")).withColumn("pad", pad)
    masters = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("payload")
    )

    # warm-up
    master_join(masters, uniform, ["k"], strategy="shuffled")["joined"].count()

    # -- (a) shuffled sort-merge join with a hot tx key.  Measured on
    #    Spark 4.1: OptimizeSkewedJoin splits the hot partition in BOTH
    #    variants (earlier Sparks required both SMJ children to be bare
    #    ENSURE_REQUIREMENTS shuffles, which the min_by master
    #    pre-reduction violated); unique_master=True still wins wall-clock
    #    by skipping the aggregate entirely.  The probe aggregate KEEPS
    #    `pad` flowing through the join: projecting it away lets column
    #    pruning shrink the shuffle below the skew threshold and nothing
    #    trips (found the hard way).
    for um in (False, True):
        for label, tx in [("uniform", uniform), ("skewed ", skewed)]:
            out = master_join(
                masters, tx, ["k"], strategy="shuffled", unique_master=um
            )["joined"]
            probe = out.agg(F.sum(F.length("pad")).alias("pad_bytes"))
            t0 = time.perf_counter()
            padb = probe.collect()[0][0]
            dt = time.perf_counter() - t0
            plan = probe._jdf.queryExecution().executedPlan().toString()
            print(
                f"join    {label} unique_master={um!s:5}: {dt:6.2f}s "
                f"pad_bytes={padb} skew_rewrite={'skew=true' in plan}"
            )

    # -- (b) pinned-partition streaming cogroup — the hot group rides ONE
    #    task, but Python cost is per-BATCH, so one 60k-row group is CHEAPER
    #    than 6k small groups; the skew risk here is carry-buffer MEMORY,
    #    bounded by fold(partial=True) / cogroup(max_buffered_rows=...)
    def fn(key, pdf: pd.DataFrame) -> dict:
        return {"k": int(key[0]), "n": len(pdf)}

    for label, src in [("uniform", uniform), ("skewed ", skewed)]:
        g = src.select("k")
        out = cogroup([Grouping(g, ["k"])], fn, "k long, n long")
        dt, n, _ = timed_collect(out)
        print(f"cogroup {label}: {dt:6.2f}s groups={n}")

    # -- (c) where-path candidate blowup (VERDICT r04 Next #6): a hot key
    #    whose master group holds V versions multiplies that key's tx rows
    #    V× in the candidate LEFT-join BEFORE the per-tx min_by reduction,
    #    and the master side is broadcast — AQE never sees a shuffle to
    #    split.  Defences measured: max_candidates=8 (bounds the blowup at
    #    8×; exact here because every trade is newer than the 8 latest
    #    quotes) and scatter_tx (exact, spreads CLUSTERED hot tx rows).
    from asakusafw_spark_spark.operators import MasterSelection

    n_tx = 600_000
    hot_versions = 2_000
    trades = (
        spark.range(n_tx)
        .select(
            F.when(F.col("id") % 10 == 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("sym"),
            (F.lit(10_000_000) + F.col("id")).alias("tts"),
        )
        # cluster the hot rows into few input partitions (worst case)
        .repartition(32, "sym")
    )
    quotes = spark.createDataFrame(
        [(0, t) for t in range(hot_versions)]
        + [(s, t) for s in range(1, 1000) for t in range(8)],
        "sym long, qts long",
    ).select("sym", "qts", (F.col("qts") % 97).alias("px"))

    for label, sel in [
        ("baseline     ", MasterSelection(
            ordering=[("qts", "desc")], where=F.col("__m_qts") <= F.col("tts"))),
        ("max_cand=8   ", MasterSelection(
            ordering=[("qts", "desc")], where=F.col("__m_qts") <= F.col("tts"),
            max_candidates=8)),
        ("scatter_tx   ", MasterSelection(
            ordering=[("qts", "desc")], where=F.col("__m_qts") <= F.col("tts"),
            scatter_tx=True)),
    ]:
        out = master_join(quotes, trades, ["sym"], selection=sel,
                          strategy="broadcast")["joined"]
        probe = out.agg(F.count(F.lit(1)).alias("n"), F.sum("px").alias("s"))
        t0 = time.perf_counter()
        row = probe.collect()[0]
        dt = time.perf_counter() - t0
        print(f"where-path {label}: {dt:6.2f}s rows={row['n']} sum_px={row['s']}")


if __name__ == "__main__":
    main()
