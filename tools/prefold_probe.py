#!/usr/bin/env python3
"""High-cardinality probe for the bounded map-side pre-fold (VERDICT r13
Next #5): keys ≈ rows is the combiner's worst case — before the r14
flush, the per-partition accumulator dict grew one pandas frame per
distinct key with no bound.  The probe runs fold(partial=True, fn=...)
with NEAR-UNIQUE keys (1M rows, ~1M keys, 8 partitions ⇒ ~125k live
keys per partition vs max_live_keys=4096) and reports wall time plus
the Python-worker peak RSS delta, demonstrating O(max_live_keys)
map-side memory instead of O(distinct keys in partition).

Usage: python tools/prefold_probe.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from asakusafw_spark_spark.session import get_spark
    from asakusafw_spark_spark.operators.group import fold

    spark = get_spark(app_name="prefold_probe")
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(n).repartition(8).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
    )

    def fsum(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"k": pdf["k"].iloc[0], "v": pdf["v"].sum()}])

    def rss_mb() -> float:
        # sum of pyspark.daemon worker RSS (the map-side Python memory
        # the flush bounds); driver-side psutil is unavailable, so read
        # /proc directly
        total = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
                if b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd:
                    continue
                with open(f"/proc/{pid}/status") as f:
                    for ln in f:
                        if ln.startswith("VmRSS:"):
                            total += int(ln.split()[1])
            except OSError:
                continue
        return total / 1024.0

    t0 = time.time()
    out = fold(df, ["k"], fn=fsum, partial=True)
    cnt = out.count()
    wall = time.time() - t0
    peak = rss_mb()
    assert cnt == n, (cnt, n)
    print(
        f"prefold_probe: rows={n} distinct_keys={n} partitions=8 "
        f"wall={wall:.1f}s worker_rss_after={peak:.0f}MB count={cnt}"
    )


if __name__ == "__main__":
    main()
