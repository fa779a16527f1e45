#!/usr/bin/env python3
"""q8/q21 AQE broadcast-build serialization probe (VERDICT r16 item 7).

Hypothesis: q8's ~19 sequential jobs are AQE materializing each
broadcast query stage one dependency level at a time; the guide §2.6
thread-pool suggestion cannot apply inside ONE action, but non-AQE
planning materializes ALL broadcast exchanges through a shared daemon
thread pool when the root executes — maximal overlap of the
independent dimension chains.  So AQE ON vs OFF bounds what overlap
could buy.  Interleaved in one JVM; job counts from the status
tracker.

Usage: python tools/q8_probe.py [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from asakusafw_spark_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="q8_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for w in ("flagship_revenue_per_nation", "q8_market_share",
              "q21_waiting_suppliers"):
        qs[w](spark, args.sf).write.format("noop").mode("overwrite").save()

    out: dict = {"what": "q8/q21 AQE on/off broadcast-overlap probe",
                 "sf": args.sf, "queries": {}}
    for name in ("q8_market_share", "q21_waiting_suppliers"):
        rec: dict = {}
        for arm in ("aqe_on", "aqe_off"):
            rec[arm] = {"times": [], "jobs": []}
        for i in range(args.runs):
            order = ("aqe_on", "aqe_off") if i % 2 == 0 else ("aqe_off", "aqe_on")
            for arm in order:
                spark.conf.set("spark.sql.adaptive.enabled",
                               "true" if arm == "aqe_on" else "false")
                group = f"q8probe_{name}_{arm}_{i}"
                sc.setJobGroup(group, name)
                t0 = time.perf_counter()
                qs[name](spark, args.sf).write.format("noop").mode(
                    "overwrite").save()
                dt = round(time.perf_counter() - t0, 3)
                sc.setLocalProperty("spark.jobGroup.id", None)
                rec[arm]["times"].append(dt)
                rec[arm]["jobs"].append(len(tracker.getJobIdsForGroup(group)))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for arm in rec:
            ts = sorted(rec[arm]["times"])
            rec[arm]["min"] = ts[0]
            rec[arm]["med"] = ts[len(ts) // 2]
        out["queries"][name] = rec
    print(json.dumps(out))


if __name__ == "__main__":
    main()
