#!/usr/bin/env python3
"""Per-query optimization profiler (guide §1: measure first).

For each named query: builds the frame, dumps ``explain("formatted")``
to ``plans/r16/<query>_<tag>.txt``, times N noop-sink runs (same timed
region as bench.py: build + noop write), and counts the Spark jobs /
stages / tasks each run launched via the status tracker (job-group
scoped).  Output: one JSON line per query on stdout.

Usage:
  python tools/qprof.py [--tag before|after] [--runs N] [--sf DIR] \
      [--no-plan] q1 q2 ...          # explicit queries
  python tools/qprof.py --heavy      # the >=1.0s bench rows from r15
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "dedup_clusters", "cogroup", "analyze_table", "dedup_incremental",
    "iterative_transactional_output", "zorder_roundtrip", "dedup_minhash_lsh",
    "flagship_revenue_per_nation", "url_canonical_dedup", "winsorize",
    "q5_local_supplier_volume", "lm_score", "q8_market_share",
    "quantize_embeddings", "summarize_q1", "streaming_theta_maintain",
    "dedup_ngram_jaccard", "dedup_edit_distance", "dedup_simhash_pairs",
    "scrub_spans", "streaming_windowed_agg", "q21_waiting_suppliers",
    "q18_large_volume_customer", "q7_volume_shipping",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--heavy", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--plans-dir", default=None)
    args = ap.parse_args()

    names = list(args.queries)
    if args.heavy:
        names = HEAVY + [n for n in names if n not in HEAVY]
    if not names:
        ap.error("no queries given")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = args.plans_dir or os.path.join(here, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    from asakusafw_spark_spark.plans import plan_summary
    from asakusafw_spark_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="qprof")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    sc = spark.sparkContext

    # warm-up: same three families bench.py touches
    for w in ("flagship_revenue_per_nation", "dedup_exact",
              "similarity_bruteforce_topk"):
        qs[w](spark, args.sf).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()
    for name in names:
        fn = qs[name]
        rec: dict = {"query": name, "tag": args.tag}
        times, builds, jobs, stages, tasks = [], [], [], [], []
        for i in range(args.runs):
            group = f"qprof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            # clear via the local properties (ADVICE r16): setJobGroup's
            # params are str-typed — None rides through py4j today but is
            # not a supported clear and may break on a PySpark upgrade
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
            ids = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for jid in ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0:
                        n_stages += 1
                        n_tasks += si.numTasks
            times.append(round(t2 - t0, 3))
            builds.append(round(t1 - t0, 3))
            jobs.append(len(ids))
            stages.append(n_stages)
            tasks.append(n_tasks)
            if i == 0 and not args.no_plan:
                try:
                    summ = plan_summary(df)
                    rec["plan"] = {k: v for k, v in summ.items() if k != "plan"}
                    with open(os.path.join(plans_dir,
                                           f"{name}_{args.tag}.txt"), "w") as f:
                        f.write(summ["plan"])
                except Exception as e:  # streaming frames etc.
                    rec["plan_err"] = str(e)[:200]
        rec.update(
            best=min(times), times=times, build=builds,
            jobs=jobs, stages=stages, tasks=tasks,
        )
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
