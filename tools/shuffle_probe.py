#!/usr/bin/env python3
"""Shuffle-byte accounting per headline query — the scale-faithful
metric wall-clock can't give at sf0.1 (where every query is
noise-bound): bytes that cross a shuffle boundary grow with data and
become THE cost at 100 TB, so a query that scans 50 MB but shuffles
2 KB has a fundamentally different scale story than one that shuffles
its whole input.

For each bench HEADLINE query: run once to warm caches, then run again
and diff the cumulative stage totals (input bytes, shuffle write bytes)
from the Spark UI REST API.  Emits a markdown table; pipe into
BASELINE.md.

Run: python tools/shuffle_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def totals(url: str, app: str) -> tuple[int, int]:
    data = json.load(
        urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages")
    )
    return (
        sum(s.get("inputBytes", 0) for s in data),
        sum(s.get("shuffleWriteBytes", 0) for s in data),
    )


def main() -> None:
    from asakusafw_spark_spark.session import engine_builder
    from bench import HEADLINE
    import __spark_entry__ as E

    spark = (
        engine_builder(
            app_name="shuffle_probe",
            extra_conf={
                "spark.ui.enabled": "true",
                # keep every stage in the status store for the whole run
                "spark.ui.retainedStages": "100000",
            },
        ).getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    qs = E.queries()
    print("| query | input | shuffled | shuffled/input |")
    print("|---|---|---|---|")
    rows = []
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, SF).write.format("noop").mode("overwrite").save()  # warm
        i0, w0 = totals(url, app)
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        i1, w1 = totals(url, app)
        inp, shuf = i1 - i0, w1 - w0
        ratio = (shuf / inp) if inp else float("nan")
        rows.append((name, inp, shuf, ratio))
        print(
            f"| {name} | {inp/1e6:.1f} MB | {shuf/1e6:.2f} MB | {ratio:.3f} |"
        )
    heavy = sorted(rows, key=lambda r: -r[2])[:5]
    print("\nTop shuffled:", ", ".join(f"{n} ({s/1e6:.1f} MB)" for n, _, s, _ in heavy))


if __name__ == "__main__":
    main()
