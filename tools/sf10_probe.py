#!/usr/bin/env python3
"""sf10 noop-sink probe of the heaviest engine rows (VERDICT r15 #7).

The 100-TB claim rests on cost models: candidate-pair generation,
connected-components rounds, and BFS frontiers are the queries whose
cost is super-linear-RISK — a hidden n² term is invisible at sf1 and
fatal at cluster scale.  This probe adds one more decade on exactly
those rows: synthesize sf10-scale inputs (×10 the sf1 synth —
500k documents / 200k embeddings / 60M lineitem, deterministic
mod-arithmetic distributions so dup/near-dup structure scales with the
corpus), run each heavy query ONCE, cold, engine-side only (noop sink,
no oracle twin, no result hashing), and record wall-clock + the scan /
shuffle bytes the run put through the DAG (Spark UI REST stage
totals, diffed per query).

Only the tables the probe queries read are generated; they are written
as parquet DIRECTORIES (parallel write — the chaos-layout gate already
proves directory reads are contract-clean).

Usage: python tools/sf10_probe.py [out.json]   # default SCALING_sf10.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF10_DIR = "/tmp/spark_graft_sf10_synth"

#: heaviest engine rows by the sf1 sweep (LOCAL_VERIFY_sf1.json),
#: filtered to engine-side cost (zorder/winsorize rows are proven
#: harness/write-bound): dedup family, graph, composite pipeline,
#: embedding CC.
QUERIES = [
    "dedup_edit_distance",
    "training_pipeline",
    "embedding_dup_clusters",
    "embedding_dup_clusters_scaled",
    "triangle_count",
    "url_canonical_dedup",
    "dedup_incremental",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh",
    "dedup_corpus_best",
]


def _custom_queries():
    """Scale-path variants the registered (oracle-pinned) queries can't
    express: the registered embedding near-dup family pins planes=2 —
    right for the near-orthogonal oracle corpora, quadratic at 200k
    vectors (the probe's first run measured a 4-task ~5e9-pair join
    that never finishes; now the max_bucket cap drops the 4 mega-
    buckets observably).  The SCALE path sizes planes to the corpus —
    the cosine_near_dup docstring contract (2^planes ≈ n / low-
    thousands) as code, so the probe measures the knob USED CORRECTLY:
    candidate pairs ≈ n × bucket/2 grow LINEARLY in n at constant
    bucket size (planes pinned across scales would re-measure the
    documented n²/2^planes quadratic instead).  sf1 20k → planes=4
    (16 × ~1.25k); sf10 200k → planes=7 (128 × ~1.6k)."""
    import math

    from asakusafw_spark_spark.functions import cosine_near_dup, dup_clusters
    from asakusafw_spark_spark.sources import read_parquet

    TARGET_BUCKET = 1_500

    def scaled_clusters(spark, sf):
        emb = read_parquet(spark, f"{sf}/embeddings.parquet")
        n = emb.count()  # one cheap count-star scan, probe-only
        planes = max(1, round(math.log2(max(n, 2) / TARGET_BUCKET)))
        print(f"  [scaled_clusters: n={n} -> planes={planes}]", flush=True)
        pairs = cosine_near_dup(emb, threshold=0.45, planes=planes)
        return dup_clusters(pairs, nodes=emb.select("vec_id"),
                            node_col="vec_id")

    return {"embedding_dup_clusters_scaled": scaled_clusters}

TABLES_NEEDED = {"documents", "embeddings", "lineitem"}


def stage_totals(url: str, app: str) -> "tuple[int, int, int]":
    data = json.load(
        urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages")
    )
    return (
        sum(s.get("inputBytes", 0) for s in data),
        sum(s.get("shuffleWriteBytes", 0) for s in data),
        sum(s.get("shuffleReadBytes", 0) for s in data),
    )


def main() -> int:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALING_sf10.json"
    global SF10_DIR
    if len(sys.argv) > 2:
        # comparison mode: same probe, another corpus (e.g. the sf1
        # synth) so per-row growth factors are engine-side and
        # like-for-like (the sweep artifacts include oracle+hash
        # harness time and can't be ratioed against noop runs)
        SF10_DIR = sys.argv[2]

    import tools.sf1_partsupp_check as G
    from asakusafw_spark_spark.session import engine_builder
    import __spark_entry__ as E

    # ×10 the sf1 synth constants (lineitem formula keeps P/S coupled)
    G.P, G.S, G.O, G.L, G.C = 2_000_000, 100_000, 15_000_000, 60_000_000, 1_500_000
    G.EV, G.DOCS, G.USERS = 10_000_000, 500_000, 150_000
    G.EMB = 200_000

    spark = engine_builder(
        app_name="sf10_probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{SF10_DIR}/documents.parquet"):
        print(f"generating sf10-scale tables under {SF10_DIR} ...", flush=True)
        os.makedirs(SF10_DIR, exist_ok=True)
        t0 = time.time()
        G.generate(spark, out_dir=SF10_DIR, only=TABLES_NEEDED,
                   coalesce=False)
        print(f"  generated in {time.time() - t0:.0f}s", flush=True)
    else:
        print(f"reusing {SF10_DIR}", flush=True)

    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    qs = E.queries()
    qs.update(_custom_queries())

    from asakusafw_spark_spark.functions.dedup import (
        release_cached_intermediates,
    )

    table: dict = {}
    for name in QUERIES:
        before = stage_totals(url, app)
        t0 = time.time()
        err = None
        try:
            qs[name](spark, SF10_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # record, keep probing
            err = f"{type(e).__name__}: {str(e)[:300]}"
        dt = round(time.time() - t0, 1)
        after = stage_totals(url, app)
        row = {
            "sec": dt,
            "input_mb": round((after[0] - before[0]) / 1e6, 1),
            "shuffle_write_mb": round((after[1] - before[1]) / 1e6, 1),
            "shuffle_read_mb": round((after[2] - before[2]) / 1e6, 1),
            "err": err,
        }
        release_cached_intermediates()
        table[name] = row
        print(f"{name:28s} {dt:8.1f}s  in={row['input_mb']:9.1f}MB  "
              f"shW={row['shuffle_write_mb']:9.1f}MB"
              f"{'  ERR ' + err if err else ''}", flush=True)

    json.dump({"sf_dir": SF10_DIR, "queries": table},
              open(out_json, "w"), indent=1)
    print(f"report written: {out_json}")
    return 1 if any(r["err"] for r in table.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
