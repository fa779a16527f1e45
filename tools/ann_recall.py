#!/usr/bin/env python3
"""ANN quality harness: recall@k of the approximate vector-search paths
(LSH sign-buckets, IVF inverted lists) against the exact brute-force
baseline — the accuracy half of the speed/accuracy trade-off the scale
paths make.  Numbers are recorded in BASELINE.md.

Usage: python tools/ann_recall.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asakusafw_spark_spark.session import get_spark  # noqa: E402
from asakusafw_spark_spark.functions import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    lsh_ann_topk,
)

from pyspark.sql import functions as F  # noqa: E402


def truth_sets(df):
    out: dict = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall(approx: dict, exact: dict) -> float:
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    return hits / total if total else 1.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="ann_recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 50)

    exact = truth_sets(brute_force_topk(emb, queries, k=k))
    print(f"corpus={emb.count()} queries={len(exact)} k={k}")
    for planes, tables in ((4, 1), (6, 1), (8, 1), (8, 4), (8, 8), (6, 4)):
        a = truth_sets(
            lsh_ann_topk(emb, queries, k=k, planes=planes, num_tables=tables)
        )
        print(f"lsh planes={planes} tables={tables}: recall@{k} = {recall(a, exact):.3f}")
    # quantizers pinned explicitly — the function DEFAULT is
    # kmeans @ nprobe=4 (the measured recall story), so the ids rows
    # here must ask for "ids" to keep the comparison honest
    for n_c, nprobe in ((8, 1), (8, 2), (8, 4), (16, 4)):
        a = truth_sets(
            ivf_topk(emb, queries, k=k, n_centroids=n_c, nprobe=nprobe, quantizer="ids")
        )
        print(f"ivf-ids n_centroids={n_c} nprobe={nprobe}: recall@{k} = {recall(a, exact):.3f}")
    # recall/cost frontier (VERDICT r08 Next #7): cost = fraction of
    # the corpus each query scores = nprobe / n_centroids; production
    # ANN targets ~0.9 recall — find the cheapest row that clears it
    for n_c, nprobe in (
        (8, 1), (8, 2), (8, 4), (16, 4),
        (16, 8), (32, 8), (32, 16), (64, 16),
    ):
        a = truth_sets(
            ivf_topk(emb, queries, k=k, n_centroids=n_c, nprobe=nprobe, quantizer="kmeans")
        )
        print(
            f"ivf-kmeans n_centroids={n_c} nprobe={nprobe}: recall@{k} = "
            f"{recall(a, exact):.3f}  (cost {nprobe / n_c:.2f} corpus)"
        )
    a = truth_sets(ivf_topk(emb, queries, k=k))
    print(f"ivf DEFAULTS (kmeans, 8 lists, nprobe 4): recall@{k} = {recall(a, exact):.3f}")
    # two-stage: int8 probe (4x smaller bytes) + exact float re-rank of
    # the top 3k candidates — recall loss vs float probing should vanish
    for n_c, nprobe in ((16, 8), (32, 8)):
        a = truth_sets(
            ivf_topk(emb, queries, k=k, n_centroids=n_c, nprobe=nprobe,
                     quantizer="kmeans", quantized=True, rerank=3)
        )
        print(
            f"ivf-kmeans+int8+rerank3 n_centroids={n_c} nprobe={nprobe}: "
            f"recall@{k} = {recall(a, exact):.3f}  (cost {nprobe / n_c:.2f} "
            "corpus at int8 bytes)"
        )

    # int8-quantized exact scan: the 4×-smaller-bytes path — recall loss
    # here is pure quantization error, not candidate pruning
    from asakusafw_spark_spark.functions import quantized_topk

    a = truth_sets(quantized_topk(emb, queries, k=k))
    print(f"int8 quantized brute-force: recall@{k} = {recall(a, exact):.3f}")


if __name__ == "__main__":
    main()
