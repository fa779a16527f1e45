#!/usr/bin/env python3
"""10x scale-shape probe for the graph family (VERDICT r09 Next #6):
pagerank (3 iterations), bfs_levels (to fixpoint), triangle_count.

The contract under test: per-round cost is ~linear in |E| (pagerank,
bfs) and O(sum of wedges) ~ linear for a bounded-degree graph
(triangle_count's degree-oriented join).  The fixed-point CORRECTNESS
contracts are already oracle-verified every round; this probe pins the
SCALE story the same way the dedup/streaming families did: run each op
on a 1x and a 10x synthetic edge set (same average degree, same
diameter class) and record the wall-clock ratio.  ~10x or less = the
claimed linearity; results belong in BASELINE.md.

Graph shape: node i links to (i*17+1)%N, (i*31+7)%N, ... (fixed
out-degree D=8, LCG-spread destinations → bounded in-degree, no
superhubs), plus a planted ring so BFS has a connected spine, plus
planted triangles (i, i+1, i+2 closures every 100 nodes) so
triangle_count sees real signal at both scales.

Run: python tools/scale_probe_graph.py   (quiet machine; ~5 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

D = 8  # out-degree


def build_edges(spark, n_nodes: int):
    """Deterministic bounded-degree directed edge frame (~n_nodes*D)."""
    muls = [17, 31, 53, 71, 97, 113, 131, 151][:D]
    base = spark.range(n_nodes)
    parts = [
        base.select(
            F.col("id").alias("src"),
            ((F.col("id") * m + 7) % n_nodes).alias("dst"),
        )
        for m in muls
    ]
    ring = base.select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n_nodes).alias("dst")
    )
    tri = (
        base.filter(F.col("id") % 100 == 0)
        .select(F.col("id").alias("src"), (F.col("id") + 2).alias("dst"))
        .filter(F.col("dst") < n_nodes)
    )
    edges = parts[0]
    for p in parts[1:] + [ring, tri]:
        edges = edges.union(p)
    return edges.filter(F.col("src") != F.col("dst"))


def main() -> int:
    from asakusafw_spark_spark.functions.graph import (
        bfs_levels,
        pagerank,
        triangle_count,
    )
    from asakusafw_spark_spark.session import engine_builder

    spark = engine_builder(app_name="graph_probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {}
    for scale, n in [("1x", 20_000), ("10x", 200_000)]:
        path = f"/tmp/graph_probe_edges_{n}"
        if not os.path.exists(path):
            build_edges(spark, n).write.mode("overwrite").parquet(path)
        edges = spark.read.parquet(path)
        n_edges = edges.count()

        t0 = time.time()
        pr = pagerank(edges, iterations=3)
        n_pr = pr.count()
        t_pr = time.time() - t0

        srcs = spark.range(1).select(F.lit(0).cast("long").alias("node"))
        t0 = time.time()
        bfs = bfs_levels(edges, srcs, max_iters=30)
        n_bfs = bfs.count()
        t_bfs = time.time() - t0

        t0 = time.time()
        tc = triangle_count(edges)
        n_tri = tc.first()[0]
        t_tri = time.time() - t0

        results[scale] = {
            "nodes": n, "edges": n_edges,
            "pagerank_s": round(t_pr, 2), "pagerank_rows": n_pr,
            "bfs_s": round(t_bfs, 2), "bfs_rows": n_bfs,
            "triangle_s": round(t_tri, 2), "triangles": n_tri,
        }
        print(scale, results[scale])

    r1, r10 = results["1x"], results["10x"]
    ratios = {
        "edges_ratio": round(r10["edges"] / r1["edges"], 2),
        "pagerank_ratio": round(r10["pagerank_s"] / r1["pagerank_s"], 2),
        "bfs_ratio": round(r10["bfs_s"] / r1["bfs_s"], 2),
        "triangle_ratio": round(r10["triangle_s"] / r1["triangle_s"], 2),
    }
    print(json.dumps({"results": results, "ratios": ratios}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
