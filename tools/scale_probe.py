#!/usr/bin/env python3
"""10x scale-shape probe for the round-2 operators.

Unions sf0.1 inputs 10x with DISJOINT id spaces, so group/cluster counts
scale 10x too (the honest shape: no artificial key collapse), and compares
wall-clock against the 1x run. Linear-ish growth = the partition strategy
holds; superlinear = a shuffle or driver bottleneck is hiding.

Run: python tools/scale_probe.py   (results belong in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def inflate(df, id_cols, copies=10, stride=10_000_000):
    """copies x union with ids offset per copy — disjoint key spaces."""
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
    from asakusafw_spark_spark.functions import dup_clusters, minhash_lsh_pairs
    from asakusafw_spark_spark.operators import Grouping, cogroup

    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )

    def clusters(d):
        pairs = minhash_lsh_pairs(d, threshold=0.5)
        return dup_clusters(pairs, nodes=d.select("doc_id"), node_col="doc_id").count()

    t1 = timed("dup_clusters 1x (5k docs)", lambda: clusters(docs))
    docs10 = inflate(docs, ["doc_id"]).persist()
    docs10.count()
    t10 = timed("dup_clusters 10x (50k docs, disjoint ids)", lambda: clusters(docs10))
    print(f"dup_clusters growth: {t10 / t1:.1f}x for 10x docs")
    docs10.unpersist()

    def chunked_count(o, l):
        def fn(key, chunks):
            n = 0
            mx = None
            for i, df in chunks:
                if i == 1:
                    n += len(df)
                    m = df["l_quantity"].max()
                    if m is not None and (mx is None or m > mx):
                        mx = float(m)
            return {"k": key[0], "n": n, "mx": mx}

        return cogroup(
            [
                Grouping(o, ["o_orderkey"]),
                Grouping(l, ["l_orderkey"], [("l_linenumber", "asc")]),
            ],
            fn,
            "k long, n long, mx double",
            chunked=True,
        ).count()

    t1 = timed("cogroup_chunked 1x (150k groups)", lambda: chunked_count(orders, li))
    o10 = inflate(orders, ["o_orderkey"]).persist()
    l10 = inflate(li, ["l_orderkey"]).persist()
    o10.count(); l10.count()
    t10 = timed(
        "cogroup_chunked 10x (1.5M groups, 6M rows)", lambda: chunked_count(o10, l10)
    )
    print(f"cogroup_chunked growth: {t10 / t1:.1f}x for 10x groups+rows")
    o10.unpersist(); l10.unpersist()

    # round-4 ops ------------------------------------------------------
    from asakusafw_spark_spark.functions import chunk_documents

    def chunks(d):
        return chunk_documents(d, chunk_tokens=40, overlap=8).count()

    t1 = timed("chunk_documents 1x (5k docs)", lambda: chunks(docs))
    docs10b = inflate(docs, ["doc_id"]).persist()
    docs10b.count()
    t10 = timed("chunk_documents 10x (50k docs)", lambda: chunks(docs10b))
    print(f"chunk_documents growth: {t10 / t1:.1f}x for 10x docs")
    docs10b.unpersist()

    # merge_upsert: cost should track TOUCHED partitions, not dataset size
    import shutil
    import tempfile

    from asakusafw_spark_spark.sources.write import merge_upsert

    base_dir = tempfile.mkdtemp(prefix="merge_scale_")
    target = f"{base_dir}/orders"
    part = orders.withColumn("bucket", (F.col("o_orderkey") % 100).cast("int"))
    merge_upsert(target, part, "o_orderkey", partition_by="bucket")
    upd_small = part.filter(F.col("bucket") == 7).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    upd_large = part.filter(F.col("bucket") < 50).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    t_one = timed(
        "merge_upsert 1/100 partitions touched",
        lambda: (merge_upsert(target, upd_small, "o_orderkey", partition_by="bucket"), 1)[1],
    )
    t_half = timed(
        "merge_upsert 50/100 partitions touched",
        lambda: (merge_upsert(target, upd_large, "o_orderkey", partition_by="bucket"), 50)[1],
    )
    print(f"merge_upsert growth: {t_half / t_one:.1f}x for 50x touched partitions")
    shutil.rmtree(base_dir, ignore_errors=True)

    # round-5 ops ------------------------------------------------------
    from asakusafw_spark_spark.functions import pack_sequences, tfidf

    def tfidf_count(d):
        return tfidf(d, min_df=2).count()

    t1 = timed("tfidf 1x (5k docs)", lambda: tfidf_count(docs))
    docs10c = inflate(docs, ["doc_id"]).persist()
    docs10c.count()
    t10 = timed("tfidf 10x (50k docs)", lambda: tfidf_count(docs10c))
    print(f"tfidf growth: {t10 / t1:.1f}x for 10x docs")

    def pack_count(d, shards):
        return pack_sequences(d, 512, by="source", shards=shards).count()

    t1 = timed("pack_sequences 1x (5k docs, 1 shard)", lambda: pack_count(docs, 1))
    t10 = timed(
        "pack_sequences 10x (50k docs, 1 shard — window sort grows 10x)",
        lambda: pack_count(docs10c, 1),
    )
    t10s = timed(
        "pack_sequences 10x sharded (50k docs, 8 shards — bounded sorts)",
        lambda: pack_count(docs10c, 8),
    )
    print(
        f"pack_sequences growth: {t10 / t1:.1f}x unsharded, "
        f"{t10s / t1:.1f}x with shards=8, for 10x docs"
    )
    docs10c.unpersist()

    # round-5 session-2 ops -------------------------------------------
    from asakusafw_spark_spark.functions import (
        build_dedup_index,
        dedup_against_corpus,
        scrub_duplicate_spans,
    )

    def scrub_count(d):
        return scrub_duplicate_spans(d, n=8).count()

    t1 = timed("scrub_spans 1x (5k docs)", lambda: scrub_count(docs))
    docs10d = inflate(docs, ["doc_id"]).persist()
    docs10d.count()
    t10 = timed("scrub_spans 10x (50k docs)", lambda: scrub_count(docs10d))
    print(f"scrub_spans growth: {t10 / t1:.1f}x for 10x docs")

    # incremental dedup: history grows 10x, the BATCH stays fixed —
    # per-batch cost must track the batch + candidate volume, not the
    # full history re-sign (the index amortizes that)
    batch = docs.withColumn("doc_id", F.col("doc_id") + F.lit(900_000_000))
    idx1 = build_dedup_index(docs).persist()
    idx1.count()
    t1 = timed(
        "dedup_incremental 1x history (5k) fixed batch (5k)",
        lambda: dedup_against_corpus(batch, index=idx1, threshold=0.5).count(),
    )
    idx10 = build_dedup_index(docs10d).persist()
    idx10.count()
    t10 = timed(
        "dedup_incremental 10x history (50k) fixed batch (5k)",
        lambda: dedup_against_corpus(batch, index=idx10, threshold=0.5).count(),
    )
    print(f"dedup_incremental growth: {t10 / t1:.1f}x for 10x history, fixed batch")
    idx1.unpersist(); idx10.unpersist(); docs10d.unpersist()

    # event analytics + retrieval -------------------------------------
    from asakusafw_spark_spark.functions import bm25_rank, funnel, retention

    ev = spark.read.parquet(f"{SF}/events.parquet").persist()
    ev.count()
    ev10 = inflate(ev, ["event_id", "user_id"]).persist()
    ev10.count()
    t1 = timed("funnel 1x", lambda: funnel(ev, ["view", "click", "purchase"]).count())
    t10 = timed(
        "funnel 10x (10x events+users)",
        lambda: funnel(ev10, ["view", "click", "purchase"]).count(),
    )
    print(f"funnel growth: {t10 / t1:.1f}x for 10x events+users")
    t1 = timed("retention 1x", lambda: retention(ev, periods=14, period="day").count())
    t10 = timed(
        "retention 10x", lambda: retention(ev10, periods=14, period="day").count()
    )
    print(f"retention growth: {t10 / t1:.1f}x for 10x events+users")
    docs10e = inflate(docs, ["doc_id"]).persist()
    docs10e.count()
    t1 = timed("bm25 1x", lambda: bm25_rank(docs, ["table", "spark", "query"]).count())
    t10 = timed(
        "bm25 10x", lambda: bm25_rank(docs10e, ["table", "spark", "query"]).count()
    )
    print(f"bm25 growth: {t10 / t1:.1f}x for 10x docs")
    ev10.unpersist(); ev.unpersist(); docs10e.unpersist()

    # round-5 session-3 ops -------------------------------------------
    # bloom_prefilter: shuffled join against a SELECTIVE master — the
    # pre-filter should cut the fact-side shuffle to ~the match volume
    from asakusafw_spark_spark.operators import bloom_prefilter, master_join

    li_full = spark.read.parquet(f"{SF}/lineitem.parquet")
    sel_orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_totalprice") > 450000
    ).select("o_orderkey", "o_totalprice").persist()
    nsel = sel_orders.count()

    def join_plain():
        return master_join(
            sel_orders, li_full, [("o_orderkey", "l_orderkey")],
            strategy="shuffled", unique_master=True,
        )["joined"].count()

    def join_bloom():
        pre = bloom_prefilter(
            sel_orders, li_full, [("o_orderkey", "l_orderkey")]
        )
        return master_join(
            sel_orders, pre, [("o_orderkey", "l_orderkey")],
            strategy="shuffled", unique_master=True,
        )["joined"].count()

    tp = timed(f"shuffled join, selective master ({nsel} keys), no prefilter",
               join_plain)
    tb = timed("same join behind bloom_prefilter", join_bloom)
    print(f"bloom_prefilter speedup: {tp / tb:.1f}x on the selective shuffled join")

    # apply_agg_delta: FIXED churn against 1x vs 10x base facts — the
    # maintenance cost must track the churn, never the base table
    from asakusafw_spark_spark.operators import apply_agg_delta, snapshot_diff

    orders_p = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).persist()
    orders_p.count()
    o10 = inflate(orders_p, ["o_orderkey"]).persist()
    o10.count()

    def maintain(old):
        new = old.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 97 == 0,
                   F.col("o_totalprice") + 1.0).otherwise(F.col("o_totalprice")),
        )
        base_agg = old.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,6)")).alias("s"),
        )
        ch = snapshot_diff(old, new, "o_orderkey", include_old=True)
        return apply_agg_delta(base_agg, ch, "o_orderstatus", {"s": "o_totalprice"}).count()

    t1 = timed("apply_agg_delta 1x facts (~1% churn)", lambda: maintain(orders_p))
    t10 = timed("apply_agg_delta 10x facts (~1% churn)", lambda: maintain(o10))
    print(f"apply_agg_delta growth: {t10 / t1:.1f}x for 10x base facts "
          "(diff scan dominates; the delta fold itself is churn-sized)")

    # scd2_apply: open-row + change volume grows 10x
    from asakusafw_spark_spark.operators import scd2_apply

    def scd2(o):
        first = o.groupBy("o_orderkey").agg(
            F.min("o_totalprice").alias("price")
        ).select(
            F.col("o_orderkey").alias("k"), "price",
            F.lit("2020-01-01").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        chg = o.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("price"),
            F.lit("2021-01-01").cast("timestamp").alias("eff"),
            F.lit("U").alias("__op"),
        )
        return scd2_apply(first, chg, "k", "eff").count()

    t1 = timed("scd2_apply 1x (150k keys)", lambda: scd2(orders_p))
    t10 = timed("scd2_apply 10x (1.5M keys)", lambda: scd2(o10))
    print(f"scd2_apply growth: {t10 / t1:.1f}x for 10x keys+changes")
    sel_orders.unpersist(); orders_p.unpersist(); o10.unpersist()


if __name__ == "__main__":
    main()
