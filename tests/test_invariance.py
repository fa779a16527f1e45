"""Partitioning-invariance: results must not depend on
``spark.sql.shuffle.partitions`` (SURVEY.md §5 — the reference runs its
cogroup specs over numSlices ∈ {None, 8, 4}).

Runs a representative query per engine pillar under 1 / 4 / 17 shuffle
partitions and asserts identical sorted results.
"""

import pytest

from pyspark.sql import functions as F

from asakusafw_spark_spark.operators import (
    Grouping,
    cogroup,
    master_join,
    summarize,
    top_k_per_group,
)


def _lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def q_summarize(spark, sf_dir):
    return summarize(
        _lineitem(spark, sf_dir),
        ["l_returnflag"],
        {"n": ("count", "l_orderkey"), "max_qty": ("max", "l_quantity")},
    )


def q_join(spark, sf_dir):
    return master_join(
        _orders(spark, sf_dir).select("o_orderkey", "o_custkey"),
        _lineitem(spark, sf_dir).select("l_orderkey", "l_linenumber"),
        [("o_orderkey", "l_orderkey")],
    )["joined"]


def q_cogroup(spark, sf_dir):
    import pandas as pd

    def fn(key, opdf, lpdf):
        return pd.DataFrame(
            {"k": [key[0]], "n_o": [len(opdf)], "n_l": [len(lpdf)]}
        )

    return cogroup(
        [
            Grouping(_orders(spark, sf_dir).select("o_orderkey"), ["o_orderkey"]),
            Grouping(
                _lineitem(spark, sf_dir).select("l_orderkey", "l_linenumber"),
                ["l_orderkey"],
                [("l_linenumber", "asc")],
            ),
        ],
        fn,
        "k long, n_o long, n_l long",
    )


def q_topk(spark, sf_dir):
    return top_k_per_group(
        _orders(spark, sf_dir).select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [("o_totalprice", "desc"), ("o_orderkey", "asc")],
        3,
    )


def q_chunked_cogroup(spark, sf_dir):
    def fn(key, chunks):
        n_o = n_l = 0
        for i, df in chunks:
            if i == 0:
                n_o += len(df)
            else:
                n_l += len(df)
        return {"k": key[0], "n_o": n_o, "n_l": n_l}

    return cogroup(
        [
            Grouping(_orders(spark, sf_dir).select("o_orderkey"), ["o_orderkey"]),
            Grouping(
                _lineitem(spark, sf_dir).select("l_orderkey", "l_linenumber"),
                ["l_orderkey"],
                [("l_linenumber", "asc")],
            ),
        ],
        fn,
        "k long, n_o long, n_l long",
        chunked=True,
    )


def q_dup_clusters(spark, sf_dir):
    from asakusafw_spark_spark.functions import dup_clusters, simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dup_clusters(
        simhash_pairs(docs, max_hamming=3),
        nodes=docs.select("doc_id"),
        node_col="doc_id",
    )


def q_mix_corpus(spark, sf_dir):
    from asakusafw_spark_spark.functions import mix_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mix_corpus(
        docs, {"src0": 0.5, "src1": 0.5}, token_budget=500
    ).select("doc_id", "source")


def q_chunk_documents(spark, sf_dir):
    from asakusafw_spark_spark.functions import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, chunk_tokens=25, overlap=5)


def q_quality_filter(spark, sf_dir):
    from asakusafw_spark_spark.functions import quality_quantile_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_quantile_filter(docs, drop_frac=0.25, by=("lang",)).select(
        "doc_id", "lang", "quality"
    )


def q_spill_cogroup(spark, sf_dir):
    """The disk-spill carry path must be partition-invariant too."""

    def fn(key, pdf):
        return {"k": key[0], "n": len(pdf), "s": int(pdf["l_linenumber"].sum())}

    li = _lineitem(spark, sf_dir).select(
        F.lit(1).alias("k"), "l_orderkey", "l_linenumber"
    )
    return cogroup(
        [Grouping(li, ["k"], [("l_orderkey", "asc"), ("l_linenumber", "asc")])],
        fn,
        "k long, n long, s long",
        max_buffered_rows=500,
    )


def q_pack_sequences(spark, sf_dir):
    from asakusafw_spark_spark.functions import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, 128, by="source", shards=2).select(
        "doc_id", "pack_shard", "pack_id", "pack_pos"
    )


def q_tfidf(spark, sf_dir):
    from asakusafw_spark_spark.functions import tfidf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf(docs, min_df=2).filter(F.col("doc_id") % 10 == 0)


def q_vocab(spark, sf_dir):
    from asakusafw_spark_spark.functions import vocab_top_k

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_top_k(docs, k=20)


def q_scatter_where_join(spark, sf_dir):
    # scatter_tx repartitions by the CURRENT shuffle-partition conf — the
    # exactness claim is precisely that results never depend on it
    from asakusafw_spark_spark.operators import MasterSelection, master_join

    orders = _orders(spark, sf_dir).select("o_orderkey", "o_custkey", "o_totalprice")
    masters = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.max("o_totalprice").alias("cap")
    )
    sel = MasterSelection(
        ordering=[("cap", "desc")],
        where=F.col("__m_cap") >= F.col("o_totalprice"),
        scatter_tx=True,
        max_candidates=1,
    )
    return master_join(
        masters, orders, [("k", "o_custkey")], selection=sel
    )["joined"]


def q_scrub_spans(spark, sf_dir):
    from asakusafw_spark_spark.functions import scrub_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return scrub_duplicate_spans(docs, n=8)


def q_quantized_topk(spark, sf_dir):
    from asakusafw_spark_spark.functions import quantized_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return quantized_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)



def q_cap_per_group(spark, sf_dir):
    from asakusafw_spark_spark.functions import cap_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cap_per_group(docs, by="source", n=10, key_col="doc_id").select(
        "doc_id", "source"
    )


def q_winsorize(spark, sf_dir):
    from asakusafw_spark_spark.functions import winsorize

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return winsorize(li, "l_extendedprice", by="l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_extendedprice_winsorized"
    )


QUERIES = {
    "summarize": q_summarize,
    "join": q_join,
    "cogroup": q_cogroup,
    "topk": q_topk,
    "chunked_cogroup": q_chunked_cogroup,
    "dup_clusters": q_dup_clusters,
    "mix_corpus": q_mix_corpus,
    "chunk_documents": q_chunk_documents,
    "quality_filter": q_quality_filter,
    "spill_cogroup": q_spill_cogroup,
    "pack_sequences": q_pack_sequences,
    "tfidf": q_tfidf,
    "vocab_top_k": q_vocab,
    "scatter_where_join": q_scatter_where_join,
    "scrub_spans": q_scrub_spans,
    "quantized_topk": q_quantized_topk,
    "cap_per_group": q_cap_per_group,
    "winsorize": q_winsorize,
}


@pytest.mark.parametrize("qname", sorted(QUERIES))
def test_shuffle_partition_invariance(spark, sf_dir, qname):
    fn = QUERIES[qname]
    results = {}
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in (1, 4, 17):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            df = fn(spark, sf_dir)
            rows = sorted(map(tuple, df.collect()))
            results[parts] = rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert results[1] == results[4] == results[17]
    assert len(results[1]) > 0
