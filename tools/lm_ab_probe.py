#!/usr/bin/env python3
"""Interleaved lm_score A/B: r16 explode_outer shape (HEAD) vs the
pre-27d3fd4 shape (ids.distinct() + left-join re-attach), VERDICT r16
item 5.  Both shapes run in ONE JVM, alternating (new, old) x N, timed
with the bench's noop-sink region.  Also asserts the two frames are
row-identical on the bench corpus before timing.

Usage: python tools/lm_ab_probe.py [--runs N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def old_bigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """The pre-27d3fd4 shape, verbatim (third corpus scan for
    ids.distinct() + left-join re-attach of zero-bigram docs)."""
    from asakusafw_spark_spark.functions.text import tokens

    src = df

    def bigrams(frame, keep_id):
        toks = tokens(text_col)
        t = frame.select(
            *([F.col(id_col)] if keep_id else []),
            F.when(
                F.size(toks) >= 2,
                F.arrays_zip(
                    F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
                    F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            .alias("__bg__"),
        )
        ex = t.select(
            *([F.col(id_col)] if keep_id else []),
            F.explode_outer("__bg__").alias("__p__"),
        ).where(F.col("__p__").isNotNull())
        return ex.select(
            *([F.col(id_col)] if keep_id else []),
            F.col("__p__.w1").alias("w1"),
            F.col("__p__.w2").alias("w2"),
        )

    train_bg = bigrams(src, keep_id=False)
    c12 = (
        train_bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__c12__"))
        .localCheckpoint(eager=False)
    )
    c1 = c12.groupBy("w1").agg(F.sum("__c12__").cast("long").alias("__c1__"))
    vocab = c12.agg(F.countDistinct("w2").alias("__v__"))

    doc_bg = bigrams(df, keep_id=True)
    scored = (
        doc_bg.join(c12, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .join(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.round(
                F.log(
                    (F.coalesce(F.col("__c12__"), F.lit(0)).cast("double") + F.lit(k))
                    / (
                        F.coalesce(F.col("__c1__"), F.lit(0)).cast("double")
                        + F.lit(k) * F.col("__v__")
                    )
                ),
                6,
            ).alias("__logp__"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("__logp__").try_cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("lm_score"),
    )
    ids = df.select(id_col).distinct()
    return (
        ids.join(agg, [id_col], "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
            F.col("lm_score"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from asakusafw_spark_spark.functions import bigram_lm_score
    from asakusafw_spark_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="lm_ab_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # warm-up: same families bench touches + both arms once
    qs["flagship_revenue_per_nation"](spark, args.sf).write.format("noop").mode(
        "overwrite").save()

    docs_fn = lambda: entry_mod._t(spark, args.sf, "documents")  # noqa: E731

    # equality check (bench corpus has non-null ids, so the r16 null-id
    # grouping difference cannot bite; still assert)
    new_rows = sorted(map(tuple, bigram_lm_score(docs_fn()).collect()))
    old_rows = sorted(map(tuple, old_bigram_lm_score(docs_fn()).collect()))
    assert new_rows == old_rows, "A/B arms diverge on the bench corpus!"

    arms = {"new": lambda: bigram_lm_score(docs_fn()),
            "old": lambda: old_bigram_lm_score(docs_fn())}
    times: dict[str, list] = {"new": [], "old": []}
    for i in range(args.runs):
        for name in ("new", "old") if i % 2 == 0 else ("old", "new"):
            t0 = time.perf_counter()
            arms[name]().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    out = {
        "what": "lm_score A/B: r16 explode_outer shape vs pre-27d3fd4",
        "sf": args.sf,
        "rows_equal": True,
        "new": {"times": times["new"], "min": min(times["new"]),
                "med": sorted(times["new"])[len(times["new"]) // 2]},
        "old": {"times": times["old"], "min": min(times["old"]),
                "med": sorted(times["old"])[len(times["old"]) // 2]},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
