#!/usr/bin/env python3
"""sf1-scale spot-check sweep (VERDICT r07 Next #7, widened per r08
Next #2 from the 5 partsupp composites to a 20-query sweep of the
highest-traffic surfaces, then again in r09 to ~40 queries spanning
graph, simhash/substring/LM/postings text ops, session/streaming
maintainers, and the embeddings similarity family).

Scale-dependent VALUE bugs are the live bug class (the lgK=12 HLL
incident; the partsupp formula falsified twice by hypothesis at
specific supplier counts; the r08 resample-quantization falsification)
and the regular oracle only sees sf0.1.  The driver ships no sf1
testdata, so this tool synthesizes sf1-scale inputs ONCE (Spark writes
parquet; both engines then read the identical bytes — no dual-engine
generation arithmetic to trust) and funnels the sweep through the
standard verify_local oracle gate at 10× the largest regularly-
verified scale: S=10,000 suppliers / P=200,000 parts / 6M lineitems /
1M events / 50k documents / 150k customers / 20k embeddings.

Usage: python tools/sf1_partsupp_check.py [--keep] [out.json]
Writes a LOCAL_VERIFY-shaped report (default LOCAL_VERIFY_sf1.json).

Value shapes mirror the driver testdata (same columns, same vocabulary:
NATION_k / Brand#k / 'red widget' names / 1995-2001 dates / the events
view-click-signup-purchase-error types / word-salad documents with
deterministic exact- and near-duplicates) with deterministic
mod-arithmetic distributions, so every query's filter selects a
non-trivial slice.  lineitem's (l_partkey, l_suppkey) pairs are
generated WITH the partsupp formula so the q9/q20 fact-to-partsupp
joins exercise real matches at sf1 cardinality.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1_DIR = "/tmp/spark_graft_sf1_synth"
QUERIES = [
    # partsupp composites (the original r07 check — derived arithmetic)
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_relationship",
    "q20_potential_promotion",
    # TPC-H composites (multi-join + exact-decimal aggregation)
    "summarize_q1",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    # events surfaces (sessionization / state / time-series)
    "funnel",
    "retention",
    "incremental_agg",
    "scd2_apply",
    "resample_locf",
    # lineitem quantile surface (the label-precision bug class)
    "winsorize",
    # documents surfaces (dedup family + ranking)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_incremental",
    "tfidf",
    "bm25",
    # r09 widening: graph ops (iterative fixed-point arithmetic whose
    # determinism contract is exactly the scale-sensitive class)
    "pagerank",
    "pagerank_personalized",
    "bfs_levels",
    "triangle_count",
    # more documents surfaces (simhash family, substring dedup, LM,
    # postings index, packing).  r09 ran _groups only: at 32 bits the
    # low-entropy synthetic corpus collapsed signatures, the uncapped
    # 8-bit-chunk self-join went Theta(n^2), and the crash killed the
    # JVM plus 22 downstream queries.  r10's 64-bit sketch + max_bucket
    # keep-filter is exactly the fix that sweep mandated, so _pairs is
    # BACK IN — the sf1 row now proves the capped configuration
    # survives the adversarial corpus (output bounded by
    # pairs-per-kept-bucket, mega-buckets observably dropped).
    "dedup_simhash_groups",
    "dedup_simhash_pairs",
    # r10 additions: edit-distance verify (same banded candidates as
    # minhash) + URL canonicalization over the 6M-row lineitem
    "dedup_edit_distance",
    "url_canonical_dedup",
    "dedup_ngram_jaccard",
    "scrub_spans",
    "lm_score",
    "vocab_top_k",
    "text_index_search",
    "pack_sequences",
    # events surfaces (session windows, running frames, batch-replay
    # streaming maintainers)
    "sessionize",
    "moving_avg",
    "streaming_dedup_ingest",
    "streaming_theta_maintain",
    # r10 widening (VERDICT r09 Next #7): the remaining batch-replay
    # maintainers — exact per-key agg state and the distinct sketch
    "streaming_incremental_agg",
    "streaming_distinct_sketch",
    # embeddings surfaces (exact + quantized top-k, centroids,
    # cosine dup clusters)
    "similarity_bruteforce_topk",
    "similarity_quantized_topk",
    "quantize_embeddings",
    "embedding_centroids",
    "embedding_dup_clusters",
    # r11 widening (VERDICT r10 #3, 45 → 69): the remaining TPC-H
    # composites with scale-sensitive arithmetic (shares, correlated
    # averages, EXISTS chains, outer-join distributions)
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    # sketches at 10× (the HLL-coupon-collision bug class lives here)
    "approx_distinct",
    "approx_percentile",
    "heavy_hitters",
    # window frames over the 6M-row fact
    "top_k_per_group",
    "running_total",
    "percentile_agg",
    "grouping_sets",
    # join strategies whose cost/semantics shift with scale
    "bloom_join",
    "asof_join",
    "cogroup",
    # text/LLM surfaces not yet at sf1
    "bpe_pair_counts",
    "text_analysis",
    "token_budget",
    # ANN paths (IVF's driver-sample k-means + LSH multi-table)
    "similarity_ivf",
    "similarity_lsh_ann",
    # streaming batch-replay equivalences over 1M events
    "streaming_windowed_agg",
    "streaming_sessionize",
    # r11 second widening (69 → 95): the core join/group operator
    # family at 10× (broadcast-vs-shuffle thresholds, multikey
    # grouping, selection ordering), the remaining TPC-H composites,
    # the quality/sampling surfaces (window-count suppression and
    # deterministic exact-n draws are both partition-count-sensitive),
    # and the remaining stateful streaming maintainers
    "master_join",
    "master_join_multikey",
    "master_check_found",
    "master_check_missed",
    "master_selection_ordering",
    "fold",
    "group_sort",
    "cogroup3",
    "flagship_revenue_per_nation",
    "q4_order_priority",
    "q7_volume_shipping",
    "q12_late_priority_lines",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "k_anonymity_report",
    "suppress_rare_groups",
    "sample_exact_n",
    "train_val_split",
    "quantile_bucket",
    "contamination_check",
    "similarity_near_dup",
    "text_repetition",
    "streaming_cdc_upsert",
    "streaming_stateful_count",
    # r11 third widening (95 → 125): spill/broadcast-view/iterative
    # surfaces, the incremental-dedup corpus variants, storage-layout
    # roundtrips over the 6M-row fact, remaining streaming replays,
    # and the light agg/scan family.  All 30 pre-checked in filtered
    # batches against the sf1 synth tables this round — 29 green
    # first-run plus audience_overlap, whose first sf1 run CAUGHT the
    # theta_union default-nominal estimation bug (fixed + re-checked
    # green); they enter the committed LOCAL_VERIFY_sf1.json at the
    # next full sweep run.
    "cogroup_chunked",
    "group_view_lookup",
    "range_join_bands",
    "dedup_corpus",
    "dedup_corpus_best",
    "training_pipeline",
    "merge_upsert",
    "merge_evolve",
    "snapshot_diff",
    "compaction_roundtrip",
    "zorder_roundtrip",
    "iterative_rounds",
    "streaming_dedup",
    "streaming_interval_join",
    "streaming_quality_report",
    "text_simhash",
    "mix_corpus",
    "sample_stratified",
    "shard_assignment",
    "quality_filter",
    "pivot_agg",
    "rollup_agg",
    "cube_agg",
    "rank_in_group",
    "normalize_text",
    "extract_json",
    "redact",
    "summarize_any",
    "manifest_stats",
    "audience_overlap",
    # r12 widening (125 → 168 = the FULL registry; VERDICT r11 Next #5):
    # everything left — the record-op/projection family (cheap per row
    # but their null/type edges are exactly what a 10× synthetic corpus
    # stresses), the remaining master_* join variants and selection
    # modes, the IO/roundtrip family (hadoop/seqfile/fixed-width/cli
    # subprocess) over sf1-sized frames, set ops, BPE tokenize apply,
    # multimodal feature extraction over the binary columns, and the
    # transactional iterative sink.
    "project",
    "extend",
    "restructure",
    "checkpoint",
    "extract",
    "update",
    "convert",
    "branch",
    "split",
    "logging",
    "confluent",
    "distinct",
    "except_keys",
    "intersect_keys",
    "unpivot_measures",
    "flatten_structs",
    "fold_custom",
    "fold_partial",
    "master_join_missed",
    "master_join_shuffled",
    "master_join_where",
    "master_join_update",
    "master_branch",
    "master_selection_custom_fn",
    "bucketed_join",
    "analyze_table",
    "constraint_report",
    "cap_per_group",
    "chunk_documents",
    "corpus_stats",
    "materialize_packs",
    "retention_expire",
    "bpe_tokenize",
    "multimodal_features",
    "direct_input",
    "fixed_width_input",
    "hadoop_input",
    "hadoop_input_newapi",
    "hadoop_output_newapi",
    "seqfile_roundtrip",
    "output_roundtrip",
    "iterative_transactional_output",
    "cli_roundtrip",
]

P, S, O, L, C = 200_000, 10_000, 1_500_000, 6_000_000, 150_000
EV, DOCS, USERS = 1_000_000, 50_000, 15_000
EMB = 20_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ADJS = ["small", "red", "blue", "hot", "green", "large"]
NOUNS = ["ring", "widget", "bolt", "gear", "gizmo", "cap", "disk"]
TYPES = ["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"]


def generate(spark, out_dir: str | None = None,
             only: "set[str] | None" = None,
             coalesce: bool = True) -> None:
    """Write the synthetic tables.  ``out_dir`` defaults to SF1_DIR;
    ``only`` restricts to a table subset (tools/sf10_probe.py scales
    the module constants ×10 and generates just the tables its heavy
    queries read — regenerating 60M-row lineitem for a documents-only
    probe would be pure waste)."""
    from pyspark.sql import functions as F

    dest = out_dir or SF1_DIR

    def arr(xs):
        return F.array(*[F.lit(x) for x in xs])

    def write(df, name):
        # single FILE named <table>.parquet, exactly the driver
        # testdata's layout (DuckDB's view glob and Spark both read it;
        # Spark still parallelizes over row groups)
        import glob

        if only is not None and name not in only:
            return
        if not coalesce:
            # engine-only probes (sf10): a DIRECTORY named
            # <table>.parquet — parallel write, same reader path
            df.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
            print(f"  wrote {name} (dir)", flush=True)
            return
        staging = f"{dest}/_stg_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part_file = glob.glob(f"{staging}/part-*.parquet")[0]
        os.replace(part_file, f"{dest}/{name}.parquet")
        shutil.rmtree(staging)
        print(f"  wrote {name}", flush=True)

    k = F.col("id")
    day0 = F.lit("1995-01-01").cast("date")

    write(
        spark.range(5).select(
            k.cast("int").alias("r_regionkey"),
            arr(REGIONS)[k.cast("int")].alias("r_name"),
        ),
        "region",
    )
    write(
        spark.range(25).select(
            k.cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), k.cast("string")).alias("n_name"),
            (k % 5).cast("int").alias("n_regionkey"),
        ),
        "nation",
    )
    write(
        spark.range(S).select(
            k.alias("s_suppkey"),
            F.format_string("Supplier#%09d", k).alias("s_name"),
            (k % 25).cast("int").alias("s_nationkey"),
            (((k * 37 + 13) % 1_100_000 - 100_000) / 100.0).alias("s_acctbal"),
        ),
        "supplier",
    )
    write(
        spark.range(P).select(
            k.alias("p_partkey"),
            F.concat(
                arr(ADJS)[(k % 6).cast("int")],
                F.lit(" "),
                arr(NOUNS)[(k % 7).cast("int")],
            ).alias("p_name"),
            F.concat(F.lit("Brand#"), ((k * 7) % 25 + 1).cast("string")).alias(
                "p_brand"
            ),
            arr(TYPES)[((k * 11) % 6).cast("int")].alias("p_type"),
            ((k * 13) % 50 + 1).cast("int").alias("p_size"),
            ((90_000 + (k * 29) % 20_000) / 100.0).alias("p_retailprice"),
        ),
        "part",
    )
    write(
        spark.range(O).select(
            k.alias("o_orderkey"),
            (k % C).alias("o_custkey"),
            arr(["F", "O", "P"])[(k % 3).cast("int")].alias("o_orderstatus"),
            ((k * 53) % 40_000_000 / 100.0 + 900.0).alias("o_totalprice"),
            F.date_add(day0, ((k * 17) % 2400).cast("int"))
            .cast("timestamp")
            .alias("o_orderdate"),
            arr(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
                (k % 5).cast("int")
            ].alias("o_orderpriority"),
        ),
        "orders",
    )
    # lineitem: (l_partkey, l_suppkey) generated WITH the partsupp
    # formula (sources/tpch.py) so fact↔partsupp joins hit at sf1
    pk = (k * 19) % P
    sk = F.expr(
        f"((id*19) % {P} + ((id*19) % {P}) div {S}"
        f" + ((id % 4) * {S}) div 4) % {S}"
    )
    qty = ((k * 7) % 50 + 1).cast("double")
    write(
        spark.range(L).select(
            (k / 4).cast("long").alias("l_orderkey"),
            pk.alias("l_partkey"),
            sk.cast("long").alias("l_suppkey"),
            (k % 4 + 1).cast("int").alias("l_linenumber"),
            qty.alias("l_quantity"),
            (qty * ((90_000 + (k * 31) % 20_000) / 100.0)).alias(
                "l_extendedprice"
            ),
            ((k % 11) / 100.0).alias("l_discount"),
            ((k % 9) / 100.0).alias("l_tax"),
            arr(["N", "R", "A"])[(k % 3).cast("int")].alias("l_returnflag"),
            arr(["O", "F"])[(k % 2).cast("int")].alias("l_linestatus"),
            F.date_add(
                day0,
                (((k / 4).cast("long") * 17) % 2400 + k % 30 + 1).cast("int"),
            )
            .cast("timestamp")
            .alias("l_shipdate"),
        ),
        "lineitem",
    )
    write(
        spark.range(C).select(
            k.alias("c_custkey"),
            F.format_string("Customer#%09d", k).alias("c_name"),
            (k % 25).cast("int").alias("c_nationkey"),
            (((k * 41 + 7) % 1_100_000 - 100_000) / 100.0).alias("c_acctbal"),
            arr(
                ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                 "MACHINERY"]
            )[((k * 3) % 5).cast("int")].alias("c_mktsegment"),
        ),
        "customer",
    )
    # events: driver vocabulary (view/click/signup/purchase/error,
    # 2024-01 timestamps, '{"k": N}' props), 1M rows / 15k users
    write(
        spark.range(EV).select(
            k.alias("event_id"),
            F.timestamp_seconds(
                F.lit(1_704_067_200) + (k * 37) % 2_592_000
            ).alias("ts"),
            # ~1.1% of rows each on two HOT users (ids 0/1) so the
            # heavy_hitters 0.8%-share threshold BINDS at sf1 (a
            # uniform user distribution made that row a 0-rows-both-
            # engines green — true but exercising only the empty path);
            # the rest stay uniform for the session/funnel surfaces
            F.when(k % 90 < 2, k % 2)
            .otherwise((k * 31) % USERS)
            .alias("user_id"),
            arr(["view", "click", "signup", "purchase", "error"])[
                ((k * 7) % 5).cast("int")
            ].alias("event_type"),
            (((k * 53) % 100_000) / 100.0).alias("value"),
            F.format_string('{"k": %d}', (k % 100).cast("int")).alias("props"),
        ),
        "events",
    )
    # documents: word-salad text over the driver's vocabulary with
    # DETERMINISTIC duplicates — k%5==4 reuses seed k-4 (exact dup of
    # that doc's text), k%7==6 (and not already an exact dup) reuses
    # seed k-6 plus an appended token (near dup) — so the dedup family
    # exercises real matches at 50k-doc cardinality
    vocab = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
             "part", "hash", "merge", "batch", "spark", "a", "the",
             "window", "order", "data", "column", "join", "small", "line",
             "customer", "query", "group", "big", "vector", "stream",
             "filter", "lineitem"]
    seed = (
        F.when(k % 5 == 4, k - 4)
        .when(k % 7 == 6, k - 6)
        .otherwise(k)
    )
    n_words = (F.lit(20) + (seed * 7) % 180).cast("int")
    vocab_arr = arr(vocab)
    # Every 6th word is a RARE seed+position-derived token (50k-token
    # space): planted dup groups (identical seed ⇒ identical body)
    # share rare shingles with doc-freq ≤ group size (≤3), which
    # SURVIVE the dedup_ngram_jaccard max_doc_freq=5 cap — without
    # this, a 30-word vocabulary makes every shingle's df ≫ 5 at 50k
    # docs, the cap prunes everything, and the sf1 row for the ngram
    # family is a vacuous 0-row pass (both engines agreeing on empty).
    # Unrelated docs that collide on a token value still differ in the
    # surrounding words, so their shingles differ — candidates stay
    # exactly the planted groups.
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda i: F.when(
                i % 6 == 0,
                F.concat(
                    F.lit("tok"),
                    ((seed * 37 + i.cast("long") * 11) % 50_000).cast(
                        "string"
                    ),
                ),
            ).otherwise(
                F.element_at(
                    vocab_arr,
                    ((seed * 13 + i.cast("long") * 17) % 30 + 1).cast("int"),
                )
            ),
        ),
        " ",
    )
    text = F.concat(
        body,
        F.when((k % 7 == 6) & ~(k % 5 == 4), F.lit(" extra token"))
        .otherwise(F.lit("")),
    )
    write(
        spark.range(DOCS).select(
            k.alias("doc_id"),
            text.alias("text"),
            arr(["en", "fr", "de", "es", "zh"])[((k * 11) % 5).cast("int")]
            .alias("lang"),
            F.concat(F.lit("src"), (k % 20).cast("string")).alias("source"),
            F.length(text).alias("n_chars"),
        ),
        "documents",
    )
    # embeddings: driver schema (vec_id BIGINT, embedding FLOAT[64],
    # label INT, 10 labels) at 10x rows, matching the driver data's
    # MEASURED geometry: near-isotropic directions (intra-label mean
    # cosine ~0 — label is NOT a directional cluster; only ~0.03
    # near-dup pairs per doc at sf0.1).  A center-dominated first cut
    # made each label a 2000-vector near-CLIQUE and drove the near-dup
    # graph quadratic (20M edges, wedge join never finished) — the
    # near-dup family needs SPARSE planted structure, not dense
    # clusters.  xxhash64 noise dominates (well-mixed, no LCG lattice
    # correlations); a 0.25 tilt on 6 label-keyed dims gives centroid
    # queries signal without creating near-dup pairs (intra cosine
    # ~0.02 << 0.45).  Planted dups: k%5==4 clones seed k-4 (disjoint
    # PAIRS), k%25==9 re-points to seed k-9, closing {k-9, k-5, k}
    # trios so triangle_count sees real triangles; both stay O(n)
    # edges.  Spark writes the file once, both engines read the bytes.
    vseed = (
        F.when(k % 25 == 9, k - 9)
        .when(k % 5 == 4, k - 4)
        .otherwise(k)
    )
    vlabel = ((k * 3) % 10).cast("int")
    vperturb = F.when(vseed != k, (k % 7).cast("double") / 997.0).otherwise(
        F.lit(0.0)
    )
    write(
        spark.range(EMB).select(
            k.alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda j: (
                    (
                        (F.xxhash64(vseed, j) % 2001 + 2001) % 2001 - 1000
                    ).cast("double")
                    / 1000.0
                    + F.when(
                        j % 10 == vlabel.cast("long"), F.lit(0.25)
                    ).otherwise(F.lit(0.0))
                    + vperturb
                ).cast("float"),
            ).alias("embedding"),
            vlabel.alias("label"),
        ),
        "embeddings",
    )


def main() -> int:
    args = [a for a in sys.argv[1:]]
    keep = "--keep" in args
    args = [a for a in args if a != "--keep"]
    out = args[0] if args else "LOCAL_VERIFY_sf1.json"

    from asakusafw_spark_spark.session import engine_builder

    if not os.path.exists(f"{SF1_DIR}/embeddings.parquet"):
        print(f"generating sf1-scale tables under {SF1_DIR} ...")
        spark = engine_builder(app_name="sf1_gen").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        generate(spark)
        spark.stop()
    else:
        print(f"reusing {SF1_DIR}")

    # Direct PK invariant at sf1 (q11 goes 0-row at this scale — its
    # 1/500 threshold can't bind over 200k uniform parts — so the
    # composite alone would under-exercise the formula): the derived
    # relation must have exactly 4 DISTINCT supplier links per part in
    # BOTH engines.  This is precisely the property whose violation the
    # hypothesis run caught at specific supplier counts.
    import duckdb

    from asakusafw_spark_spark.sources.tpch import partsupp_cte

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{SF1_DIR}/part.parquet'"
    )
    con.execute(
        f"CREATE VIEW supplier AS SELECT * FROM '{SF1_DIR}/supplier.parquet'"
    )
    n_rows, n_pk = con.execute(
        f"WITH {partsupp_cte()} SELECT COUNT(*), "
        "COUNT(DISTINCT (ps_partkey, ps_suppkey)) FROM partsupp"
    ).fetchone()
    assert n_rows == n_pk == 4 * P, (n_rows, n_pk, 4 * P)
    print(f"PK invariant (duckdb): {n_pk} distinct links == 4*{P}")

    spark = engine_builder(app_name="sf1_pk").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from asakusafw_spark_spark.sources.tpch import synthesize_partsupp

    ps = synthesize_partsupp(
        spark.read.parquet(f"{SF1_DIR}/part.parquet"),
        spark.read.parquet(f"{SF1_DIR}/supplier.parquet"),
    )
    got = ps.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_partkey", "ps_suppkey").alias("pk"),
    ).first()
    assert got["n"] == got["pk"] == 4 * P, (got["n"], got["pk"], 4 * P)
    print(f"PK invariant (spark):  {got['pk']} distinct links == 4*{P}")
    spark.stop()

    # Run the sweep in BATCHES, one verify_local.py subprocess (= one
    # fresh JVM) per batch.  A single shared session OOM-cascaded at
    # sf1: after ~17 heavy queries the driver JVM's heap was exhausted
    # and every later query failed with the same Java-heap error even
    # though each passes in isolation.  Per-batch JVM recycling is also
    # the honest scale posture — on a real cluster each job gets fresh
    # executors; a 40-query marathon sharing one driver heap does not.
    import json as _json

    BATCH = 6
    merged: dict = {}
    rc = 0
    for i in range(0, len(QUERIES), BATCH):
        batch = QUERIES[i : i + BATCH]
        part_out = f"{out}.batch{i}"
        brc = subprocess.call(
            [
                sys.executable,
                os.path.join(REPO, "tools", "verify_local.py"),
                "--json",
                part_out,
                SF1_DIR,
                *batch,
            ]
        )
        rc = rc or brc
        if os.path.exists(part_out):
            with open(part_out) as f:
                part = _json.load(f)
            # verify_local wraps per-query rows under "queries"
            merged.update(part.get("queries", part))
            os.remove(part_out)
    n_ok = sum(
        1
        for v in merged.values()
        if v.get("hash_match") or (v.get("rows_only") and not v.get("err"))
    )
    with open(out, "w") as f:
        _json.dump(
            {
                "sf_dir": SF1_DIR,
                "n_queries": len(merged),
                "n_green": n_ok,
                "queries": merged,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"sf1 sweep: {n_ok}/{len(merged)} green -> {out}")
    if not keep and rc == 0:
        shutil.rmtree(SF1_DIR, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
