#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is materialized with the noop sink (full compute, no result
serialization).  One warm-up pass of the flagship amortizes JVM/codegen
start-up out of the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: The headline set: one per engine pillar (scan-agg, join chain, window,
#: pandas cogroup, sketch dedup, vector search, streaming).
HEADLINE = [
    "summarize_q1",
    "flagship_revenue_per_nation",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "master_join",
    "master_check_found",
    "top_k_per_group",
    "fold",
    "cogroup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "text_analysis",
    "chunk_documents",
    "quality_filter",
    "similarity_bruteforce_topk",
    "similarity_ivf",
    "streaming_windowed_agg",
    # round-5 additions (appended, never substituted — r04 VERDICT #8
    # keeps the 20-query prefix ratio-comparable across rounds)
    "redact",
    "tfidf",
    "pack_sequences",
    # round-5 session-2 additions (appended)
    "scrub_spans",
    "dedup_incremental",
    "quantize_embeddings",
    "q7_volume_shipping",
    "q10_returned_items",
    "winsorize",
    "q4_order_priority",
    "q14_promo_revenue",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "funnel",
    "retention",
    "normalize_text",
    "bm25",
    "text_index_search",
    # round-5 session-3 additions (appended): the remaining TPC-H
    # composites expressible over the slim schema
    "q6_forecast_revenue",
    "q8_market_share",
    "q12_late_priority_lines",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_waiting_suppliers",
    "bloom_join",
    "scd2_apply",
    "incremental_agg",
    "constraint_report",
    "lm_score",
    "analyze_table",
    # round-7 additions (appended): hot-key detection (reused-exchange
    # double-aggregate), exact-n deterministic sampling (TakeOrdered),
    # and k-anonymity suppression (window count over the quasi partition)
    "heavy_hitters",
    "sample_exact_n",
    "suppress_rare_groups",
    "audience_overlap",
    # round-8 additions (appended): k-anonymity audit, z-order layout
    # rewrite (bench-hygiene items from VERDICT r07 #9), and the
    # iterative-rounds transactional Direct-I/O composition
    "k_anonymity_report",
    "zorder_roundtrip",
    "iterative_transactional_output",
    "resample_locf",
    "streaming_theta_maintain",
    # round-9 additions (appended): the BPE-training inner-loop
    # statistic.  pagerank / bfs_levels / bpe_tokenize are deliberately
    # NOT benched: they are iterative MULTI-JOB operators (per-round
    # materializations), so single-query wall-clock mixes job-count
    # overhead with data throughput — their scale posture is measured
    # by tools/ (timings in BASELINE.md) and their correctness by the
    # strict oracles.
    "bpe_pair_counts",
    # round-10 additions (appended — prefix stays ratio-comparable):
    # edit-distance-verified fuzzy dedup and crawl-style URL dedup
    "dedup_edit_distance",
    "url_canonical_dedup",
]


#: The r01-comparable protocol subset (the frozen round-1 table in
#: BASELINE.md, best-of-3 protocol figure 11.0 s at sf0.1).  The sum is
#: emitted into the bench artifact as ``frozen_12_sec`` so the ledger
#: prose can cite the artifact instead of a hand-computed figure.
FROZEN_12 = [
    "summarize_q1",
    "flagship_revenue_per_nation",
    "master_join",
    "master_check_found",
    "top_k_per_group",
    "fold",
    "cogroup",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_analysis",
    "similarity_bruteforce_topk",
    "streaming_windowed_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from asakusafw_spark_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()

    # warm-up (JVM, codegen, parquet footer caches) — touch every table
    # family the headline set reads so no query pays first-touch costs
    qs["flagship_revenue_per_nation"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    qs["dedup_exact"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["similarity_bruteforce_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # best-of-3 per query: the sandbox host carries unrelated load spikes
    # (observed 1.5-3x inflation on individual runs); min measures the
    # code, not the neighbors.
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    frozen_12 = round(sum(times[q] for q in FROZEN_12 if q in times), 3)
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # the r01-comparable protocol subset, computed INTO the
        # artifact (VERDICT r15 "What's wrong" #3: a hand-summed prose
        # figure drifted from the committed artifact; the artifact is
        # now self-describing) — compare against the frozen 11.0 s
        # best-of-3 protocol baseline (BASELINE.md)
        "frozen_12_sec": frozen_12,
        "frozen_12_vs_11.0s_baseline": round(frozen_12 / 11.0, 3),
    }
    movers = _movers_vs_previous_round(times)
    if movers is not None:
        out["movers"] = movers
    print(json.dumps(out))


def _current_round() -> "int | None":
    """The round currently being built = newest driver CORRECTNESS
    report + 1 (the driver writes CORRECTNESS_r{N}.json at the END of
    round N, so during round N+1 the max is N)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", p))
    ]
    return max(rounds) + 1 if rounds else None


def _movers_vs_previous_round(times: "dict[str, float]"):
    """Trend guard (VERDICT r11 Next #7): compare per-query times with
    the newest PRIOR-round committed clean-host artifact
    (BENCH_LOCAL_r*_final.json, round < the round being built) and
    report queries >1.3× slower, so regressions are machine-flagged
    instead of judge-recomputed.  Returns ``{"baseline": <file>,
    "slower_1p3x": {q: {"prev": s, "cur": s, "ratio": r}}}``, or None
    when no prior artifact exists.  Sub-0.3 s queries are skipped —
    they sit inside host-noise jitter and flag spuriously.

    VERDICT r13: the guard must NEVER baseline against a same-round
    file — when the r13 final artifact was re-taken on a recovered
    host, "newest committed artifact" picked the artifact's own prior
    version and reported zero movers by construction while a recount
    vs r12 showed 9.  The current round is inferred from the driver's
    CORRECTNESS_r*.json sequence and same-or-later-round artifacts are
    excluded, so re-running bench after writing this round's artifact
    still compares against last round's."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    arts = glob.glob(os.path.join(here, "BENCH_LOCAL_r*_final.json"))
    cur = _current_round()
    all_rounds = []
    for p in arts:
        m = re.search(r"_r(\d+)_final\.json$", p)
        if m:
            all_rounds.append((int(m.group(1)), p))
    if not all_rounds:
        return None
    if cur is None:
        # ADVICE r14: with no CORRECTNESS_r*.json on disk (pruned
        # clone) the round inference fails; silently allowing the
        # newest artifact as baseline would recreate the exact
        # same-round failure this guard exists to prevent.  Treat the
        # newest BENCH_LOCAL artifact as the current round's own and
        # exclude it.
        cur = max(r for r, _ in all_rounds)
    rounds = [(r, p) for r, p in all_rounds if r < cur]
    if not rounds:
        return None
    _, prev_path = max(rounds)
    try:
        with open(prev_path) as f:
            prev = json.load(f).get("queries", {})
    except Exception:
        return None
    slow = {}
    for q, cur in times.items():
        p = prev.get(q)
        if p is None or max(p, cur) < 0.3:
            continue
        ratio = cur / p if p else float("inf")
        if ratio > 1.3:
            slow[q] = {"prev": p, "cur": cur, "ratio": round(ratio, 2)}
    return {"baseline": os.path.basename(prev_path), "slower_1p3x": slow}


if __name__ == "__main__":
    main()
