"""A/B each heavy sf1 query with AQE partition-coalescing ON (default)
vs OFF: a big OFF-side speedup flags a tiny-bytes/heavy-CPU stage that
coalescing serialized (the r14 edit-distance class — AQE coalesces a
slim shuffle by BYTES and the heavy Python/array stage downstream
inherits the narrow width).

r15 (VERDICT r14 Next #4): coverage extended from the 10 dedup-family
rows to the FULL top-15 sf1 wall-clock rows; results land in a JSON
table for the committed probe record.

Usage: python tools/aqe_coalesce_probe.py [JSON_OUT] [query ...]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from asakusafw_spark_spark.session import get_spark
import __spark_entry__ as E
from asakusafw_spark_spark.functions.dedup import release_cached_intermediates

#: top-15 sf1 rows by LOCAL_VERIFY_sf1.json wall clock (r14 artifact),
#: superset of the 10 dedup-family rows probed in r14.
HEAVY = [
    "dedup_edit_distance", "winsorize", "embedding_dup_clusters",
    "training_pipeline", "triangle_count", "streaming_sessionize",
    "text_repetition", "running_total", "url_canonical_dedup",
    "streaming_dedup_ingest", "contamination_check", "project",
    "dedup_minhash_lsh", "scrub_spans", "fold_partial",
]


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if args and args[0].endswith(".json"):
        json_out, args = args[0], args[1:]
    names = args or HEAVY

    spark = get_spark(app_name="aqe_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/tmp/spark_graft_sf1_synth"
    qs = E.queries()
    table = {}
    for name in names:
        # r15 protocol fix: one WARM pass first, then alternating
        # off/on/off/on with min per mode — the original on-first
        # single-pass protocol charged first-touch costs (file listing,
        # codegen, tmp staging) entirely to the ON side and flagged 4
        # phantom penalties (0.94-1.08 once warmed+alternated).
        row = {}
        try:
            qs[name](spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(name, "warm ERR", str(e)[:100], flush=True)
            table[name] = {"on": None, "off": None}
            continue
        best = {"on": None, "off": None}
        for mode in ("off", "on", "off", "on"):
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled",
                "true" if mode == "on" else "false",
            )
            release_cached_intermediates()
            t0 = time.time()
            try:
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best[mode] = dt if best[mode] is None else min(best[mode], dt)
            except Exception as e:
                print(name, mode, "ERR", str(e)[:100], flush=True)
        row = {m: (round(v, 1) if v is not None else v) for m, v in best.items()}
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "true"
        )
        # `is not None`, not truthiness: a legitimate sub-0.05 s timing
        # rounds to 0.0 and must still produce a row (r15 ADVICE); the
        # ratio guards off == 0 explicitly.
        if row.get("on") is not None and row.get("off"):
            row["ratio"] = round(row["on"] / row["off"], 2)
            flag = "  <-- COALESCE PENALTY" if row["ratio"] > 1.3 else ""
            print(
                "%-24s on=%6.1fs off=%6.1fs ratio=%.2f%s"
                % (name, row["on"], row["off"], row["ratio"], flag),
                flush=True,
            )
        table[name] = row
    if json_out:
        json.dump({"sf_dir": sf, "queries": table}, open(json_out, "w"),
                  indent=1)
        print("wrote", json_out)


if __name__ == "__main__":
    main()
