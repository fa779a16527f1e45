"""A/B each heavy sf1 query with AQE partition-coalescing ON (default)
vs OFF: a big OFF-side speedup flags a tiny-bytes/heavy-CPU stage that
coalescing serialized (the r14 edit-distance class)."""
import sys, time
sys.path.insert(0, "/root/repo")
from asakusafw_spark_spark.session import get_spark
import __spark_entry__ as E
from asakusafw_spark_spark.functions.dedup import release_cached_intermediates

spark = get_spark(app_name="aqe_probe")
spark.sparkContext.setLogLevel("ERROR")
sf = "/tmp/spark_graft_sf1_synth"
HEAVY = ["dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash_pairs",
         "dedup_clusters", "dedup_incremental", "similarity_near_dup",
         "similarity_lsh_ann", "scrub_spans", "contamination_check",
         "dedup_edit_distance"]
qs = E.queries()
for name in HEAVY:
    row = {}
    for mode, flag in (("on", "true"), ("off", "false")):
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", flag)
        release_cached_intermediates()
        t0 = time.time()
        try:
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            row[mode] = time.time() - t0
        except Exception as e:
            row[mode] = None
            print(name, mode, "ERR", str(e)[:100], flush=True)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    if row.get("on") and row.get("off"):
        r = row["on"] / row["off"]
        flag = "  <-- COALESCE PENALTY" if r > 1.3 else ""
        print("%-24s on=%6.1fs off=%6.1fs ratio=%.2f%s" % (name, row["on"], row["off"], r, flag), flush=True)
