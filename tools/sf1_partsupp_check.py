#!/usr/bin/env python3
"""One-off sf1-scale spot-check for the partsupp composites
(VERDICT r07 Next #7).

The partsupp relation is DERIVED arithmetic (sources/tpch.py), and the
r07 hypothesis run proved its bug class is SCALE-DEPENDENT (collisions
appear only at particular supplier counts; the lgK=12 HLL incident was
the same shape).  The driver ships no sf1 testdata, so this tool
synthesizes sf1-scale inputs ONCE (Spark writes parquet; both engines
then read the identical bytes — no dual-engine generation arithmetic to
trust) and funnels the five partsupp composites through the standard
verify_local oracle gate at S=10,000 suppliers / P=200,000 parts /
6M lineitems — 10× the largest regularly-verified scale.

Usage: python tools/sf1_partsupp_check.py [--keep] [out.json]
Writes a LOCAL_VERIFY-shaped report (default LOCAL_VERIFY_sf1_partsupp.json).

Value shapes mirror the driver testdata (same columns, same vocabulary:
NATION_k / Brand#k / 'red widget' names / 1995-2001 dates) with
deterministic mod-arithmetic distributions, so every composite's filter
selects a non-trivial slice.  lineitem's (l_partkey, l_suppkey) pairs
are generated WITH the partsupp formula so the q9/q20 fact-to-partsupp
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
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_relationship",
    "q20_potential_promotion",
]

P, S, O, L, C = 200_000, 10_000, 1_500_000, 6_000_000, 150_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ADJS = ["small", "red", "blue", "hot", "green", "large"]
NOUNS = ["ring", "widget", "bolt", "gear", "gizmo", "cap", "disk"]
TYPES = ["ECONOMY", "STANDARD", "LARGE", "MEDIUM", "SMALL", "PROMO"]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    def arr(xs):
        return F.array(*[F.lit(x) for x in xs])

    def write(df, name):
        # single FILE named <table>.parquet, exactly the driver
        # testdata's layout (DuckDB's view glob and Spark both read it;
        # Spark still parallelizes over row groups)
        import glob

        staging = f"{SF1_DIR}/_stg_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part_file = glob.glob(f"{staging}/part-*.parquet")[0]
        os.replace(part_file, f"{SF1_DIR}/{name}.parquet")
        shutil.rmtree(staging)
        print(f"  wrote {name}")

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


def main() -> int:
    args = [a for a in sys.argv[1:]]
    keep = "--keep" in args
    args = [a for a in args if a != "--keep"]
    out = args[0] if args else "LOCAL_VERIFY_sf1_partsupp.json"

    from asakusafw_spark_spark.session import engine_builder

    if not os.path.exists(f"{SF1_DIR}/lineitem.parquet"):
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

    rc = subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "tools", "verify_local.py"),
            "--json",
            out,
            SF1_DIR,
            *QUERIES,
        ]
    )
    if not keep and rc == 0:
        shutil.rmtree(SF1_DIR, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
