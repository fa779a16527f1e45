#!/usr/bin/env python3
"""Robustness sweep: run EVERY registered query against degenerate inputs —
(a) fully EMPTY tables (schema-only parquet), (b) NULL-heavy tables
(~20% nulls injected into nullable payload columns; keys stay non-null),
and (c) SKEWED tables (one mega-key per table: half of events collapse to
one user, a third of documents to one identical text, a quarter of
lineitem to one part — the shapes that turn keyed shuffles, LSH buckets,
session windows and CC components degenerate).  A query passes if it
executes to completion; row counts are reported, not asserted
(degenerate-input semantics are engine-defined).  The skew mode is the
mechanical check behind SCALING.md's skew-defense claims (max_bucket
keep-filters, capped chunk buckets, AQE skew splits): the documented
caps must DROP the mega-buckets, not follow them quadratic.

Usage: python tools/robustness_sweep.py [empty|nulls|skew|both|all]
(``both`` = empty+nulls, the historical pair; ``all`` adds skew)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
#: payload columns eligible for null injection (never group/join keys)
NULLABLE = {
    "documents": ["text", "lang", "source"],
    "embeddings": ["embedding", "label"],
    "orders": ["o_totalprice", "o_orderpriority"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag"],
    "customer": ["c_acctbal", "c_mktsegment", "c_name"],
    "events": ["value", "event_type", "props"],
    "part": ["p_retailprice", "p_brand", "p_type"],
    "supplier": ["s_acctbal"],
}


#: mega-key collapses for the skew build: column → (modulus, SQL literal).
#: FK/value columns only — primary keys stay unique, so every query's id
#: arithmetic and dedup keeper conventions remain well-defined; what
#: changes is key-distribution: one user owns half the events stream, one
#: text owns a third of the corpus (a giant LSH bucket AND a giant CC
#: component), one part/customer becomes the hot join key.
SKEW = {
    "events": {"user_id": (2, "1")},
    "documents": {"text": (3, "'the same boilerplate page text repeated across the crawl'")},
    "lineitem": {"l_partkey": (4, "1")},
    "orders": {"o_custkey": (4, "1")},
    "customer": {"c_nationkey": (2, "1")},
    "embeddings": {"label": (3, "1")},
}

#: derived columns to recompute AFTER a skew collapse so they stay
#: consistent with the injected values (e.g. documents.n_chars is
#: length(text); leaving the original lengths on collapsed rows would
#: feed the n_chars-based keeper scoring unrealistic inputs).
SKEW_DERIVED = {
    "documents": {"n_chars": "length(text)"},
}


def build(dst: str, nulls: bool = False, skew: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if skew:
            targets = SKEW.get(t, {})
            if not targets:
                sel = f"SELECT * FROM '{SRC}/{t}.parquet'"
            else:
                cols = []
                desc = con.sql(
                    f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
                ).fetchall()
                for name, *_ in desc:
                    if name in targets:
                        mod, lit = targets[name]
                        cols.append(
                            f"CASE WHEN hash(rowid) % {mod} = 0 "
                            f"THEN {lit} ELSE {name} END AS {name}"
                        )
                    else:
                        cols.append(name)
                sel = (
                    f"SELECT {', '.join(cols)} FROM "
                    f"(SELECT *, row_number() OVER () AS rowid "
                    f"FROM '{SRC}/{t}.parquet')"
                )
                derived = SKEW_DERIVED.get(t)
                if derived:
                    repl = ", ".join(
                        f"{expr} AS {name}" for name, expr in derived.items()
                    )
                    sel = f"SELECT * REPLACE ({repl}) FROM ({sel})"
        elif not nulls:
            sel = f"SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0"
        else:
            cols = []
            desc = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
            targets = set(NULLABLE.get(t, []))
            for name, *_ in desc:
                if name in targets:
                    cols.append(
                        f"CASE WHEN hash(rowid) % 5 = 0 THEN NULL ELSE {name} END AS {name}"
                    )
                else:
                    cols.append(name)
            sel = (
                f"SELECT {', '.join(cols)} FROM "
                f"(SELECT *, row_number() OVER () AS rowid FROM '{SRC}/{t}.parquet')"
            )
        con.sql(f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")


def sweep(dst: str, label: str) -> int:
    from asakusafw_spark_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark(app_name=f"robustness_{label}")
    spark.sparkContext.setLogLevel("ERROR")
    fails = []
    ok = 0
    for name, fn in E.queries().items():
        try:
            fn(spark, dst).count()
            ok += 1
        except Exception as e:
            fails.append((name, str(e).split("\n")[0][:110]))
    print(f"[{label}] ok={ok} fail={len(fails)}")
    for n, m in fails:
        print(f"[{label}] FAIL {n} :: {m}")
    return len(fails)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    rc = 0
    if mode in ("empty", "both", "all"):
        build("/tmp/sf_empty", nulls=False)
        rc += sweep("/tmp/sf_empty", "empty")
    if mode in ("nulls", "both", "all"):
        build("/tmp/sf_nulls", nulls=True)
        rc += sweep("/tmp/sf_nulls", "nulls")
    if mode in ("skew", "all"):
        build("/tmp/sf_skew", skew=True)
        rc += sweep("/tmp/sf_skew", "skew")
    sys.exit(1 if rc else 0)


if __name__ == "__main__":
    main()
