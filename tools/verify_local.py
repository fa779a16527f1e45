#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, schema
(column names), and an order-insensitive value hash.

Usage: python tools/verify_local.py [sf_dir] [query ...]
       python tools/verify_local.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes a driver-CORRECTNESS-shaped report for
EVERY query (rows_match / schema_match / hash_match / row counts) — the
committed artifact that covers the full registry when the driver's own
report window truncates.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype == object:
            # bytes / arrays → repr strings for stable sorting
            pdf[c] = s.map(lambda v: repr(v) if isinstance(v, (bytes, list)) else v)
        elif str(s.dtype).startswith("datetime64"):
            pdf[c] = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) else s
    return pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = normalize(pdf.copy())
    h = hashlib.sha256()
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype == "float64" or s.dtype == "float32":
            # Full-precision repr — the driver hashes floats exactly, so a
            # looser local hash (the old %.9g) can claim green on a query
            # the driver will fail.  repr() round-trips float64 (17 sig
            # digits), making this gate at least as strict as the driver's.
            vals = s.map(lambda v: "null" if pd.isna(v) else repr(float(v)))
        else:
            vals = s.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
        h.update(("\x01".join(vals.astype(str)) + "\x02" + c).encode())
    return h.hexdigest()[:16]


def _collect_spark(df) -> pd.DataFrame:
    """Collect a Spark result for comparison, hashing TIMESTAMP columns
    as epoch-microsecond int64.  pandas' datetime64[ns] bridge only
    covers years 1677–2262; a year-0001 or year-9999 timestamp (legal
    in both engines, exercised by the extreme-numerics corpus) blows up
    toPandas with an Arrow out-of-bounds cast.  Epoch micros are exact,
    total-range, and engine-neutral (``_collect_duck`` mirrors this
    with ``epoch_us``; session TZ is UTC so ntz wall clocks agree)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (TimestampType, TimestampNTZType, DateType)):
            cols.append(
                F.unix_micros(F.col(f.name).cast("timestamp")).alias(f.name)
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols).toPandas()


def _collect_duck(con, sql: str) -> pd.DataFrame:
    """Run an oracle twin, converting TIMESTAMP outputs to epoch-micros
    int64 (see _collect_spark) before the pandas bridge."""
    cur = con.execute(f"DESCRIBE ({sql})")
    repl = []
    for name, typ, *_ in cur.fetchall():
        t = str(typ).upper()
        if t.startswith("TIMESTAMP"):
            repl.append(f"epoch_us({name}) AS {name}")
        elif t == "DATE":
            # dates ride the same epoch-int contract (midnight UTC),
            # pairing with Spark DATE/TIMESTAMP columns either way
            repl.append(f"epoch_us(CAST({name} AS TIMESTAMP)) AS {name}")
    if repl:
        sql = f"SELECT * REPLACE ({', '.join(repl)}) FROM ({sql})"
    return con.execute(sql).df()


def observed_cap_metrics(df) -> "dict | None":
    """Named ``_observe_cap`` observations from the EXECUTED plan
    (VERDICT r13 Next #8): per-query dropped-bucket / largest-bucket
    numbers recorded into the sweep JSON so silent recall loss from the
    max_bucket keep-filters is auditable round over round, not just
    visible in the Spark UI.  Returns {observation: {metric: value}},
    or None when the plan carries no observations."""
    try:
        jm = df._jdf.queryExecution().observedMetrics()
        out = {}
        it = jm.iterator()
        while it.hasNext():
            kv = it.next()
            import json as _json

            out[kv._1()] = _json.loads(kv._2().json())
        return out or None
    except Exception as e:
        # ADVICE r14: a silently-disabled audit channel looks like a
        # clean sweep with no cap data and no signal why — warn once.
        if not getattr(observed_cap_metrics, "_warned", False):
            observed_cap_metrics._warned = True
            print(f"WARN observed_cap_metrics disabled (API drift?): "
                  f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
        return None


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    if sf_dir.startswith("-"):
        # a typo'd flag silently becoming the sf dir once made the whole
        # sweep a 0-query no-op that still printed "N/N green"
        raise SystemExit(f"verify_local: unknown flag {sf_dir!r} "
                         "(usage: verify_local.py [--json OUT] [sf_dir] [query ...])")
    only = set(args[1:])

    import __spark_entry__ as entry_mod
    from asakusafw_spark_spark.session import engine_builder

    spark = engine_builder(app_name="verify_local").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    # bound the oracle engine: heavyweight twins (minhash-in-SQL over
    # sf1-scale documents) must SPILL, not trip the OOM killer — an
    # OOM kill takes the whole sweep down with no FAIL row (observed:
    # the r09 sf1 sweep died silently at 89 GB on dedup_incremental)
    con.execute("SET memory_limit = '48GB'")
    con.execute("SET temp_directory = '/tmp/duckdb_verify_spill'")
    con.execute("SET preserve_insertion_order = false")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # chaos-layout corpus (r16): a table may be a DIRECTORY of
            # part files — schema-evolved shards (missing / narrowed
            # columns, reordered) and hive partition dirs included.
            # union_by_name resolves shards by NAME and widens types;
            # hive_partitioning restores directory-encoded columns —
            # the DuckDB twins of what the Spark side must also do.
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
                f"'{p}/**/*.parquet', union_by_name=true, "
                f"hive_partitioning=true)"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # Release the dedup/similarity/graph families' persisted
    # intermediates between queries: within a shared batch JVM the
    # banded/signature caches of one query otherwise stay pinned
    # through every later query (Spark's CacheManager holds blocks
    # until explicit unpersist).  This is HARNESS HYGIENE — it makes
    # each row's `sec` independent of batch composition — NOT a perf
    # fix for any specific row: the r12 scrub_spans 155.9s-vs-4.5s gap
    # was first blamed on this eviction pressure, but the release did
    # not move the row; the standalone 4.5 s probe was count()-pruned
    # (see SCALING.md "a diagnosis corrected" — the real cost is the
    # clean-column expression chain, only visible under full
    # materialization).  Each query's result is fully materialized
    # (toPandas) before release, so this is correctness-neutral by
    # construction.
    from asakusafw_spark_spark.functions.dedup import (
        release_cached_intermediates,
    )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        raise SystemExit(f"verify_local: unknown queries {sorted(unknown)}")
    failures = []
    report: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        release_cached_intermediates()
        t0 = time.time()
        try:
            _df = fn(spark, sf_dir)
            sdf = _collect_spark(_df)
            caps = observed_cap_metrics(_df)
        except Exception as e:
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": str(e)[:200]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            report[name] = {"rows_only": True, "spark_rows": len(sdf), "err": None,
                            "sec": round(time.time() - t0, 1)}
            if caps:
                report[name]["cap_metrics"] = caps
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = _collect_duck(con, oracles[name])
        except Exception as e:
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"duckdb: {str(e)[:200]}"}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"value-hash {hs} vs {ho}")
                # show a diff sample
                a, b = normalize(sdf.copy()), normalize(odf.copy())
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    print(f"  first diff row {i}:\n   spark: {a.loc[i].to_dict()}\n   duck : {b.loc[i].to_dict()}")
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(sdf.columns) == sorted(odf.columns)
        report[name] = {
            "rows_match": rows_ok,
            "schema_match": schema_ok,
            "hash_match": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": None,
            # wall seconds for Spark run + oracle run + compare: makes
            # the sweep artifacts self-profiling (the r11 verdict had to
            # quote pre-check logs for the sf1 heavy rows)
            "sec": round(time.time() - t0, 1),
        }
        if caps:
            report[name]["cap_metrics"] = caps
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    # count what actually RAN — the old len(qs)-based footer printed
    # "N/N green" even when a filter matched nothing and zero queries ran
    ran = len(report)
    print(f"\n{ran - len(failures)}/{ran} green "
          f"({len(qs)} registered{'' if ran == len(qs) else ', FILTERED RUN'})")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "n_queries": len(qs),
                 "n_green": len(qs) - len(failures), "queries": report},
                f, indent=1,
            )
        print(f"report written: {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
