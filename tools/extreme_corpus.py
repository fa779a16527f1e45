#!/usr/bin/env python3
"""Extreme-numerics robustness corpus (r15 proactive axis, following
the nulls → skew → empty → 10× → unicode program).

Rebuilds sf0.01 with IEEE-754 edge values and range-boundary keys
injected deterministically into the events and embeddings tables —
the two tables whose value columns flow through percentile/winsorize
math, streaming aggregates, sketches (theta/KLL/CMS), LOCF resampling,
quality constraints, and vector similarity:

- ``events.value``: NaN, +Inf, -Inf, -0.0, DBL_MAX, the smallest
  subnormal (~3%% of rows in total) — exercises NaN ordering, decimal
  exact-sum casts, percentile sketches, constraint predicates.
- ``events.ts``: year-0001 and year-9999 timestamps on a few rows —
  exercises session/window arithmetic and epoch conversions far from
  the data's era.
- ``events.user_id``: int64 MAX / MIN+2 on a few rows — hash
  partitioning, join keys and session keys at the integer boundary.
- ``embeddings.embedding``: NaN or +Inf planted in component 0 of
  ~1.5%% of vectors — cosine/dot math propagation and top-k ordering
  with non-finite scores.

Everything else is byte-identical to sf0.01 (scope control: lineitem /
orders revenue columns stay finite so the TPC-H family pins its
existing contracts; the extremes axis is about the VALUE/VECTOR paths).

Usage:
  python tools/extreme_corpus.py build [DST]          # default /tmp/sf_extreme
  python tools/extreme_corpus.py sweep [DST] [JSON]
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.01"
DST = "/tmp/sf_extreme"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

VALUE_CASE = """
CASE hash(rowid) % 200
  WHEN 0 THEN 'NaN'::DOUBLE
  WHEN 1 THEN 'Infinity'::DOUBLE
  WHEN 2 THEN '-Infinity'::DOUBLE
  WHEN 3 THEN -0.0
  WHEN 4 THEN 1.7976931348623157e308
  WHEN 5 THEN 4.9406564584124654e-324
  ELSE value
END
"""

TS_CASE = """
CASE hash(rowid) % 500
  WHEN 6 THEN TIMESTAMP '0001-01-03 00:00:00'
  WHEN 7 THEN TIMESTAMP '9999-12-30 23:59:59'
  ELSE ts
END
"""

UID_CASE = """
CASE hash(rowid) % 500
  WHEN 8 THEN 9223372036854775807
  WHEN 9 THEN -9223372036854775806
  ELSE user_id
END
"""

EMB_CASE = """
CASE
  WHEN embedding IS NULL THEN NULL
  WHEN hash(rowid) % 128 = 0 THEN list_prepend('NaN'::FLOAT, embedding[2:])
  WHEN hash(rowid) % 128 = 1 THEN list_prepend('Infinity'::FLOAT, embedding[2:])
  WHEN hash(rowid) % 128 = 2 THEN list_prepend(NULL::FLOAT, embedding[2:])
  ELSE embedding
END
"""
# % 128 = 2: a NULL ELEMENT inside an otherwise-finite vector — the 3VL
# edge the r15 ADVICE flagged (Spark forall → NULL vs DuckDB bool_and
# skips NULLs); quantize/similarity paths must exclude it EXPLICITLY on
# both sides, and only a corpus row can prove they do.


def build(dst: str = DST) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        base = f"(SELECT *, row_number() OVER () AS rowid FROM '{SRC}/{t}.parquet')"
        if t == "events":
            sel = (
                f"SELECT event_id, {TS_CASE} AS ts, {UID_CASE} AS user_id, "
                f"event_type, {VALUE_CASE} AS value, props FROM {base}"
            )
        elif t == "embeddings":
            cols = [
                r[0]
                for r in con.sql(
                    f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
                ).fetchall()
            ]
            repl = [
                f"{EMB_CASE} AS embedding" if c == "embedding" else c
                for c in cols
            ]
            sel = f"SELECT {', '.join(repl)} FROM {base}"
        else:
            con.sql(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
            continue
        con.sql(
            f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"built {dst}")


def sweep(dst: str = DST, json_out: str | None = None) -> int:
    cmd = [sys.executable, "tools/verify_local.py"]
    if json_out:
        cmd += ["--json", json_out]
    cmd.append(dst)
    return subprocess.call(cmd)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    if mode == "build":
        build(sys.argv[2] if len(sys.argv) > 2 else DST)
    elif mode == "sweep":
        dst = sys.argv[2] if len(sys.argv) > 2 else DST
        out = sys.argv[3] if len(sys.argv) > 3 else None
        raise SystemExit(sweep(dst, out))
    else:
        raise SystemExit("usage: build [DST] | sweep [DST] [JSON]")
