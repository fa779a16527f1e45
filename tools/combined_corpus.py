#!/usr/bin/env python3
"""Combined adversarial corpus (r15): unicode × skew × nulls × extremes
stacked on one sf0.01 build — the INTERACTION axis the single-axis
gates never test (NaN values inside a mega-key skew bucket, NULL text
beside unicode shingles, boundary timestamps in a half-collapsed
stream, all at once).

Composition order: unicode injection (tools/unicode_corpus) → mega-key
skew collapse + 20% null injection (tools/robustness_sweep's SKEW /
NULLABLE specs, re-based onto the unicode build) → IEEE-754 / range
extremes (tools/extreme_corpus).  Each stage is the SAME deterministic
transform the standing gates use, so a divergence here is a genuine
interaction effect, not a new injection semantics.

Usage:
  python tools/combined_corpus.py build [DST]      # default /tmp/sf_combined
  python tools/combined_corpus.py sweep [DST] [JSON]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DST = "/tmp/sf_combined"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build(dst: str = DST) -> None:
    import tools.extreme_corpus as X
    import tools.robustness_sweep as R
    import tools.unicode_corpus as U

    t1, t2 = "/tmp/_comb_stage1", "/tmp/_comb_stage2"
    for d in (t1, t2, dst):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    # stage 1: unicode over sf0.01 (U.SRC default)
    U.build(t1)

    # stage 2: skew collapse THEN null injection, re-based onto stage 1
    con = duckdb.connect()
    for t in TABLES:
        base = f"(SELECT *, row_number() OVER () AS rowid FROM '{t1}/{t}.parquet')"
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{t1}/{t}.parquet'").fetchall()
        ]
        sel_cols = []
        skew = R.SKEW.get(t, {})
        nullable = set(R.NULLABLE.get(t, []))
        for name in cols:
            expr = name
            if name in skew:
                mod, lit = skew[name]
                expr = f"CASE WHEN hash(rowid) % {mod} = 0 THEN {lit} ELSE {expr} END"
            if name in nullable:
                expr = f"CASE WHEN hash(rowid * 7) % 5 = 0 THEN NULL ELSE {expr} END"
            sel_cols.append(f"{expr} AS {name}")
        sel = f"SELECT {', '.join(sel_cols)} FROM {base}"
        for dname, dexpr in R.SKEW_DERIVED.get(t, {}).items():
            sel = f"SELECT * REPLACE ({dexpr} AS {dname}) FROM ({sel})"
        con.sql(f"COPY ({sel}) TO '{t2}/{t}.parquet' (FORMAT PARQUET)")

    # stage 3: extremes re-based onto stage 2
    X.SRC = t2
    X.build(dst)
    print(f"built {dst} (unicode -> skew+nulls -> extremes)")


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
