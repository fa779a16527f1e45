#!/usr/bin/env python3
"""Chaos-layout corpus (r16, VERDICT r15 Next #6): the same sf0.01
ROWS rewritten into a hostile PHYSICAL layout — the axis every standing
gate skips because they all read one tidy parquet file per table.

Production inputs are never tidy: ingest sprays thousands of small
files, compaction debt leaves 1-row row-groups, schema evolution leaves
shards with missing optional columns / narrower integer types /
re-ordered columns, and warehouse layouts are hive-partitioned
directories.  The engine paths with layout assumptions —
``read_parquet`` footer/nanos detection, schema resolution across
heterogeneous shards, ``ensure_parallelism`` file-listing width
estimation, the streaming staging sites — can only be tested by this
axis.

Per-table treatment (every transform is a physical rewrite of the same
rows; the one DELIBERATE logical change is the missing-``n_chars``
documents shard, which both engines must null-fill — the gate compares
engine vs oracle on the same files, so the null-fill itself is under
test):

- ``lineitem``  → 400 small files; the second half written with the
  column order REVERSED (by-name resolution, not by-position).
- ``orders``    → hive-partitioned directory ``o_orderpriority=…/``
  (partition column restored from directory names on both engines),
  several files per partition.
- ``documents`` → 200 small files; shard A with 1-ROW ROW-GROUPS,
  shard B MISSING the optional ``n_chars`` column (schema-evolved
  reader must null-fill), shard C with ``n_chars`` narrowed to INT32
  (readers must widen int32→int64).
- ``events``    → 64 small files, mixed row-group sizes (1000 vs 7),
  TIMESTAMP(NANOS) physical type preserved shard-by-shard.
- ``embeddings``→ 40 small files, one with 1-row row-groups.
- ``customer`` / ``supplier`` / ``part`` / ``nation`` → 8/8/16/3 small
  files (``nation`` stays glob-compatible: the directory itself matches
  the ``natio*.parquet`` DirectInput pattern).
- ``region``    → untouched single file (control).

The canonical full-width shard is always the LEXICOGRAPHICALLY FIRST
file in each directory, matching Spark's no-mergeSchema inference rule
(schema from the first part file) — the documented contract for
schema-evolved layouts here: evolution may APPEND shards with dropped /
narrowed columns, while the canonical schema stays discoverable first.

Usage:
  python tools/layout_corpus.py build [DST]   # default /tmp/sf_layout
  python tools/layout_corpus.py sweep [DST] [JSON]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.01"
DST = "/tmp/sf_layout"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _write_shards(table: pa.Table, out_dir: str, n_files: int,
                  row_group_size: "int | None" = None,
                  start: int = 0,
                  transform=None) -> None:
    """Split ``table`` into ``n_files`` equal slices named so they sort
    in slice order after any already-written shards (``start``)."""
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    per = max(1, (n + n_files - 1) // n_files)
    i = 0
    for off in range(0, n, per):
        sl = table.slice(off, per)
        if transform is not None:
            sl = transform(sl)
        pq.write_table(
            sl,
            f"{out_dir}/part-{start + i:05d}.parquet",
            row_group_size=row_group_size or 10_000,
            # version 2.6 keeps timestamp[ns] as TIMESTAMP(NANOS) —
            # the physical type the tidy corpus carries
            version="2.6",
        )
        i += 1


def build(dst: str = DST) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)

    for t in TABLES:
        src_file = f"{SRC}/{t}.parquet"
        if t == "region":
            shutil.copy(src_file, f"{dst}/region.parquet")  # control
            continue
        tab = pq.read_table(src_file)
        out = f"{dst}/{t}.parquet"

        if t == "lineitem":
            half = tab.num_rows // 2
            _write_shards(tab.slice(0, half), out, 200)
            rev = tab.slice(half).select(list(reversed(tab.column_names)))
            _write_shards(rev, out, 200, start=200)
        elif t == "orders":
            # hive layout on an existing column: drop it from the file,
            # restore it from the directory name (both engines)
            col = "o_orderpriority"
            for v in sorted(set(tab.column(col).to_pylist())):
                mask = pa.compute.equal(tab.column(col), pa.scalar(v))
                part = tab.filter(mask).drop([col])
                _write_shards(part, f"{out}/{col}={v}", 8)
        elif t == "documents":
            q = tab.num_rows // 4
            _write_shards(tab.slice(0, q), out, 50)                # canonical
            _write_shards(tab.slice(q, q), out, 1, row_group_size=1,
                          start=50)                                 # 1-row RGs
            _write_shards(tab.slice(2 * q, q).drop(["n_chars"]), out, 50,
                          start=51)                                 # missing col
            idx = tab.column_names.index("n_chars")
            narrowed = tab.slice(3 * q).set_column(
                idx, "n_chars", tab.slice(3 * q).column("n_chars").cast("int32")
            )
            _write_shards(narrowed, out, 50, start=101)             # int32 shard
        elif t == "events":
            half = tab.num_rows // 2
            _write_shards(tab.slice(0, half), out, 32, row_group_size=1000)
            _write_shards(tab.slice(half), out, 32, row_group_size=7,
                          start=32)
        elif t == "embeddings":
            _write_shards(tab.slice(0, tab.num_rows - 40), out, 39)
            _write_shards(tab.slice(tab.num_rows - 40), out, 1,
                          row_group_size=1, start=39)
        else:
            n = {"customer": 8, "supplier": 8, "part": 16, "nation": 3}[t]
            _write_shards(tab, out, n)

    # manifest: files per table, so the sweep log shows the hostility
    for t in TABLES:
        p = f"{dst}/{t}.parquet"
        if os.path.isdir(p):
            n = sum(len(fs) for _, _, fs in os.walk(p))
            print(f"{t:12s} {n:4d} files")
        else:
            print(f"{t:12s} single file (control)")


def sweep(dst: str = DST, json_out: str = "LOCAL_VERIFY_r16_layout.json") -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.call(
        [sys.executable, os.path.join(here, "tools", "verify_local.py"),
         "--json", json_out, dst],
    )


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "build"
    if cmd == "build":
        build(sys.argv[2] if len(sys.argv) > 2 else DST)
    elif cmd == "sweep":
        dst = sys.argv[2] if len(sys.argv) > 2 else DST
        out = sys.argv[3] if len(sys.argv) > 3 else "LOCAL_VERIFY_r16_layout.json"
        raise SystemExit(sweep(dst, out))
    else:
        raise SystemExit(f"unknown command {cmd!r}")
