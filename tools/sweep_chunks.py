#!/usr/bin/env python3
"""Split a full verify_local sweep into N balanced chunks (greedy
longest-processing-time over the previous artifact's ``sec`` column) so
each chunk fits a bounded runner slot, then merge the chunk reports
into one LOCAL_VERIFY-shaped artifact.

Usage:
  python tools/sweep_chunks.py plan N [prev_artifact]   # print chunk query lists
  python tools/sweep_chunks.py merge OUT.json CHUNK.json...
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan(n: int, prev: str) -> None:
    import __spark_entry__ as E

    names = list(E.queries())
    secs = {}
    if os.path.exists(prev):
        secs = {k: v.get("sec", 1.0) or 1.0
                for k, v in json.load(open(prev))["queries"].items()}
    buckets = [[0.0, []] for _ in range(n)]
    for q in sorted(names, key=lambda q: -secs.get(q, 1.0)):
        b = min(buckets, key=lambda x: x[0])
        b[0] += secs.get(q, 1.0)
        b[1].append(q)
    for i, (tot, qs) in enumerate(buckets):
        print(f"CHUNK{i}\t{tot:.0f}\t{' '.join(qs)}")


def merge(out: str, chunks: list[str]) -> None:
    queries: dict = {}
    sf_dir = None
    for c in chunks:
        d = json.load(open(c))
        sf_dir = d.get("sf_dir", sf_dir)
        queries.update(d["queries"])
    # ADVICE r14: a missing chunk yields a merged artifact with fewer
    # queries that still prints green counts — validate coverage
    # against the live registry and fail loudly on gaps.
    import __spark_entry__ as E

    registered = set(E.queries())
    missing = sorted(registered - set(queries))
    extra = sorted(set(queries) - registered)
    if missing:
        print(f"MISSING {len(missing)} queries (incomplete chunk set?): "
              f"{' '.join(missing)}")
        raise SystemExit(1)
    if extra:
        print(f"note: {len(extra)} merged queries no longer registered: "
              f"{' '.join(extra)}")
    n_green = sum(
        1 for v in queries.values()
        if v.get("hash_match") or v.get("rows_only")
    )
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_queries": len(queries),
                   "n_green": n_green, "queries": queries}, f, indent=1)
    print(f"merged {len(chunks)} chunks -> {out}: {n_green}/{len(queries)} green")


if __name__ == "__main__":
    if sys.argv[1] == "plan":
        plan(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "LOCAL_VERIFY_sf1.json")
    elif sys.argv[1] == "merge":
        merge(sys.argv[2], sys.argv[3:])
    else:
        raise SystemExit("usage: plan N [prev] | merge OUT chunks...")
