#!/usr/bin/env python3
"""Oracle-coverage staleness report.

The driver's per-round CORRECTNESS file truncates (~8 KiB / ~50
entries) while 90+ queries are registered, so `queries()` ORDER decides
which queries get a fresh oracle row each round.  This tool reports,
for every registered query, the most recent round with a green row —
the input to next round's rotation (stalest first).

Usage: python tools/staleness.py   (run from the repo root)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # import the registry the same way the driver does (queries() builds
    # a plain dict of callables — no SparkSession needed)
    import __spark_entry__ as entry_mod

    registered = list(entry_mod.queries())

    last_green: dict[str, int] = {}
    ever_red: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        data = json.load(open(path))
        for name, row in data.items():
            ok = row.get("rows_match") and row.get("hash_match")
            if ok:
                last_green[name] = rnd
            else:
                ever_red[name] = rnd

    latest = max(
        (int(re.search(r"r(\d+)", p).group(1))
         for p in glob.glob("CORRECTNESS_r*.json")),
        default=0,
    )
    rows = sorted(
        registered, key=lambda q: (last_green.get(q, 0), q)
    )
    print(f"# registered={len(registered)}  latest round file=r{latest:02d}\n")
    print(f"{'query':34} {'last green':>10}  {'staleness':>9}  notes")
    for q in rows:
        lg = last_green.get(q)
        stale = "NEVER" if lg is None else str(latest - lg)
        note = ""
        if q in ever_red and ever_red[q] >= (lg or 0):
            note = f"RED in r{ever_red[q]:02d}"
        elif q in ever_red:
            note = f"(red r{ever_red[q]:02d}, fixed)"
        print(f"{q:34} {('r%02d' % lg) if lg else '—':>10}  {stale:>9}  {note}")
    never = [q for q in registered if q not in last_green]
    if never:
        print(f"\nqueries with NO green row yet (new this round): {never}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped into head — fine
        raise SystemExit(0)
