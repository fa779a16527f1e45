#!/usr/bin/env python3
"""Unicode/multibyte robustness corpus (VERDICT r14 Next #6).

Rebuilds the sf0.01 tables with mixed CJK / emoji (incl. ZWJ + flag
sequences) / combining-character / RTL / full-width text injected into
every text column a registered query reads, then the standard strict
value-hash sweep (tools/verify_local.py) runs the full registry against
DuckDB on the SAME corpus.  This probes the engine-specific unicode
edges between Spark and DuckDB the ASCII corpora never touch:
tokenization regexes, shingling, ``levenshtein``, ``length()``
(byte vs codepoint), URL canonicalization, case normalization, JSON
string escaping, and binary-vs-collated ordering.

Injection is DETERMINISTIC (keyed on ``hash(rowid)``), per-row:
- ``documents.text``: ~50%% of rows get a unicode segment appended
  (mixed-script docs), ~12%% are fully replaced (unicode-only docs);
  ``n_chars`` is recomputed so the keeper-scoring invariant holds.
- ``documents.lang``: rows that gained CJK/RTL text get a matching tag.
- ``customer.c_name``, ``part.p_type`` / ``p_brand``,
  ``events.event_type``, ``events.props`` (a JSON string value),
  ``orders.o_orderpriority``: a deterministic minority of rows get
  unicode variants — group/join keys and LIKE targets with multibyte
  content, while enough ASCII rows survive for selective filters to
  still select.

Usage:
  python tools/unicode_corpus.py build [DST]          # default /tmp/sf_unicode
  python tools/unicode_corpus.py sweep [DST] [JSON]   # verify_local full sweep
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.01"
DST = "/tmp/sf_unicode"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: the five unicode stress classes, rotated deterministically.  NFC and
#: NFD spellings of the same grapheme both appear (café twice), plus
#: ZWJ emoji families, regional-indicator flags, Arabic/Hebrew RTL with
#: an LRM mark, and full-width Latin + ligatures + sharp-s casing.
SEGMENTS = [
    "漢字テキスト 中文混合測試 カタカナひらがな",
    "emoji 😀🚀🎉 family 👨‍👩‍👧‍👦 flag 🇯🇵 ok",
    "café café à la française naïve",
    "مرحبا بالعالم ‎שלום עולם rtl mixed",
    "ＦＵＬＬｗｉｄｔｈ １２３ ﬁﬂ ß ẞ",
]


def _seg(expr: str) -> str:
    """SQL CASE rotating the 5 segments on a deterministic hash."""
    arms = " ".join(
        f"WHEN {expr} % 5 = {i} THEN '{s}'" for i, s in enumerate(SEGMENTS)
    )
    return f"(CASE {arms} END)"


def build(dst: str = DST) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        base = f"(SELECT *, row_number() OVER () AS rowid FROM '{SRC}/{t}.parquet')"
        if t == "documents":
            seg = _seg("hash(rowid)")
            text = (
                "CASE "
                f"WHEN hash(rowid) % 8 = 0 THEN {seg} "  # unicode-only doc
                f"WHEN hash(rowid) % 2 = 0 THEN text || ' ' || {seg} "
                "ELSE text END"
            )
            lang = (
                "CASE WHEN hash(rowid) % 8 = 0 THEN "
                "(CASE hash(rowid) % 5 WHEN 0 THEN 'ja' WHEN 1 THEN 'und' "
                "WHEN 2 THEN 'fr' WHEN 3 THEN 'ar' ELSE 'und' END) "
                "ELSE lang END"
            )
            sel = (
                f"SELECT doc_id, txt AS text, {lang} AS lang, source, "
                f"length(txt) AS n_chars FROM "
                f"(SELECT *, {text} AS txt FROM {base})"
            )
        elif t == "customer":
            name = (
                f"CASE WHEN hash(rowid) % 4 = 0 THEN c_name || ' ' || {_seg('hash(rowid)')} "
                "ELSE c_name END"
            )
            sel = (
                f"SELECT c_custkey, {name} AS c_name, c_nationkey, "
                f"c_acctbal, c_mktsegment FROM {base}"
            )
        elif t == "part":
            sel = (
                "SELECT * REPLACE ("
                "CASE WHEN hash(rowid) % 5 = 0 THEN p_type || ' 素材' ELSE p_type END AS p_type, "
                "CASE WHEN hash(rowid) % 7 = 0 THEN p_brand || '™' ELSE p_brand END AS p_brand) "
                f"FROM {base}"
            )
        elif t == "events":
            etype = (
                "CASE WHEN hash(rowid) % 6 = 0 THEN event_type || '·确认' "
                "ELSE event_type END"
            )
            props = (
                "CASE WHEN hash(rowid) % 5 = 0 AND json_valid(props) "
                "THEN json_merge_patch(props, '{\"note\": \"備考😀 — ok\"}')::VARCHAR "
                "ELSE props END"
            )
            sel = (
                f"SELECT event_id, ts, user_id, {etype} AS event_type, "
                f"value, {props} AS props FROM {base}"
            )
        elif t == "orders":
            sel = (
                "SELECT * REPLACE (CASE WHEN hash(rowid) % 6 = 0 "
                "THEN o_orderpriority || ' 優先' ELSE o_orderpriority END "
                f"AS o_orderpriority) FROM {base}"
            )
        else:
            sel = f"SELECT * FROM '{SRC}/{t}.parquet'"
            con.sql(f"COPY ({sel}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
            continue
        # strip the helper rowid
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        con.sql(
            f"COPY (SELECT {', '.join(cols)} FROM ({sel})) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
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
