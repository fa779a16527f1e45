"""Deterministic PARTSUPP synthesis.

The driver testdata ships the TPC-H-ish tables without ``partsupp``,
which blocks the partsupp-dependent composites (Q2/Q9/Q11/Q16/Q20 in
the reference's query battery).  Rather than materializing a parquet
file Spark and DuckDB would both have to read (a side-channel the
correctness gate can't see), partsupp is DERIVED from ``part`` and
``supplier`` with pure integer arithmetic that both engines evaluate
bit-identically:

  for each part, 4 supplier links (the TPC-H spec's own fan-out,
  dbgen ``mk_part``):
      ps_suppkey    = (p + p//S + (i*S)//4) % S        (0-based keys)
      ps_availqty   = (p*7 + s*13) % 9999 + 1          in [1, 9999]
      ps_supplycost = ((p*31 + s*17) % 99900 + 100)/100.0
                                                       in [1.00, 1000.99]

All divisions are INTEGER divisions on both engines (Spark ``div``,
DuckDB ``//``) — double-division rounding would diverge once
``p/S`` crosses 2^52/S.  The per-link offsets ``(i*S)//4`` are
UNCONDITIONALLY distinct mod S for any S ≥ 4 (strictly increasing,
all < S), and the part-dependent term only rotates all four — so the
(partkey, suppkey) PK the composites assume (q2 min ties, q9 fan-out,
q16 countDistinct) holds for EVERY supplier count, proven by a
hypothesis property test.  (An earlier stride scheme
``(p + i·step) % S`` collided whenever ``d·step ≡ 0 mod S`` for
d ∈ {1,2,3} — e.g. S=4, step=2 — which a zero-clamp alone cannot
prevent; hypothesis found the counterexample.)  S < 4 is degenerate
(4 links over fewer suppliers cannot be distinct) and outside the
contract.

``S`` is the supplier count (one scalar driver round-trip — same
bounded-probe budget as the IVF quantizer sample; pass ``s_cnt`` to
amortize it across a sweep that builds several composites).  ``ps_supplycost``
is a double whose value is an exact cents quotient, so both engines
produce identical IEEE-754 bits; aggregate it with the exact-decimal
sum trick like every other monetary double in the suite.

Scale shape: one narrow projection + a 4-row explode over ``part`` —
no shuffle, no data scan beyond the part table, output 4x part rows.
The oracle twin (`partsupp_cte`) is the same arithmetic as a SQL CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["synthesize_partsupp", "partsupp_cte"]


def synthesize_partsupp(
    part: DataFrame, supplier: DataFrame, s_cnt: "int | None" = None
) -> DataFrame:
    """``partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost)``
    derived deterministically from ``part`` x ``supplier`` (see module
    docstring for the formulas and the cross-engine determinism
    argument).  ``s_cnt`` short-circuits the supplier ``count()`` probe
    when the caller already knows it (one count per sweep, not one per
    composite)."""
    if s_cnt is None:
        s_cnt = int(supplier.count())
    # per-link offsets (i*S)//4 are unconditionally distinct mod S for
    # S >= 4; the part term (p + p div S) only rotates them — PK holds
    # for every supplier count (all-integer arithmetic — `div`, not
    # `/` — so Spark and DuckDB agree bit-for-bit at any key magnitude)
    rot = F.col("ps_partkey") + F.expr(f"ps_partkey div {s_cnt}")
    ps0 = (
        part.select(F.col("p_partkey").alias("ps_partkey"))
        .select(
            "ps_partkey",
            F.explode(
                F.array(
                    *[F.lit((i * s_cnt) // 4).cast("long") for i in range(4)]
                )
            ).alias("__off"),
        )
        .select(
            "ps_partkey",
            ((rot + F.col("__off")) % F.lit(s_cnt)).alias("ps_suppkey"),
        )
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9999 + 1
        ).alias("ps_availqty"),
        (
            (
                (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 99900
                + 100
            ).cast("double")
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )


def partsupp_cte() -> str:
    """DuckDB CTE body computing the identical partsupp relation — embed
    as ``WITH {partsupp_cte()} SELECT ...`` in oracle SQL."""
    return """
        __scnt AS (SELECT COUNT(*) AS s FROM supplier),
        partsupp AS (
            SELECT ps_partkey, ps_suppkey,
                   (ps_partkey*7 + ps_suppkey*13) % 9999 + 1 AS ps_availqty,
                   CAST((ps_partkey*31 + ps_suppkey*17) % 99900 + 100
                        AS DOUBLE) / 100 AS ps_supplycost
            FROM (
                SELECT p_partkey AS ps_partkey,
                       (p_partkey + p_partkey // s + (g.i * s) // 4) % s
                           AS ps_suppkey
                FROM part, __scnt,
                     (SELECT UNNEST(range(4)) AS i) g
            )
        )
    """
