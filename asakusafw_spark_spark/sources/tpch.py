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
      step          = (S//4 + p//S) % S, clamped to 1 when 0
      ps_suppkey    = (p + i*step) % S                 (0-based keys)
      ps_availqty   = (p*7 + s*13) % 9999 + 1          in [1, 9999]
      ps_supplycost = ((p*31 + s*17) % 99900 + 100)/100.0
                                                       in [1.00, 1000.99]

All divisions are INTEGER divisions on both engines (Spark ``div``,
DuckDB ``//``) — double-division rounding would diverge once
``p/S`` crosses 2^52/S.  The step clamp keeps the four suppkeys per
part DISTINCT (step ≡ 0 mod S would collide all four, violating the
partsupp PK the composites assume — q2 min ties, q9 fan-out, q16
countDistinct).

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
    # integer step: (S//4 + p div S) % S, clamped away from 0 so the
    # four per-part suppkeys never collide (all-integer arithmetic —
    # `div`, not `/` — so Spark and DuckDB agree bit-for-bit at any key
    # magnitude)
    step_raw = (
        F.lit(s_cnt // 4) + F.expr(f"ps_partkey div {s_cnt}")
    ) % F.lit(s_cnt)
    step = F.when(step_raw == 0, F.lit(1)).otherwise(step_raw)
    ps0 = (
        part.select(F.col("p_partkey").alias("ps_partkey"))
        .select(
            "ps_partkey",
            F.explode(F.array(*[F.lit(i).cast("long") for i in range(4)])).alias(
                "__i"
            ),
        )
        .select(
            "ps_partkey",
            ((F.col("ps_partkey") + F.col("__i") * step) % F.lit(s_cnt)).alias(
                "ps_suppkey"
            ),
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
                       (p_partkey + g.i *
                        (CASE WHEN (s // 4 + p_partkey // s) % s = 0 THEN 1
                              ELSE (s // 4 + p_partkey // s) % s END)) % s
                           AS ps_suppkey
                FROM part, __scnt,
                     (SELECT UNNEST(range(4)) AS i) g
            )
        )
    """
