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
      ps_suppkey    = (p + i*(S/4 + p/S)) % S          (0-based keys)
      ps_availqty   = (p*7 + s*13) % 9999 + 1          in [1, 9999]
      ps_supplycost = ((p*31 + s*17) % 99900 + 100)/100.0
                                                       in [1.00, 1000.99]

``S`` is the supplier count (one scalar driver round-trip — same
bounded-probe budget as the IVF quantizer sample).  ``ps_supplycost``
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


def synthesize_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """``partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost)``
    derived deterministically from ``part`` x ``supplier`` (see module
    docstring for the formulas and the cross-engine determinism
    argument)."""
    s_cnt = int(supplier.count())
    # integer step: S/4 + p/S (both floor divisions)
    step = F.lit(s_cnt // 4) + F.floor(
        F.col("ps_partkey") / F.lit(s_cnt)
    ).cast("long")
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
                       (p_partkey + g.i * (s // 4 + p_partkey // s)) % s
                           AS ps_suppkey
                FROM part, __scnt,
                     (SELECT UNNEST(range(4)) AS i) g
            )
        )
    """
