"""Data-quality constraint checking — the dbt-test / Deequ surface a
production pipeline runs before trusting an input or publishing an
output.

Design for 100 TB: every ROW-LOCAL constraint (not-null, accepted
values, numeric range, custom predicate) folds into ONE conditional-sum
aggregate, so N such checks cost a single scan with map-side partial
aggregation — never N passes.  Key uniqueness is one groupBy on the
key; referential integrity is one left-anti join per foreign key
(broadcast when the referenced key set is small, shuffled equi-join
otherwise).  The report is a slim (constraint, violations) frame —
rows ∝ number of checks, never data size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def check_constraints(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    accepted_values: "dict[str, Sequence] | None" = None,
    ranges: "dict[str, tuple] | None" = None,
    where: "dict[str, Column] | None" = None,
    foreign_keys: "Sequence[tuple] | None" = None,
) -> DataFrame:
    """Evaluate a constraint suite against ``df`` and return one row
    per constraint: ``(constraint string, violations long)`` — 0 means
    the constraint holds.

    - ``not_null``: columns that must never be null;
    - ``unique``: key column lists that must identify rows uniquely
      (violations = rows beyond the first per duplicated key);
    - ``accepted_values``: column → allowed value list (nulls pass —
      pair with ``not_null`` to forbid them);
    - ``ranges``: column → (lo, hi) inclusive bounds (nulls pass);
    - ``where``: name → boolean Column; violations = rows where FALSE
      (the custom-predicate escape hatch, still scan-stage);
    - ``foreign_keys``: (cols, ref_df, ref_cols) triples; violations =
      rows whose (non-null) key has no match in ``ref_df`` — checked
      with a LEFT ANTI equi-join (Catalyst broadcasts small ref sides).
    """
    row_checks: list[tuple[str, Column]] = []
    for c in not_null:
        row_checks.append((f"not_null({c})", F.col(c).isNull()))
    for c, vals in (accepted_values or {}).items():
        row_checks.append(
            (f"accepted_values({c})",
             F.col(c).isNotNull() & ~F.col(c).isin(list(vals)))
        )
    for c, (lo, hi) in (ranges or {}).items():
        row_checks.append(
            (f"range({c})",
             F.col(c).isNotNull() & ~F.col(c).between(lo, hi))
        )
    for name, cond in (where or {}).items():
        row_checks.append((f"where({name})", ~F.coalesce(cond, F.lit(False))))

    reports: list[DataFrame] = []
    spark = df.sparkSession
    if row_checks:
        # all row-local checks in ONE pass: conditional sums over one scan
        agg = df.agg(
            *[
                F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"__c{i}__")
                for i, (_, cond) in enumerate(row_checks)
            ]
        )
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint"),
                        F.coalesce(F.col(f"__c{i}__"), F.lit(0)).alias("violations"),
                    )
                    for i, (name, _) in enumerate(row_checks)
                ]
            )
        )
        reports.append(agg.select(stack.alias("r")).select("r.*"))

    for key in unique:
        keys = [key] if isinstance(key, str) else list(key)
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__n__"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__n__") > 1, F.col("__n__") - 1)), F.lit(0)
                ).cast("long").alias("violations")
            )
            .select(
                F.lit(f"unique({','.join(keys)})").alias("constraint"),
                "violations",
            )
        )
        reports.append(dup)

    for cols, ref_df, ref_cols in foreign_keys or ():
        cols = [cols] if isinstance(cols, str) else list(cols)
        ref_cols = [ref_cols] if isinstance(ref_cols, str) else list(ref_cols)
        probe = df.select(*cols).na.drop(subset=cols)
        ref = ref_df.select(
            *[F.col(r).alias(f"__fk_{i}__") for i, r in enumerate(ref_cols)]
        )
        cond = None
        for i, c in enumerate(cols):
            e = F.col(c) == F.col(f"__fk_{i}__")
            cond = e if cond is None else (cond & e)
        orphans = probe.join(ref, cond, "left_anti").agg(
            F.count(F.lit(1)).cast("long").alias("violations")
        ).select(
            F.lit(
                f"foreign_key({','.join(cols)}->{','.join(ref_cols)})"
            ).alias("constraint"),
            "violations",
        )
        reports.append(orphans)

    if not reports:
        return spark.createDataFrame([], "constraint string, violations long")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def assert_constraints(df: DataFrame, **kwargs) -> None:
    """Run :func:`check_constraints` and raise ``ValueError`` listing
    every violated constraint (the CI/pipeline-gate form)."""
    bad = [
        (r["constraint"], r["violations"])
        for r in check_constraints(df, **kwargs).collect()
        if r["violations"] > 0
    ]
    if bad:
        raise ValueError(
            "constraint violations: "
            + "; ".join(f"{c}={n}" for c, n in bad)
        )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit: one row per distinct quasi-identifier
    combination with its ``group_size`` and an ``anonymous`` flag
    (``group_size >= k``) — the measurement half of the
    release-readiness check a training-data pipeline runs before
    shipping data containing quasi-identifiers (location + demographic
    + segment columns that re-identify in combination even when no
    single column does).

    Scale shape: ONE partial-aggregable hash aggregate (a slim row per
    distinct combination crosses the shuffle); NULL values form groups
    exactly like SQL ``GROUP BY``.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .withColumn("anonymous", F.col("group_size") >= F.lit(int(k)))
    )


def suppress_rare_groups(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    method: str = "suppress",
) -> DataFrame:
    """Baseline k-anonymity enforcement: rows whose quasi-identifier
    combination occurs fewer than ``k`` times either get those columns
    NULLed (``method="suppress"`` — the row survives, the identifying
    combination does not) or are dropped (``method="drop"``).  All
    other columns and rows pass through untouched.

    Implementation is a WINDOW count over the quasi-identifier
    partition — one shuffle of the data, no join-back, no second scan;
    NULL quasi-values partition together like SQL.  This is
    suppression-only k-anonymity (the portable, exactly-verifiable
    core); generalization hierarchies (coarsening values instead of
    NULLing them) are policy-specific — express them as ordinary
    column expressions BEFORE calling this, e.g. truncate zip codes or
    bucket ages, then suppress what still falls below ``k``.
    """
    from pyspark.sql import Window

    quasi = list(quasi_cols)
    if method not in ("suppress", "drop"):
        raise ValueError(
            f"suppress_rare_groups: unknown method {method!r} "
            "(expected 'suppress' or 'drop')"
        )
    size = F.count(F.lit(1)).over(Window.partitionBy(*quasi))
    if method == "drop":
        return (
            df.withColumn("__group_size", size)
            .filter(F.col("__group_size") >= F.lit(int(k)))
            .drop("__group_size")
        )
    keep = size >= F.lit(int(k))
    return df.select(
        *[
            F.when(keep, F.col(c)).otherwise(F.lit(None)).alias(c)
            if c in quasi
            else F.col(c)
            for c in df.columns
        ]
    )
