"""Group-kind operators (SURVEY.md §2.3): Summarize, Fold, CoGroup, GroupSort.

Reference semantics:

- @Summarize — declarative per-key aggregation with fold kinds
  ANY / SUM / COUNT / MAX / MIN
  (compiler/.../operator/aggregation/SummarizeAggregationCompiler.scala:105-230).
- @Fold — user-defined associative fold of same-typed records per key,
  with optional partial (map-side) reduction
  (compiler/.../operator/aggregation/FoldAggregationCompiler.scala).
- @CoGroup / @GroupSort — N co-partitioned inputs, each group's records
  delivered as N per-input-sorted lists; the user emits arbitrary rows
  (runtime/.../graph/CoGroup.scala:28-78, fragment/user/
  CoGroupOperatorFragment.scala:28-63).

Scale design:

- ``summarize`` lowers to a native ``groupBy().agg()`` — Catalyst runs
  partial (map-side) aggregation + final merge, the exact analogue of the
  reference's ``PARTIAL`` combiner path (Aggregate.scala:47-101), with
  Tungsten spill for large key spaces.
- ``fold`` with native expressions gets the same partial aggregation.
  The Python-callable path uses ``applyInPandas``; groups must fit in
  executor memory (the reference's HEAP buffer had a SPILL variant —
  Arrow grouped-map has none, documented limit).
- ``cogroup`` for 2 inputs uses the native cogrouped-pandas API (one
  co-partitioned shuffle, sort-merge grouping JVM-side).  For N>2 inputs
  it packs each input's record into a struct, unions with an input tag
  (one shuffle for the union'd frame), and regroups — the same single
  physical shuffle the reference achieves with its multiplexed branch
  shuffle (BranchRDDFunctions.scala:32-105).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

Ordering = Sequence[tuple[str, str]]


@dataclass
class Grouping:
    """A cogroup input: the frame, its group key, per-input sort spec
    (asc/desc secondary sort — SortOrderingClassBuilder.scala:31-90)."""

    df: DataFrame
    key: Sequence[str]
    ordering: Ordering = field(default_factory=tuple)


# ---------------------------------------------------------------------------
# Summarize
# ---------------------------------------------------------------------------

_SUMMARIZE_KINDS = {"any", "sum", "count", "max", "min"}


def summarize(
    df: DataFrame,
    key: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    deterministic_any: bool = True,
) -> DataFrame:
    """@Summarize: ``aggs`` maps output column → (kind, source column),
    kind ∈ ANY/SUM/COUNT/MAX/MIN.

    Null semantics (SURVEY.md §1 "hard parts"): Spark/SQL aggregates skip
    nulls (SUM of all-null = null, COUNT counts non-null of the column);
    this matches the DuckDB oracle.  ``COUNT`` here counts group members
    like the reference (count of records), i.e. ``count(*)``.

    ``deterministic_any``: the reference's ANY takes an arbitrary group
    member; ``F.first`` is nondeterministic under parallel execution, so
    by default ANY lowers to ``min`` — deterministic and within the
    reference's contract ("any value of the group").
    """
    exprs = []
    for out, (kind, col) in aggs.items():
        kind = kind.lower()
        if kind not in _SUMMARIZE_KINDS:
            raise ValueError(f"summarize: unknown kind {kind!r}")
        if kind == "count":
            e = F.count(F.lit(1))
        elif kind == "any":
            e = F.min(col) if deterministic_any else F.first(col)
        else:
            e = getattr(F, kind)(col)
        exprs.append(e.alias(out))
    return df.groupBy(*key).agg(*exprs)


# ---------------------------------------------------------------------------
# Fold
# ---------------------------------------------------------------------------


def fold(
    df: DataFrame,
    key: Sequence[str],
    exprs: Mapping[str, Column] | None = None,
    fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    ordering: Ordering = (),
) -> DataFrame:
    """@Fold: associative per-key fold; input and output same type.

    Fast path — ``exprs`` maps each non-key column to a native aggregate
    expression (e.g. ``F.sum("qty")``); runs with map-side combine like
    the reference's PARTIAL fold.  Non-folded columns must be covered by
    ``exprs`` too (the reference folds the whole record).

    Slow path — ``fn(pdf) -> pdf`` receives the group's records (sorted
    by ``ordering``) and returns exactly one record of the SAME schema;
    runs via ``applyInPandas`` (no partial reduction, group-fits-memory).
    """
    if (exprs is None) == (fn is None):
        raise ValueError("fold: pass exactly one of exprs / fn")
    if exprs is not None:
        out_exprs = [e.alias(c) for c, e in exprs.items()]
        return df.groupBy(*key).agg(*out_exprs)

    schema = df.schema
    sort_cols = [c for c, _ in ordering]
    sort_asc = [d == "asc" for _, d in ordering]

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        if sort_cols:
            pdf = pdf.sort_values(by=sort_cols, ascending=sort_asc, kind="mergesort")
        out = fn(pdf)
        return out[[f.name for f in schema.fields]]

    return df.groupBy(*key).applyInPandas(apply, schema=schema)


# ---------------------------------------------------------------------------
# CoGroup / GroupSort
# ---------------------------------------------------------------------------


def _sorted_group(pdf: pd.DataFrame, ordering: Ordering) -> pd.DataFrame:
    if not len(ordering):
        return pdf.reset_index(drop=True)
    return pdf.sort_values(
        by=[c for c, _ in ordering],
        ascending=[d == "asc" for _, d in ordering],
        kind="mergesort",  # stable, mirrors the reference's stable byte-sort
    ).reset_index(drop=True)


def cogroup(
    inputs: Sequence[Grouping],
    fn: Callable[..., pd.DataFrame],
    output_schema: T.StructType | str,
) -> DataFrame:
    """@CoGroup: deliver each key's records as N sorted pandas frames.

    ``fn(key_tuple, *group_pdfs) -> pd.DataFrame`` with ``output_schema``.
    For M logical outputs, include a tag column and split with
    :func:`~asakusafw_spark_spark.operators.record.branch` downstream
    (same trick the reference plays with branch keys).

    2 inputs → native ``cogroup().applyInPandas`` (co-partitioned
    sort-merge, one shuffle per side).  N inputs → struct-pack + tagged
    union → single grouped shuffle, regrouped in pandas.
    """
    if len(inputs) == 0:
        raise ValueError("cogroup: need ≥1 input")
    if len(inputs) == 1:
        g = inputs[0]
        ord1 = tuple(g.ordering)  # plain data only — closures must not capture DataFrames

        def apply1(key_vals, pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(key_vals, _sorted_group(pdf, ord1))

        return g.df.groupBy(*g.key).applyInPandas(apply1, schema=output_schema)

    if len(inputs) == 2:
        a, b = inputs
        ord_a, ord_b = tuple(a.ordering), tuple(b.ordering)

        def apply2(key_vals, pa: pd.DataFrame, pb: pd.DataFrame) -> pd.DataFrame:
            return fn(key_vals, _sorted_group(pa, ord_a), _sorted_group(pb, ord_b))

        return (
            a.df.groupBy(*a.key)
            .cogroup(b.df.groupBy(*b.key))
            .applyInPandas(apply2, schema=output_schema)
        )

    # N-way: tagged wide union — each input keeps its columns under a
    # disambiguated name (__in<i>__<col>), others null.  Types survive
    # (no JSON round-trip) and the union shuffles ONCE on the key, the
    # analogue of the reference's multiplexed branch shuffle.
    key_names = [f"__k{i}" for i in range(len(inputs[0].key))]
    wide_fields: list[tuple[int, str, str]] = []  # (input idx, src col, wide name)
    for i, g in enumerate(inputs):
        if len(g.key) != len(key_names):
            raise ValueError("cogroup: all inputs must share key arity")
        for c in g.df.columns:
            wide_fields.append((i, c, f"__in{i}__{c}"))

    packed = []
    for i, g in enumerate(inputs):
        cols = [F.col(k).alias(kn) for k, kn in zip(g.key, key_names)]
        cols.append(F.lit(i).alias("__tag"))
        own = {c: f"__in{i}__{c}" for c in g.df.columns}
        types = {w: inputs[j].df.schema[c].dataType for j, c, w in wide_fields}
        for j, c, w in wide_fields:
            if j == i:
                cols.append(F.col(c).alias(w))
            else:
                cols.append(F.lit(None).cast(types[w]).alias(w))
        packed.append(g.df.select(*cols))
    union = packed[0]
    for p in packed[1:]:
        union = union.unionByName(p)

    metas = [(list(g.df.columns), tuple(g.ordering)) for g in inputs]

    def applyN(key_vals, pdf: pd.DataFrame) -> pd.DataFrame:
        groups = []
        for i, (cols, ordering) in enumerate(metas):
            sub = pdf[pdf["__tag"] == i]
            recs = sub[[f"__in{i}__{c}" for c in cols]]
            recs.columns = cols
            groups.append(_sorted_group(recs, ordering))
        return fn(key_vals, *groups)

    return union.groupBy(*key_names).applyInPandas(applyN, schema=output_schema)


def group_sort(
    df: DataFrame,
    key: Sequence[str],
    ordering: Ordering,
    fn: Callable[..., pd.DataFrame],
    output_schema: T.StructType | str,
) -> DataFrame:
    """@GroupSort: cogroup of arity 1 — the user sees each key's records
    as one sorted list (reference: CoGroup with a single input)."""
    return cogroup([Grouping(df, key, ordering)], fn, output_schema)
