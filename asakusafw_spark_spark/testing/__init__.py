"""Fixture harness for operator/flow tests: rows in → operator → rows out.

The reference ships a TestDriver integration (test-adapter/
SparkCompilerProfileInitializer.java wires Asakusa's FlowPartTester —
``.input(name).prepare(rows)`` / ``.output(name).verify(expected,
rule)`` — to its Spark compiler) so users can test an operator or flow
part against literal fixture data without standing up I/O.  This module
is that workflow re-expressed for the PySpark engine:

    from asakusafw_spark_spark.testing import TestDriver

    td = TestDriver(spark)
    td.input("orders", [(1, "A"), (2, "B")], "id long, status string")
    out = td.run(lambda orders: orders.filter(orders.status == "A"))
    td.verify(out, [(1, "A")])

- ``input`` accepts tuples or dicts plus a DDL schema (the same literal
  shape the reference's Excel/JSON fixtures carry).
- ``run`` calls the flow with the prepared inputs bound by PARAMETER
  NAME (a flow-part's ports), so the unit under test is any callable
  from DataFrames to a DataFrame (or a dict of named outputs — a
  multi-output @Branch / branch() flow).
- ``verify`` / ``assert_frames_equal`` compare schema + full row
  multiset and raise with a chispa-style aligned diff (missing rows,
  unexpected rows, first column-level mismatch) instead of an opaque
  boolean; floats compare within ``float_tol`` like the reference
  verifier's approximate rules.  A custom ``rule=`` callable mirrors
  Asakusa's ModelVerifier for non-positional checks.

Everything collects to the driver — this is a TEST harness for
fixture-scale rows, not a data-diff tool for production tables (use the
oracle/verify tooling for that).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Iterable, Mapping

from pyspark.sql import DataFrame, Row, SparkSession

__all__ = ["TestDriver", "FrameMismatch", "assert_frames_equal"]

#: Rows shown per diff section before truncating.
_DIFF_LIMIT = 10


class FrameMismatch(AssertionError):
    """Raised by :func:`assert_frames_equal` with the formatted diff."""


def _norm_value(v: Any, float_tol: float) -> Any:
    """Sort/compare key: floats rounded to the tolerance grid (exact
    match still compared with isclose afterwards), bytes/lists/dicts
    made hashable, NaN collapsed to a marker so NaN == NaN in tests."""
    if isinstance(v, float):
        if math.isnan(v):
            return ("__nan__",)
        if float_tol > 0:
            return round(v / float_tol) * float_tol
        return v
    if isinstance(v, bytearray):
        return bytes(v)
    if isinstance(v, Row):
        return tuple(_norm_value(x, float_tol) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x, float_tol) for x in v)
    if isinstance(v, dict):
        return tuple(
            sorted((k, _norm_value(x, float_tol)) for k, x in v.items())
        )
    return v


def _sort_key(t: tuple) -> tuple:
    # None sorts before everything; values keyed by (type bucket, value)
    # so mixed-type columns (int vs str after a bad cast) still order
    return tuple((v is not None, str(type(v)), str(v)) for v in t)


def _values_equal(a: Any, b: Any, float_tol: float) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=0.0, abs_tol=float_tol) if float_tol else a == b
    # tolerance must reach NESTED floats too (an array<double> embedding
    # column, a struct of measures) — recurse through containers instead
    # of falling back to exact comparison (ADVICE r11)
    if float_tol:
        if isinstance(a, Row):
            a = tuple(a)
        if isinstance(b, Row):
            b = tuple(b)
        if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
            return len(a) == len(b) and all(
                _values_equal(x, y, float_tol) for x, y in zip(a, b)
            )
        if isinstance(a, dict) and isinstance(b, dict):
            return set(a) == set(b) and all(
                _values_equal(a[k], b[k], float_tol) for k in a
            )
    return _norm_value(a, 0.0) == _norm_value(b, 0.0)


def _rows_equal(a: tuple, b: tuple, float_tol: float) -> bool:
    return len(a) == len(b) and all(
        _values_equal(x, y, float_tol) for x, y in zip(a, b)
    )


def _fmt_rows(label: str, cols: list[str], rows: list[tuple]) -> list[str]:
    lines = [f"  {label} ({len(rows)} row{'s' if len(rows) != 1 else ''}):"]
    for r in rows[:_DIFF_LIMIT]:
        lines.append("    " + ", ".join(f"{c}={v!r}" for c, v in zip(cols, r)))
    if len(rows) > _DIFF_LIMIT:
        lines.append(f"    … and {len(rows) - _DIFF_LIMIT} more")
    return lines


def assert_frames_equal(
    actual: DataFrame,
    expected: "DataFrame | list",
    *,
    schema: str | None = None,
    ignore_order: bool = True,
    float_tol: float = 0.0,
    check_schema: bool = True,
    rule: Callable[[tuple, tuple], "str | None"] | None = None,
) -> None:
    """Assert two frames hold the same rows, with a readable diff.

    ``expected`` may be a DataFrame or literal rows (tuples/dicts; pass
    ``schema=`` to build them, else the actual frame's schema is
    reused).  ``ignore_order=False`` compares positionally — for
    operators whose ORDER is the contract (``group_sort``, top-k).
    ``float_tol`` is an absolute per-value tolerance.  ``rule`` runs on
    each matched (actual, expected) pair AFTER multiset matching and
    collects its non-None returns as failures (Asakusa ModelVerifier
    analog).
    """
    spark = actual.sparkSession
    if not isinstance(expected, DataFrame):
        expected = spark.createDataFrame(
            expected, schema=schema or actual.schema
        )
    cols_a, cols_e = list(actual.columns), list(expected.columns)
    problems: list[str] = []
    if check_schema:
        if cols_a != cols_e:
            raise FrameMismatch(
                "column mismatch:\n"
                f"  actual:   {cols_a}\n  expected: {cols_e}"
            )
        ta = [f.dataType.simpleString() for f in actual.schema.fields]
        te = [f.dataType.simpleString() for f in expected.schema.fields]
        if ta != te:
            diffs = [
                f"  {c}: actual {x} vs expected {y}"
                for c, x, y in zip(cols_a, ta, te)
                if x != y
            ]
            raise FrameMismatch("type mismatch:\n" + "\n".join(diffs))
    rows_a = [tuple(r) for r in actual.collect()]
    rows_e = [tuple(r) for r in expected.collect()]

    if ignore_order:
        rows_a.sort(key=_sort_key)
        rows_e.sort(key=_sort_key)
        # greedy multiset match on the sorted lists (tolerance-aware)
        unmatched_a: list[tuple] = []
        unmatched_e: list[tuple] = list(rows_e)
        matched: list[tuple[tuple, tuple]] = []
        for ra in rows_a:
            for i, re_ in enumerate(unmatched_e):
                if _rows_equal(ra, re_, float_tol):
                    matched.append((ra, re_))
                    del unmatched_e[i]
                    break
            else:
                unmatched_a.append(ra)
        if unmatched_a or unmatched_e:
            if unmatched_e:
                problems += _fmt_rows("missing (expected, not produced)",
                                      cols_e, unmatched_e)
            if unmatched_a:
                problems += _fmt_rows("unexpected (produced, not expected)",
                                      cols_a, unmatched_a)
    else:
        if len(rows_a) != len(rows_e):
            problems.append(
                f"  row count: actual {len(rows_a)} vs expected {len(rows_e)}"
            )
        matched = list(zip(rows_a, rows_e))
        for pos, (ra, re_) in enumerate(matched):
            if not _rows_equal(ra, re_, float_tol):
                bad = next(
                    c for c, x, y in zip(cols_a, ra, re_)
                    if not _values_equal(x, y, float_tol)
                )
                problems.append(
                    f"  row {pos}: first mismatch at {bad!r}:\n"
                    f"    actual:   {dict(zip(cols_a, ra))}\n"
                    f"    expected: {dict(zip(cols_e, re_))}"
                )
                break
    if rule is not None and not problems:
        for ra, re_ in matched:
            msg = rule(ra, re_)
            if msg:
                problems.append(f"  rule: {msg}\n    row: {dict(zip(cols_a, ra))}")
    if problems:
        raise FrameMismatch(
            "DataFrames differ:\n" + "\n".join(problems)
        )


class TestDriver:
    """Prepare named inputs, run a flow-shaped callable, verify outputs.

    The callable receives the prepared inputs bound by PARAMETER NAME
    (extra prepared inputs are fine — only the parameters the callable
    declares are passed), mirroring a flow part's named ports.  It may
    return one DataFrame or a ``{name: DataFrame}`` dict for
    multi-output operators; :meth:`verify` then takes the dict key as
    its first argument.
    """

    #: not a pytest test class (pytest would otherwise try to collect it)
    __test__ = False

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._inputs: dict[str, DataFrame] = {}
        self._outputs: dict[str, DataFrame] = {}

    def input(
        self,
        name: str,
        rows: Iterable,
        schema: str | None = None,
    ) -> "TestDriver":
        """Prepare one named input from literal rows (tuples or dicts)
        plus a DDL schema, or from an existing DataFrame."""
        if isinstance(rows, DataFrame):
            self._inputs[name] = rows
        else:
            self._inputs[name] = self.spark.createDataFrame(list(rows), schema=schema)
        return self

    def run(self, flow: Callable, *, all_inputs: bool = False):
        """Invoke ``flow`` with prepared inputs bound by parameter name
        (or, with ``all_inputs=True`` / a single ``**kwargs``-less dict
        parameter, the whole input dict).  Stores and returns the
        result; a dict result registers every named output."""
        import inspect

        if all_inputs:
            result = flow(dict(self._inputs))
        else:
            params = [
                p for p in inspect.signature(flow).parameters.values()
                if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
            ]
            missing = [
                p.name for p in params
                if p.default is p.empty and p.name not in self._inputs
            ]
            if missing:
                raise ValueError(
                    f"flow wants inputs {missing} but only "
                    f"{sorted(self._inputs)} are prepared"
                )
            result = flow(**{
                p.name: self._inputs[p.name]
                for p in params if p.name in self._inputs
            })
        if isinstance(result, Mapping):
            self._outputs.update(result)
        elif isinstance(result, DataFrame):
            self._outputs["__result__"] = result
        return result

    def output(self, name: str) -> DataFrame:
        """A named output of the last :meth:`run` (dict results)."""
        return self._outputs[name]

    def verify(
        self,
        target: "DataFrame | str",
        expected: "DataFrame | list",
        *,
        schema: str | None = None,
        ignore_order: bool = True,
        float_tol: float = 0.0,
        check_schema: bool = True,
        rule: Callable[[tuple, tuple], "str | None"] | None = None,
    ) -> None:
        """Assert an output (a DataFrame, or the NAME of a registered
        multi-output branch) equals the expected rows; raises
        :class:`FrameMismatch` with the aligned diff otherwise."""
        if isinstance(target, str):
            target = self._outputs[target]
        assert_frames_equal(
            target, expected, schema=schema, ignore_order=ignore_order,
            float_tol=float_tol, check_schema=check_schema, rule=rule,
        )
