"""Record-kind user operators (SURVEY.md §2.2) — the fused one-pass stages.

In the reference each of these is a push-model ``Fragment`` woven into an
Extract stage (runtime/.../fragment/Fragment.scala:21-40); here each is a
declarative transformation Catalyst fuses into one whole-stage-codegen'd
pass over the scan.  Multi-output operators return a dict of DataFrames —
independent lineages off the same scan; Catalyst shares the scan when the
plan allows, and wide fan-outs can be pinned with
:func:`~asakusafw_spark_spark.operators.core.checkpoint` (persist).

Scale note: none of these shuffle.  All are map-side, whole-stage
codegen'd, and preserve partitioning — they cost one pass over the bytes
regardless of cluster size.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F


ColumnLike = Column | str


def _as_col(c: ColumnLike) -> Column:
    return F.col(c) if isinstance(c, str) else c


def extract(
    df: DataFrame,
    outputs: Mapping[str, Sequence[ColumnLike] | Callable[[DataFrame], DataFrame]],
) -> dict[str, DataFrame]:
    """@Extract: 1 record in → N typed outputs with arbitrary fan-out.

    Reference: runtime/.../fragment/user/ExtractOperatorFragment.scala:22-35.
    Each output is either a list of Column projections or a callable
    ``DataFrame -> DataFrame`` (for flatMap-style row multiplication use
    ``F.explode`` inside the callable).
    """
    result: dict[str, DataFrame] = {}
    for name, spec in outputs.items():
        if callable(spec):
            result[name] = spec(df)
        else:
            result[name] = df.select(*[_as_col(c) for c in spec])
    return result


def update(df: DataFrame, **exprs: ColumnLike) -> DataFrame:
    """@Update: mutate fields in place, single output.

    Reference: runtime/.../fragment/user/UpdateOperatorFragment.scala:22-36.
    Columns named in ``exprs`` are replaced (or added); all others pass
    through unchanged — ``withColumns`` keeps this one codegen stage.
    """
    return df.withColumns({k: _as_col(v) for k, v in exprs.items()})


def convert(
    df: DataFrame, converter: Callable[[DataFrame], DataFrame] | Mapping[str, ColumnLike]
) -> dict[str, DataFrame]:
    """@Convert: emit BOTH the original and a converted record.

    Reference: runtime/.../fragment/user/ConvertOperatorFragment.scala:21-36.
    Returns ``{"original": df, "out": converted}``.
    """
    if callable(converter):
        converted = converter(df)
    else:
        converted = df.select(*[_as_col(v).alias(k) for k, v in converter.items()])
    return {"original": df, "out": converted}


def branch(
    df: DataFrame,
    router: Column | Callable[[DataFrame], Column],
    branches: Sequence[str],
    default: str | None = None,
) -> dict[str, DataFrame]:
    """@Branch: route each record to exactly ONE of N outputs by an
    enum-valued expression.

    Reference: runtime/.../fragment/user/BranchOperatorFragment.scala:21-34
    (the generated code switches on the user method's enum return value).

    ``router`` is a Column evaluating to a string in ``branches`` (build
    it with ``F.when`` chains).  Each branch output is a filter off the
    shared scan — Catalyst prunes/pushes each predicate independently, so
    a downstream that consumes one branch reads only matching row groups.
    A row whose routed value is not in ``branches`` goes to ``default``
    if given; with no ``default`` it appears in NO output (each output
    is an independent filter — there is no place to raise from a row no
    lineage reads).  The reference cannot hit this case because its
    router returns a closed Java enum; pass ``default`` when the router
    expression is not provably exhaustive.
    """
    rcol = router(df) if callable(router) else router
    if default is not None:
        others = [b for b in branches if b != default]
        rcol = F.when(rcol.isin(others), rcol).otherwise(F.lit(default))
        if default not in branches:
            branches = [*branches, default]
    tagged = df.withColumn("__branch__", rcol)
    return {
        b: tagged.filter(F.col("__branch__") == F.lit(b)).drop("__branch__") for b in branches
    }


def split(
    df: DataFrame, left_cols: Sequence[str], right_cols: Sequence[str]
) -> dict[str, DataFrame]:
    """@Split: split a joined record into (left, right) outputs.

    Reference: runtime/.../fragment/user/SplitOperatorFragment.scala:22-40.
    """
    return {"left": df.select(*left_cols), "right": df.select(*right_cols)}


def logging_op(
    df: DataFrame,
    observation=None,
    metrics: Mapping[str, Column] | None = None,
) -> DataFrame:
    """@Logging: pass-through + side-effect log channel.

    Reference: runtime/.../fragment/user/LoggingOperatorFragment.scala:21-35.

    Per-record driver logging does not scale to 100 TB, and "log once per
    record" is at odds with Spark's re-computation model.  The engine
    contract: output == input EXACTLY, and the side channel is Spark's
    ``Observation`` API — aggregate metrics computed during the action
    (exactly once per action, no extra pass, no plan perturbation)::

        from pyspark.sql import Observation, functions as F
        obs = Observation("audit")
        out = logging_op(df, obs, {"rows": F.count(F.lit(1)),
                                   "null_keys": F.count_if(F.col("k").isNull())})
        out.write.parquet(...)     # action fires the metrics
        log.info(obs.get)          # {'rows': ..., 'null_keys': ...}

    With ``observation=None`` this is a pure pass-through.
    """
    if observation is None:
        return df
    mx = metrics or {"rows": F.count(F.lit(1))}
    return df.observe(observation, *[e.alias(n) for n, e in mx.items()])


def assemble_branches(parts: Mapping[str, DataFrame], tag_col: str = "branch") -> DataFrame:
    """Union branch outputs back into one frame with a tag column —
    convenience for verifying @Branch routing end-to-end."""
    frames = [df.withColumn(tag_col, F.lit(name)) for name, df in parts.items()]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
