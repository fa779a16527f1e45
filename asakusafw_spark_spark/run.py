"""Jobflow launcher CLI — the engine's ``spark-execute`` analogue.

The reference compiler emits a per-batch launcher script that boots a
SparkClient with the flow class and batch arguments
(compiler/.../SparkClientCompiler.scala:95-108,124 and the emitted
``spark/bin/spark-execute`` client entry).  Here the flow is a Python
:class:`~.plans.flow.FlowGraph` (or a factory returning one), and this
module is the operational door:

    python -m asakusafw_spark_spark.run my_flows:daily_flow \\
        --arg date=2026-08-14 --master 'local[8]' --conf k=v

``module:attr`` resolves from the current working directory.  If the
attribute is a FlowGraph it runs as-is; if it is a callable (a flow
FACTORY), it is invoked with the ``--arg`` key/values as keyword
arguments — the analogue of the reference's batch arguments — and must
return a FlowGraph.  The session comes from
:func:`~.session.engine_builder` with the engine defaults (AQE, UTC,
20 MiB broadcast threshold); ``--conf`` entries are applied on top.
"""

from __future__ import annotations

import argparse
import importlib
import sys

from .plans.flow import FlowGraph
from .session import engine_builder

__all__ = ["main", "resolve_flow"]


def resolve_flow(spec: str, args: dict[str, str]) -> FlowGraph:
    """Resolve ``module[:attr]`` (attr defaults to ``flow``) to a
    FlowGraph, invoking a factory callable with ``args`` if needed."""
    mod_name, _, attr = spec.partition(":")
    attr = attr or "flow"
    module = importlib.import_module(mod_name)
    try:
        obj = getattr(module, attr)
    except AttributeError as exc:
        raise SystemExit(
            f"run: module {mod_name!r} has no attribute {attr!r}"
        ) from exc
    if isinstance(obj, FlowGraph):
        if args:
            raise SystemExit(
                f"run: {spec!r} is a FlowGraph instance — --arg values need "
                "a flow factory (a callable returning a FlowGraph)"
            )
        return obj
    if callable(obj):
        flow = obj(**args)
        if not isinstance(flow, FlowGraph):
            raise SystemExit(
                f"run: factory {spec!r} returned {type(flow).__name__}, "
                "expected FlowGraph"
            )
        return flow
    raise SystemExit(f"run: {spec!r} is neither a FlowGraph nor a factory")


def _kv(value: str) -> tuple[str, str]:
    k, sep, v = value.partition("=")
    if not sep or not k:
        raise argparse.ArgumentTypeError(f"expected key=value, got {value!r}")
    return k, v


def main(argv: "list[str] | None" = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m asakusafw_spark_spark.run",
        description="Build a FlowGraph and fire its sinks "
        "(the spark-execute client entry).",
    )
    p.add_argument("flow", help="module[:attr] resolving to a FlowGraph "
                   "or a factory callable (attr defaults to 'flow')")
    p.add_argument("--arg", type=_kv, action="append", default=[],
                   metavar="K=V", help="batch argument passed to a flow "
                   "factory (repeatable)")
    p.add_argument("--master", default=None,
                   help="Spark master (default: engine_builder's)")
    p.add_argument("--app-name", default=None, help="Spark app name")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--conf", type=_kv, action="append", default=[],
                   metavar="K=V", help="extra Spark conf (repeatable)")
    p.add_argument("--max-concurrent-sinks", type=int, default=4)
    ns = p.parse_args(argv)

    sys.path.insert(0, "")  # resolve flow modules from the launch cwd
    flow = resolve_flow(ns.flow, dict(ns.arg))

    builder_kwargs: dict = {"extra_conf": dict(ns.conf) or None}
    if ns.app_name:
        builder_kwargs["app_name"] = ns.app_name
    if ns.master:
        builder_kwargs["master"] = ns.master
    if ns.shuffle_partitions is not None:
        builder_kwargs["shuffle_partitions"] = ns.shuffle_partitions
    spark = engine_builder(**builder_kwargs).getOrCreate()
    from .listener import OutputCounters

    counters = OutputCounters()
    try:
        flow.run(
            spark,
            max_concurrent_sinks=ns.max_concurrent_sinks,
            counters=counters,
        )
        # job-end per-output summary on stderr (OutputCounters.scala
        # parity) — flow.run already logged via the package logger; the
        # CLI also prints so operators see it without logging config
        for name, st in sorted(counters.report().items()):
            rec = st.get("records")
            print(
                f"output {name}: "
                + ("?" if rec is None else str(rec))
                + " records",
                file=sys.stderr,
            )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
