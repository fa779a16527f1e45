"""Iterative batch execution (SURVEY.md §3.3).

The reference's iterativebatch extension re-executes one compiled job
over a queue of parameter sets ("rounds"), caching nodes across rounds
by their recompute kind — ALWAYS / PARAMETER / NEVER
(planner/.../IterativeInfo.java:41-45; RoundAwareCacheOnce /
CacheByParameter strategies).

Spark-native equivalent: a Python loop over parameter dicts.  Each node
declares which parameter keys it depends on; the runner memoizes the
node's DataFrame by the values of those keys:

- depends on no keys  → NEVER recompute: built once, persisted, shared
  by every round;
- depends on some keys → PARAMETER: rebuilt only when those values
  change (memo keyed by the value tuple);
- ``always=True``      → ALWAYS: rebuilt each round (non-deterministic
  sources).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


@dataclass
class IterativeNode:
    name: str
    fn: Callable  # (spark, params, *input_dfs) -> DataFrame
    inputs: Sequence[str] = ()
    param_keys: Sequence[str] = ()  # parameters this node reads
    always: bool = False  # ALWAYS recompute kind


@dataclass
class IterativeRunner:
    """Run a DAG of :class:`IterativeNode` over parameter rounds."""

    nodes: list[IterativeNode] = field(default_factory=list)

    def node(
        self,
        name: str,
        fn: Callable,
        inputs: Sequence[str] = (),
        param_keys: Sequence[str] = (),
        always: bool = False,
    ) -> str:
        known = {n.name for n in self.nodes}
        for i in inputs:
            if i not in known:
                raise ValueError(f"unknown input {i!r}")
        self.nodes.append(IterativeNode(name, fn, inputs, param_keys, always))
        return name

    def _effective_keys(self) -> dict[str, tuple[str, ...]]:
        """Parameter dependency closure: a node inherits its inputs' keys
        (matches the reference's transitive IterativeInfo propagation)."""
        by_name = {n.name: n for n in self.nodes}
        memo: dict[str, tuple[str, ...]] = {}

        def keys(name: str) -> tuple[str, ...]:
            if name not in memo:
                n = by_name[name]
                acc = set(n.param_keys)
                for i in n.inputs:
                    acc.update(keys(i))
                memo[name] = tuple(sorted(acc))
            return memo[name]

        return {n.name: keys(n.name) for n in self.nodes}

    def run(
        self,
        spark: SparkSession,
        rounds: Sequence[Mapping],
        collect: Callable[[int, Mapping, dict[str, DataFrame]], None],
    ) -> None:
        """Execute all rounds; ``collect(round_idx, params, frames)`` is
        the per-round action (write/collect results)."""
        eff = self._effective_keys()
        cache: dict[tuple, DataFrame] = {}
        build_counts: dict[str, int] = {}
        try:
            for ridx, params in enumerate(rounds):
                frames: dict[str, DataFrame] = {}
                for n in self.nodes:
                    if n.always:
                        df = n.fn(spark, params, *[frames[i] for i in n.inputs])
                    else:
                        key = (n.name,) + tuple(
                            (k, params.get(k)) for k in eff[n.name]
                        )
                        if key not in cache:
                            df = n.fn(spark, params, *[frames[i] for i in n.inputs])
                            # persist anything reused across rounds
                            cache[key] = df.persist(StorageLevel.MEMORY_AND_DISK)
                            build_counts[n.name] = build_counts.get(n.name, 0) + 1
                        df = cache[key]
                    frames[n.name] = df
                collect(ridx, params, frames)
        finally:
            for df in cache.values():
                df.unpersist()
        self.build_counts = build_counts
