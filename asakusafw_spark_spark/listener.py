"""Per-output record/byte counters — the engine's analogue of the
reference's job-end output listener
(``runtime/src/main/scala/com/asakusafw/spark/runtime/listener/
OutputCounters.scala``: logs each sink's record and byte counts when a
job finishes; operations teams alarm on "did the output suddenly
halve?").

Spark-first mechanics: record counts ride :class:`pyspark.sql.
Observation` (``df.observe`` — collected by the JVM DURING the write
action, zero extra jobs, exact under retries because observed metrics
come from the successful attempt only); byte/file counts come from one
Hadoop FS listing of the written path (a handful of namenode/object-
store RPCs, independent of data size).  Nothing here adds a scan.

Usage::

    counters = OutputCounters()
    write_flat(df, path, counters=counters, sink_name="result")
    ...
    counters.log()          # job-end summary lines
    counters.report()       # {"result": {"records": n, "bytes": b, ...}}

`FlowGraph.run(..., counters=...)` wires every declared sink
automatically, and ``python -m asakusafw_spark_spark.run`` logs the
summary at job end.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame, Observation, functions as F

__all__ = ["OutputCounters"]

_LOG = logging.getLogger("asakusafw_spark_spark.output")


class OutputCounters:
    """Collects per-sink output metrics for one job run.

    Thread-safe (sinks fire concurrently in ``FlowGraph.run``).  Sink
    names must be unique within a run — a duplicate raises, because a
    silently merged counter is exactly the monitoring bug this class
    exists to prevent.
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._obs: dict[str, Observation] = {}
        self._fs_stats: dict[str, dict] = {}

    # -- collection ----------------------------------------------------
    def observe(self, name: str, df: DataFrame) -> DataFrame:
        """Attach a record counter to ``df``; returns the instrumented
        frame (use IT for the write).  Streaming frames pass through
        uncounted — Observation is batch-only; streaming sinks report
        through their progress listener instead."""
        if df.isStreaming:
            return df
        with self._lock:
            if name in self._obs:
                raise ValueError(
                    f"OutputCounters: sink name {name!r} already observed "
                    "in this run — sink names must be unique"
                )
            obs = Observation(f"sink:{name}")
            self._obs[name] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("records"))

    def record_files(self, name: str, spark, path: str) -> None:
        """Record byte/file counts for ``name`` from one recursive FS
        listing of ``path`` (works on file://, hdfs://, s3a://)."""
        from .sources.write import HadoopFs

        fs = HadoopFs(spark, path)
        files = [
            (p, sz)
            for p, sz in fs.list_files_recursive(path)
            # exclude committer/engine markers from the byte count
            if not p.rsplit("/", 1)[-1].startswith(("_", "."))
        ]
        with self._lock:
            self._fs_stats[name] = {
                "bytes": sum(sz for _, sz in files),
                "files": len(files),
            }

    def record_sizes(self, name: str, files: "list[tuple[str, int]]") -> None:
        """Record byte/file counts from an explicit (path, size) list —
        used by writers that know exactly which files they produced
        (``write_grouped`` promotion) into a directory shared with
        other datasets."""
        with self._lock:
            self._fs_stats[name] = {
                "bytes": sum(sz for _, sz in files),
                "files": len(files),
            }

    # -- reporting -----------------------------------------------------
    def report(self) -> dict[str, dict]:
        """``{sink: {"records": n?, "bytes": b?, "files": f?}}`` for
        every sink seen.  ``records`` is absent if the observed frame's
        write never ran (Observation.get would block forever — probed
        non-blockingly)."""
        out: dict[str, dict] = {}
        with self._lock:
            obs = dict(self._obs)
            fs_stats = {k: dict(v) for k, v in self._fs_stats.items()}
        for name, ob in obs.items():
            entry = out.setdefault(name, {})
            # Observation.get blocks until the action completes; probe
            # the JVM's non-blocking getRowOrEmpty first (the job-end
            # report must never hang on a sink whose write never fired)
            ready = (
                ob._jo is not None and not ob._jo.getRowOrEmpty().isEmpty()
            )
            if ready:
                entry["records"] = int(ob.get["records"])
        for name, st in fs_stats.items():
            out.setdefault(name, {}).update(st)
        return out

    def log(self, logger: "logging.Logger | None" = None) -> dict[str, dict]:
        """Emit one job-end summary line per sink (the reference
        listener's log shape) and return :meth:`report`."""
        log = logger or _LOG
        rep = self.report()
        for name in sorted(rep):
            st = rep[name]
            parts = [f"output {name}:"]
            if "records" in st:
                parts.append(f"{st['records']} records")
            if "bytes" in st:
                parts.append(f"{st['bytes']} bytes in {st['files']} files")
            log.info(" ".join(parts) if len(parts) > 1 else parts[0] + " (no metrics)")
        return rep
