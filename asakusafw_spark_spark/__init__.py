"""asakusafw_spark_spark — a PySpark-native batch dataflow engine.

A brand-new engine with the query/data-processing capabilities of the
reference (asakusafw/asakusafw-spark), re-expressed as idiomatic Spark
DataFrame / Catalyst plans instead of the reference's ASM-bytecode RDD
runtime. See SURVEY.md for the capability map with reference citations.

Public surface:

- :mod:`.session`   — engine-tuned SparkSession builder
- :mod:`.operators` — the closed operator vocabulary (core projections,
  record ops, master/transaction joins, group ops) plus Spark-native
  extensions (windows / top-k / dedup)
- :mod:`.sources`   — direct I/O sources & sinks incl. pattern-generated
  grouped outputs and a multi-dataset two-phase commit
- :mod:`.functions` — scalar surface + LLM-data-pipeline functions
  (text analysis, dedup sketches, similarity search, multimodal)
- :mod:`.plans`     — FlowGraph DAG builder + iterative batch runner
- :mod:`.streaming` — Structured-Streaming equivalents
"""

from .session import get_spark, engine_builder
from .listener import OutputCounters

__all__ = ["get_spark", "engine_builder", "OutputCounters"]
__version__ = "0.1.0"
