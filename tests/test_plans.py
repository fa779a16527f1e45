"""FlowGraph + IterativeRunner tests (reference JobCompilerSpec /
IterativeBatchExecutor patterns)."""

import pytest
from pyspark.sql import functions as F

from asakusafw_spark_spark.operators import branch, summarize
from asakusafw_spark_spark.plans import FlowGraph, IterativeRunner


def test_flow_end_to_end(spark, sf_dir, tmp_path):
    flow = FlowGraph()
    flow.source("orders", lambda s: s.read.parquet(f"{sf_dir}/orders.parquet"))
    flow.op(
        "routed",
        "orders",
        lambda s, df: branch(
            df,
            F.when(F.col("o_orderstatus") == "F", "done").otherwise("open"),
            ["done", "open"],
        ),
        outputs=["done", "open"],
    )
    flow.op(
        "by_prio",
        "routed.open",
        lambda s, df: summarize(df, ["o_orderpriority"], {"n": ("count", "o_orderkey")}),
    )
    results = {}
    flow.sink("count_done", "routed.done", lambda df: results.__setitem__("done", df.count()))
    flow.sink("agg_open", "by_prio", lambda df: results.__setitem__("open_prios", df.count()))
    flow.run(spark)
    assert results["done"] > 0 and results["open_prios"] > 0


def test_flow_rejects_unknown_input():
    flow = FlowGraph()
    with pytest.raises(ValueError, match="unknown input"):
        flow.op("x", "missing", lambda s, df: df)


def test_flow_rejects_bad_port(spark):
    flow = FlowGraph()
    flow.source("a", lambda s: s.range(1))
    flow.op("b", "a", lambda s, df: {"x": df}, outputs=["x"])
    with pytest.raises(ValueError, match="no output port"):
        flow.op("c", "b.y", lambda s, df: df)
    with pytest.raises(ValueError, match="multi-output"):
        flow.op("d", "b", lambda s, df: df)


def test_flow_requires_sink(spark):
    flow = FlowGraph()
    flow.source("a", lambda s: s.range(1))
    with pytest.raises(ValueError, match="no sinks"):
        flow.run(spark)


def test_iterative_recompute_classification(spark, sf_dir):
    runner = IterativeRunner()
    builds = {"events": 0, "filtered": 0}

    def load_events(s, params):
        builds["events"] += 1
        return s.read.parquet(f"{sf_dir}/orders.parquet")

    def filter_by_status(s, params, df):
        builds["filtered"] += 1
        return df.filter(F.col("o_orderstatus") == params["status"])

    runner.node("events", load_events)  # NEVER: no params
    runner.node("filtered", filter_by_status, inputs=["events"], param_keys=["status"])

    seen = []
    rounds = [{"status": "F"}, {"status": "O"}, {"status": "F"}]
    runner.run(spark, rounds, lambda i, p, f: seen.append(f["filtered"].count()))

    assert len(seen) == 3
    assert builds["events"] == 1  # cached across all rounds
    assert builds["filtered"] == 2  # F cached, reused in round 3
    assert seen[0] == seen[2]


def test_iterative_always_recomputes(spark):
    runner = IterativeRunner()
    builds = {"n": 0}

    def src(s, params):
        builds["n"] += 1
        return s.range(5)

    runner.node("src", src, always=True)
    runner.run(spark, [{}, {}], lambda i, p, f: f["src"].count())
    assert builds["n"] == 2


def test_iterative_transitive_param_dependency(spark):
    runner = IterativeRunner()
    builds = {"derived": 0}

    runner.node("base", lambda s, p: s.range(10).filter(F.col("id") < p["cut"]), param_keys=["cut"])

    def derive(s, p, df):
        builds["derived"] += 1
        return df.withColumn("x", F.col("id") * 2)

    # derived declares NO param keys but must inherit base's 'cut'
    runner.node("derived", derive, inputs=["base"])
    counts = []
    runner.run(spark, [{"cut": 3}, {"cut": 7}], lambda i, p, f: counts.append(f["derived"].count()))
    assert counts == [3, 7]
    assert builds["derived"] == 2


def test_run_cli_drives_flow_end_to_end(tmp_path):
    """The spark-execute analogue: `python -m asakusafw_spark_spark.run
    module:factory --arg k=v` resolves the flow factory from cwd,
    builds the FlowGraph, and fires its sinks in a fresh interpreter."""
    import subprocess
    import sys

    flow_mod = tmp_path / "demo_flow.py"
    out_dir = tmp_path / "out"
    flow_mod.write_text(
        f'''
from pyspark.sql import functions as F
from asakusafw_spark_spark.plans.flow import FlowGraph
from asakusafw_spark_spark.sources.write import write_flat

def flow(threshold="5"):
    g = FlowGraph()
    g.source("nums", lambda spark: spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v")))
    g.op("big", "nums", lambda spark, df: df.filter(
        F.col("v") >= int(threshold)))
    g.sink("save", "big", lambda df: write_flat(
        df, r"{out_dir}", format="parquet"))
    return g
''')
    r = subprocess.run(
        [sys.executable, "-m", "asakusafw_spark_spark.run",
         "demo_flow:flow", "--arg", "threshold=10",
         "--master", "local[2]", "--shuffle-partitions", "2"],
        cwd=tmp_path, capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ,
             "PYTHONPATH": __import__("os").path.dirname(
                 __import__("os").path.dirname(
                     __import__("asakusafw_spark_spark").__file__))},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import duckdb
    n, lo = duckdb.sql(
        f"SELECT count(*), min(v) FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchone()
    assert (n, lo) == (5, 10)  # v in {10,12,14,16,18}

    # a bad attr fails with a clear message, not a stack trace
    r2 = subprocess.run(
        [sys.executable, "-m", "asakusafw_spark_spark.run", "demo_flow:nope"],
        cwd=tmp_path, capture_output=True, text=True, timeout=120,
        env=r.args and {**__import__("os").environ,
             "PYTHONPATH": __import__("os").path.dirname(
                 __import__("os").path.dirname(
                     __import__("asakusafw_spark_spark").__file__))},
    )
    assert r2.returncode != 0
    assert "no attribute 'nope'" in r2.stderr
