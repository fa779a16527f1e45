"""The TestDriver-analog fixture harness (asakusafw_spark_spark.testing)
exercised the way a user would test their own operators: literal rows
in, operator under test, literal rows verified out — plus pins on the
diff output itself, since a harness whose failure messages lie is worse
than none."""

import pytest
from pyspark.sql import functions as F

from asakusafw_spark_spark.testing import (
    FrameMismatch,
    TestDriver,
    assert_frames_equal,
)


def test_driver_runs_master_join_from_fixture_rows(spark):
    """An operator test written through the harness end-to-end: the
    @MasterJoin operator with a missing master — the reference's
    canonical TestDriver example shape."""
    from asakusafw_spark_spark.operators.joins import master_join

    td = TestDriver(spark)
    td.input(
        "masters",
        [(1, "Alice"), (2, "Bob")],
        "cust_id long, name string",
    )
    td.input(
        "tx",
        [(10, 1, 100.0), (11, 2, 50.0), (12, 9, 75.0)],  # 9 has no master
        "tx_id long, cust_id long, amount double",
    )
    td.run(lambda masters, tx: master_join(masters, tx, key=["cust_id"]))
    td.verify(
        td.output("joined").select("tx_id", "cust_id", "amount", "name"),
        [
            (10, 1, 100.0, "Alice"),
            (11, 2, 50.0, "Bob"),
        ],
        schema="tx_id long, cust_id long, amount double, name string",
    )
    td.verify(
        td.output("missed").select("tx_id", "cust_id", "amount"),
        [(12, 9, 75.0)],
        schema="tx_id long, cust_id long, amount double",
    )


def test_driver_multi_output_branch(spark):
    from asakusafw_spark_spark.operators.record import branch

    td = TestDriver(spark)
    td.input("recs", [(1, 5), (2, 15), (3, 25)], "id long, v long")

    def flow(recs):
        router = (
            F.when(F.col("v") < 10, "low")
            .when(F.col("v") < 20, "mid")
            .otherwise("high")
        )
        return branch(recs, router, ["low", "mid", "high"])

    td.run(flow)
    td.verify("low", [(1, 5)], schema="id long, v long")
    td.verify("mid", [(2, 15)], schema="id long, v long")
    td.verify("high", [(3, 25)], schema="id long, v long")


def test_verify_diff_reports_missing_and_unexpected(spark):
    td = TestDriver(spark)
    td.input("t", [(1, "a"), (2, "b")], "id long, s string")
    out = td.run(lambda t: t)
    with pytest.raises(FrameMismatch) as ei:
        td.verify(out, [(1, "a"), (3, "c")], schema="id long, s string")
    msg = str(ei.value)
    assert "missing" in msg and "id=3" in msg and "s='c'" in msg
    assert "unexpected" in msg and "id=2" in msg


def test_verify_schema_and_order_modes(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    # column name mismatch caught before any collect
    with pytest.raises(FrameMismatch, match="column mismatch"):
        assert_frames_equal(df, [(1, 2.0)], schema="a long, c double")
    # type mismatch names the offending column
    with pytest.raises(FrameMismatch, match="type mismatch"):
        assert_frames_equal(df, [(1, 2)], schema="a long, b long")
    # positional mode: order IS the contract
    seq = spark.createDataFrame([(1,), (2,)], "x long")
    assert_frames_equal(seq, [(1,), (2,)], schema="x long", ignore_order=False)
    with pytest.raises(FrameMismatch, match="row 0"):
        assert_frames_equal(
            seq.orderBy(F.desc("x")), [(1,), (2,)], schema="x long",
            ignore_order=False,
        )


def test_verify_float_tolerance_and_rule(spark):
    df = spark.createDataFrame([("a", 0.30000000000000004)], "k string, v double")
    assert_frames_equal(df, [("a", 0.3)], schema="k string, v double",
                        float_tol=1e-9)
    with pytest.raises(FrameMismatch):
        assert_frames_equal(df, [("a", 0.3)], schema="k string, v double")

    # ModelVerifier-style rule on matched pairs
    with pytest.raises(FrameMismatch, match="rule: v out of range"):
        assert_frames_equal(
            df, [("a", 0.3)], schema="k string, v double", float_tol=1e-9,
            rule=lambda a, e: "v out of range" if a[1] > 0.2 else None,
        )


def test_verify_float_tolerance_reaches_nested_floats(spark):
    """float_tol applies INSIDE arrays/structs/maps too (ADVICE r11) —
    an array<double> embedding column must compare tolerantly, and the
    tolerance must still FAIL a genuinely different nested value."""
    df = spark.createDataFrame(
        [("a", [0.1 + 0.2, 1.0], {"x": 0.30000000000000004})],
        "k string, emb array<double>, m map<string,double>",
    )
    assert_frames_equal(
        df,
        [("a", [0.3, 1.0], {"x": 0.3})],
        schema="k string, emb array<double>, m map<string,double>",
        float_tol=1e-9,
    )
    with pytest.raises(FrameMismatch):
        assert_frames_equal(
            df,
            [("a", [0.3, 1.0], {"x": 0.3})],
            schema="k string, emb array<double>, m map<string,double>",
        )
    with pytest.raises(FrameMismatch):
        assert_frames_equal(
            df,
            [("a", [0.4, 1.0], {"x": 0.3})],
            schema="k string, emb array<double>, m map<string,double>",
            float_tol=1e-9,
        )


def test_run_binds_by_parameter_name_and_validates(spark):
    td = TestDriver(spark)
    td.input("a", [(1,)], "x long")
    td.input("b", [(2,)], "x long")
    # only the declared parameter is bound; extra inputs are fine
    out = td.run(lambda b: b)
    td.verify(out, [(2,)], schema="x long")
    with pytest.raises(ValueError, match="flow wants inputs \\['nope'\\]"):
        td.run(lambda nope: nope)
    # all_inputs mode hands over the whole dict
    out2 = td.run(lambda ins: ins["a"].unionByName(ins["b"]), all_inputs=True)
    td.verify(out2, [(1,), (2,)], schema="x long")
