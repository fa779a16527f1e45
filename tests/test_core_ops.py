"""Unit tests for core projections + record operators, mirroring the
reference's Foo/Bar micro-fixture style (FIXTURES.md §A)."""

import pytest
from pyspark.sql import functions as F, types as T

from asakusafw_spark_spark.operators import (
    project,
    extend,
    restructure,
    extract,
    update,
    convert,
    branch,
    split,
)
from asakusafw_spark_spark.operators.record import assemble_branches
from asakusafw_spark_spark.schema import record_type


@pytest.fixture(scope="module")
def foo(spark):
    return spark.createDataFrame(
        [(i, f"foo{i}", i % 3) for i in range(10)], "id int, foo string, grp int"
    )


def test_project_narrows(foo):
    t = record_type({"id": "int", "foo": "string"})
    out = project(foo, t)
    assert out.columns == ["id", "foo"]
    assert out.count() == 10


def test_project_missing_field_raises(foo):
    with pytest.raises(ValueError):
        project(foo, record_type({"nope": "int"}))


def test_extend_adds_null_fields(foo):
    t = record_type({"id": "int", "foo": "string", "grp": "int", "extra": "double"})
    out = extend(foo, t)
    assert out.columns == ["id", "foo", "grp", "extra"]
    assert out.filter(F.col("extra").isNull()).count() == 10


def test_extend_refuses_narrowing(foo):
    with pytest.raises(ValueError):
        extend(foo, record_type({"id": "int"}))


def test_restructure_mixes(foo):
    t = record_type({"foo": "string", "brand_new": "long"})
    out = restructure(foo, t)
    assert out.columns == ["foo", "brand_new"]
    assert out.filter(F.col("brand_new").isNull()).count() == 10


def test_extract_multi_output(foo):
    outs = extract(
        foo,
        {
            "ids": ["id"],
            "doubled": [F.col("id") * 2],
            "exploded": lambda df: df.select(F.explode(F.array("id", "id")).alias("x")),
        },
    )
    assert outs["ids"].count() == 10
    assert outs["exploded"].count() == 20


def test_update_replaces_in_place(foo):
    out = update(foo, foo=F.upper("foo"), flag=F.col("id") > 5)
    assert out.columns == ["id", "foo", "grp", "flag"]
    assert out.filter(F.col("foo") == "FOO1").count() == 1


def test_convert_emits_both(foo):
    outs = convert(foo, {"id2": F.col("id") * 10})
    assert outs["original"].columns == ["id", "foo", "grp"]
    assert outs["out"].columns == ["id2"]
    assert outs["out"].agg(F.sum("id2")).first()[0] == 450


def test_branch_routes_exactly_once(foo):
    router = (
        F.when(F.col("grp") == 0, "zero").when(F.col("grp") == 1, "one").otherwise("rest")
    )
    outs = branch(foo, router, ["zero", "one", "rest"])
    counts = {k: v.count() for k, v in outs.items()}
    assert sum(counts.values()) == 10
    assert counts["zero"] == 4  # 0,3,6,9


def test_branch_default_catches_unrouted(foo):
    router = F.when(F.col("grp") == 0, "zero")  # others → null
    outs = branch(foo, router, ["zero"], default="other")
    assert outs["zero"].count() == 4
    assert outs["other"].count() == 6


def test_assemble_branches_roundtrip(foo):
    router = F.when(F.col("grp") == 0, "zero").otherwise("rest")
    outs = branch(foo, router, ["zero", "rest"])
    back = assemble_branches(outs)
    assert back.count() == 10
    assert back.filter("branch = 'zero'").count() == 4


def test_split(foo):
    outs = split(foo, ["id", "grp"], ["foo"])
    assert outs["left"].columns == ["id", "grp"]
    assert outs["right"].columns == ["foo"]


def test_logging_op_observes_metrics_once_per_action(spark):
    from pyspark.sql import Observation, Row

    from asakusafw_spark_spark.operators import logging_op

    df = spark.createDataFrame([Row(k=1), Row(k=None), Row(k=3)])
    obs = Observation("audit")
    out = logging_op(
        df, obs, {"rows": F.count(F.lit(1)), "null_k": F.count_if(F.col("k").isNull())}
    )
    # output == input exactly
    assert sorted(r.k for r in out.collect() if r.k is not None) == [1, 3]
    got = obs.get
    assert got["rows"] == 3 and got["null_k"] == 1


def test_logging_op_default_is_pure_passthrough(spark):
    from pyspark.sql import Row

    from asakusafw_spark_spark.operators import logging_op

    df = spark.createDataFrame([Row(k=1)])
    assert logging_op(df) is df


def test_snapshot_diff_classifies_and_roundtrips(spark, tmp_path):
    """diff ∘ merge_upsert == identity: applying the derived change set
    to the old snapshot reproduces the new snapshot exactly."""
    from asakusafw_spark_spark.operators import snapshot_diff
    from asakusafw_spark_spark.sources.write import merge_upsert

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, None, 40.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),     # unchanged → omitted
            (2, "b2", 20.0),    # update (name)
            (3, "c", None),     # unchanged incl. NULL payload → omitted
            (5, "e", 50.0),     # insert
        ],                       # 4 deleted
        "k long, name string, v double",
    )
    diff = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert {k: r["__op"] for k, r in diff.items()} == {2: "U", 4: "D", 5: "I"}
    assert diff[2]["name"] == "b2"          # U carries NEW payload
    assert diff[4]["v"] == 40.0             # D carries OLD payload

    # roundtrip: old + diff == new
    target = str(tmp_path / "snap")
    old.write.parquet(target)
    changes = snapshot_diff(old, new, "k").withColumn(
        "__del", F.col("__op") == "D"
    ).drop("__op")
    merge_upsert(target, changes, "k", delete_col="__del")
    got = sorted(map(tuple, spark.read.parquet(target).collect()))
    want = sorted(map(tuple, new.collect()))
    assert got == want

    # schema mismatch is rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="schema"):
        snapshot_diff(old, new.drop("v"), "k")


def test_scd2_apply_versions_and_closes(spark):
    """SCD2: changes close the open version at their effective time and
    open a new one; deletes close without a successor; closed history
    passes through untouched; multiple same-batch changes chain."""
    from asakusafw_spark_spark.operators import scd2_apply

    history = spark.createDataFrame(
        [
            # k=1: one closed + one open version
            (1, "v1", "2020-01-01", "2021-01-01", False),
            (1, "v2", "2021-01-01", None, True),
            # k=2: open only (will be deleted)
            (2, "x1", "2020-06-01", None, True),
            # k=3: untouched open row
            (3, "y1", "2020-01-01", None, True),
        ],
        "k long, val string, valid_from string, valid_to string, is_current boolean",
    )
    changes = spark.createDataFrame(
        [
            (1, "v3", "2022-01-01", "U"),
            (1, "v4", "2022-06-01", "U"),   # same batch, later change
            (2, None, "2022-01-01", "D"),
            (4, "z1", "2022-01-01", "I"),
        ],
        "k long, val string, eff string, __op string",
    )
    out = scd2_apply(history, changes, "k", "eff")
    rows = {(r["k"], r["valid_from"]): r for r in out.collect()}

    # k=1: closed row untouched; v2 closed at 2022-01-01; v3 closed at
    # v4's effective time; v4 current
    assert rows[(1, "2020-01-01")]["valid_to"] == "2021-01-01"
    assert rows[(1, "2021-01-01")]["valid_to"] == "2022-01-01"
    assert rows[(1, "2022-01-01")]["valid_to"] == "2022-06-01"
    assert rows[(1, "2022-06-01")]["valid_to"] is None
    assert rows[(1, "2022-06-01")]["is_current"]
    assert not rows[(1, "2022-01-01")]["is_current"]
    # k=2: closed by the delete, no successor
    assert rows[(2, "2020-06-01")]["valid_to"] == "2022-01-01"
    assert (2, "2022-01-01") not in rows
    # k=3 untouched, k=4 inserted current
    assert rows[(3, "2020-01-01")]["valid_to"] is None
    assert rows[(4, "2022-01-01")]["is_current"]
    assert len(rows) == 7  # 4 versions of k=1 + one each of k=2,3,4

    # asof semantics hold: exactly one version covers any instant
    import pytest as _pytest
    with _pytest.raises(ValueError, match="missing columns"):
        scd2_apply(history, changes.drop("val"), "k", "eff")


def test_apply_agg_delta_matches_full_recompute(spark):
    """Incremental aggregate maintenance ≡ full recompute, including
    group birth (I into a new key), group death (count → 0), NULL group
    keys, and U deltas needing the before-image."""
    from asakusafw_spark_spark.operators import apply_agg_delta, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, None, 5.0)],
        "k long, g string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 15.0), (3, "b", 30.0), (4, None, 6.0), (5, "c", 50.0)],
        "k long, g string, v double",
    )
    base = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(27,6)")).alias("sum_v"),
    )
    changes = snapshot_diff(old, new, "k", include_old=True)
    got = apply_agg_delta(base, changes, "g", {"sum_v": "v"})
    want = new.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(27,6)")).alias("sum_v"),
    )
    gt = sorted(map(tuple, got.select("g", "n", F.col("sum_v").cast("double")).collect()),
                key=lambda t: (t[0] is None, t))
    wt = sorted(map(tuple, want.select("g", "n", F.col("sum_v").cast("double")).collect()),
                key=lambda t: (t[0] is None, t))
    assert gt == wt

    # a group-key change must arrive as D+I (the documented contract):
    # diffing WITH g in the key expresses the move that way
    moved = spark.createDataFrame(
        [(1, "b", 15.0), (3, "b", 30.0), (4, None, 6.0), (5, "c", 50.0)],
        "k long, g string, v double",
    )
    ch2 = snapshot_diff(
        new.withColumn("kk", F.concat_ws("|", "k", "g")),
        moved.withColumn("kk", F.concat_ws("|", "k", "g")),
        "kk",
        include_old=True,
    ).drop("kk")
    got2 = apply_agg_delta(got, ch2, "g", {"sum_v": "v"})
    want2 = moved.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(27,6)")).alias("sum_v"),
    )
    g2 = sorted(map(tuple, got2.select("g", "n", F.col("sum_v").cast("double")).collect()),
                key=lambda t: (t[0] is None, t))
    w2 = sorted(map(tuple, want2.select("g", "n", F.col("sum_v").cast("double")).collect()),
                key=lambda t: (t[0] is None, t))
    assert g2 == w2


def test_cdc_loop_properties(spark):
    """Properties of the CDC loop over arbitrary snapshots:

    1. diff ∘ merge == identity (snapshot_diff's change set applied via
       merge semantics reproduces the new snapshot);
    2. apply_agg_delta ∘ diff ≡ full recompute of the new snapshot's
       aggregate, bit-for-bit in the decimal sums;
    3. diff of a snapshot with itself is empty.
    """
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from asakusafw_spark_spark.operators import apply_agg_delta, snapshot_diff

    snap = st.dictionaries(
        st.integers(0, 15),                       # key
        st.tuples(st.integers(0, 3),              # group
                  st.integers(-1000, 1000)),      # value (int → exact)
        max_size=12,
    )

    def to_df(d):
        rows = [(k, f"g{g}", float(v)) for k, (g, v) in sorted(d.items())]
        return spark.createDataFrame(
            rows, "k long, g string, v double"
        ) if rows else spark.createDataFrame([], "k long, g string, v double")

    def agg(df):
        return df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(27,6)")).alias("s"),
        )

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(old=snap, new=snap)
    def check(old, new):
        odf, ndf = to_df(old), to_df(new)
        # (3) self-diff empty
        assert snapshot_diff(odf, odf, "k").count() == 0
        ch = snapshot_diff(odf, ndf, "k", include_old=True)
        # (1) apply the change set by hand: survivors + I/U payloads
        changed = {r["k"] for r in ch.select("k").collect()}
        applied = {k: v for k, v in old.items() if k not in changed}
        for r in ch.filter(F.col("__op") != "D").collect():
            applied[r["k"]] = (int(r["g"][1:]), int(r["v"]))
        assert applied == new
        # (2) incremental ≡ recompute (exact decimal).  Per the
        # apply_agg_delta contract a row MOVING across group keys must
        # arrive as D+I, which snapshot_diff produces exactly when the
        # group key is part of the diff key — so diff on (k, g) here.
        ch2 = snapshot_diff(odf, ndf, ["k", "g"], include_old=True)
        got = sorted(
            map(tuple, apply_agg_delta(agg(odf), ch2, "g", {"s": "v"})
                .select("g", "n", F.col("s").cast("double")).collect())
        )
        want = sorted(
            map(tuple, agg(ndf)
                .select("g", "n", F.col("s").cast("double")).collect())
        )
        assert got == want

    check()


def test_unpivot_melts_measures(spark):
    from asakusafw_spark_spark.operators import unpivot

    df = spark.createDataFrame(
        [(1, 10.0, 0.5), (2, 20.0, None)], "k long, price double, disc double"
    )
    out = unpivot(df, ["k"], ["price", "disc"])
    rows = sorted(map(tuple, out.collect()), key=lambda t: (t[0], t[1]))
    assert rows == [
        (1, "disc", 0.5), (1, "price", 10.0),
        (2, "disc", None), (2, "price", 20.0),
    ]
    # string measures with cast=None keep their type
    s = spark.createDataFrame([(1, "a", "b")], "k long, x string, y string")
    got = sorted(map(tuple, unpivot(s, ["k"], ["x", "y"], cast=None).collect()))
    assert got == [(1, "x", "a"), (1, "y", "b")]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        unpivot(df, ["k"], [])


def test_flatten_struct_recursive(spark):
    from asakusafw_spark_spark.operators import flatten_struct

    df = spark.sql(
        "SELECT 1 AS k, named_struct('a', 10, 'b', "
        "named_struct('c', 'x', 'd', 2.5)) AS s, array(1, 2) AS arr"
    )
    out = flatten_struct(df)
    assert out.columns == ["k", "s_a", "s_b_c", "s_b_d", "arr"]
    r = out.first()
    assert (r["s_a"], r["s_b_c"], r["s_b_d"], r["arr"]) == (10, "x", 2.5, [1, 2])
