"""Unit tests: confluent, running_agg, sessionize_batch (SURVEY.md §2.6 / §2.8)."""

import datetime

from pyspark.sql import Row, functions as F

from asakusafw_spark_spark.operators import confluent, running_agg, sessionize_batch


def test_confluent_unions_all_rows(spark):
    a = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    b = spark.createDataFrame([Row(k=3, v="c")])
    c = spark.createDataFrame([Row(v="d", k=4)])  # column order differs → byName
    out = confluent([a, b, c])
    assert sorted(r.k for r in out.collect()) == [1, 2, 3, 4]


def test_confluent_ordering_sorts_within_partitions(spark):
    a = spark.createDataFrame([Row(k=3), Row(k=1)]).coalesce(1)
    b = spark.createDataFrame([Row(k=2)]).coalesce(1)
    out = confluent([a, b], ordering=[("k", "asc")]).coalesce(1)
    # after coalesce(1) + re-sort the single partition must be ordered
    vals = [r.k for r in confluent([out], ordering=[("k", "asc")]).collect()]
    assert vals == sorted(vals)


def test_running_agg_cumulative_per_group(spark):
    df = spark.createDataFrame(
        [Row(g="x", seq=i, v=float(i)) for i in range(1, 4)]
        + [Row(g="y", seq=1, v=10.0)]
    )
    out = running_agg(
        df, ["g"], [("seq", "asc")], {"rsum": F.sum("v"), "rcnt": F.count(F.lit(1))}
    )
    rows = {(r.g, r.seq): (r.rsum, r.rcnt) for r in out.collect()}
    assert rows[("x", 1)] == (1.0, 1)
    assert rows[("x", 2)] == (3.0, 2)
    assert rows[("x", 3)] == (6.0, 3)
    assert rows[("y", 1)] == (10.0, 1)


def test_sessionize_batch_gap_splits_sessions(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [
            Row(u=1, ts=ts(0)),
            Row(u=1, ts=ts(10)),  # within 30min gap → same session
            Row(u=1, ts=ts(70)),  # > 30min after previous → new session
            Row(u=2, ts=ts(0)),
        ]
    )
    out = sessionize_batch(
        df, "ts", "30 minutes", ["u"], {"n": F.count(F.lit(1))}
    ).collect()
    sess = sorted((r.u, r.n) for r in out)
    assert sess == [(1, 1), (1, 2), (2, 1)]
    by_start = {(r.u, r.session_start): r for r in out}
    first = by_start[(1, ts(0))]
    # session end = last event + gap
    assert first.session_end == ts(40)
