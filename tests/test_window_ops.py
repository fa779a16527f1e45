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


def test_resample_timeseries_gaps_zero_and_locf(spark):
    """Gap buckets materialize across each key's span; counts zero-fill,
    LOCF carries the last observed aggregate, avg stays NULL in gaps;
    pre-first-observation LOCF stays NULL; empty input yields a typed
    empty frame."""
    from pyspark.sql import functions as F

    from asakusafw_spark_spark.operators import resample_timeseries

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 5.0),
         ("a", "2024-01-01 00:20:00", 7.0),
         ("a", "2024-01-01 03:40:00", 1.0),
         ("b", "2024-01-01 01:05:00", 2.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_timeseries(
        df, "ts", "1 hour", ["k"],
        {"n": ("count", "v"), "sum_v": ("sum", "v"), "g": ("avg", "v")},
        fill={"n": "zero", "sum_v": "locf"},
    ).orderBy("k", "bucket_start").collect()
    assert len(out) == 5  # a spans 4 buckets (2 empty), b spans 1
    a = [r for r in out if r["k"] == "a"]
    assert [r["n"] for r in a] == [2, 0, 0, 1]
    assert [r["sum_v"] for r in a] == [12.0, 12.0, 12.0, 1.0]  # LOCF
    assert [r["g"] for r in a] == [6.0, None, None, 1.0]  # gaps NULL
    assert str(a[1]["bucket_start"]) == "2024-01-01 01:00:00"
    assert str(a[1]["bucket_end"]) == "2024-01-01 02:00:00"

    empty = resample_timeseries(
        df.limit(0), "ts", "15 minutes", ["k"], {"n": ("count", "v")},
    )
    assert empty.count() == 0
    assert empty.columns == ["k", "bucket_start", "bucket_end", "n"]

    # scale contract: gap generation is explode-over-the-aggregate,
    # never a self-join/union — the data is scanned exactly ONCE
    plan = (
        resample_timeseries(
            df, "ts", "1 hour", ["k"],
            {"n": ("count", "v"), "sum_v": ("sum", "v")},
            fill={"sum_v": "locf"},
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ") == 1
    assert "Join" not in plan

    import pytest as _pt
    with _pt.raises(ValueError, match="unknown agg"):
        resample_timeseries(df, "ts", "1 hour", ["k"], {"x": ("median", "v")})
    with _pt.raises(ValueError, match="unknown fill"):
        resample_timeseries(
            df, "ts", "1 hour", ["k"], {"n": ("count", "v")},
            fill={"n": "interpolate"},
        )


def test_resample_timeseries_interp_fill(spark):
    """Linear interpolation: gap values sit on the line between the
    surrounding observations (b1 = 6 + (1-6)*1/3, b2 = 6 + (1-6)*2/3);
    observed buckets keep their exact value."""
    from pyspark.sql import functions as F

    from asakusafw_spark_spark.operators import resample_timeseries

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 5.0),
         ("a", "2024-01-01 00:20:00", 7.0),
         ("a", "2024-01-01 03:40:00", 1.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_timeseries(
        df, "ts", "1 hour", ["k"],
        {"g": ("avg", "v")}, fill={"g": "interp"},
    ).orderBy("bucket_start").collect()
    got = [r["g"] for r in out]
    assert got[0] == 6.0 and got[3] == 1.0
    assert abs(got[1] - (6.0 + (1.0 - 6.0) / 3)) < 1e-12
    assert abs(got[2] - (6.0 + (1.0 - 6.0) * 2 / 3)) < 1e-12


def test_resample_timeseries_property_invariants(spark):
    """Property (hypothesis): for ANY event set — keys, timestamps,
    values (incl. NULLs) — the resampled grid (a) is gapless and
    exactly spans each key's [first, last] bucket, (b) zero-filled
    counts sum to the non-null row count per key, (c) LOCF equals the
    most recent observed aggregate at every bucket, and (d) interp is
    bounded by its surrounding observations (monotone segments)."""
    import datetime

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from asakusafw_spark_spark.operators import resample_timeseries

    event = st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=600),  # minutes offset
        st.one_of(st.none(), st.floats(min_value=-50, max_value=50,
                                       allow_nan=False, width=16)),
    )

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(st.lists(event, min_size=1, max_size=25))
    def prop(events):
        t0 = datetime.datetime(2024, 1, 1)
        rows = [
            (k, t0 + datetime.timedelta(minutes=m), v) for k, m, v in events
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = resample_timeseries(
            df, "ts", "1 hour", ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "g": ("avg", "v")},
            fill={"n": "zero", "s": "locf", "g": "interp"},
        ).orderBy("k", "bucket_start").collect()

        by_key: dict = {}
        for r in out:
            by_key.setdefault(r["k"], []).append(r)
        import collections

        expected_n = collections.Counter(
            (k, m // 60) for k, m, v in events if v is not None
        )
        expected_keys = {k for k, _, _ in events}
        assert set(by_key) == expected_keys  # every key appears (even all-null)
        for k, rs in by_key.items():
            # (a) gapless hourly span
            starts = [r["bucket_start"] for r in rs]
            for p, n in zip(starts, starts[1:]):
                assert (n - p) == datetime.timedelta(hours=1)
            # (b) counts
            for r in rs:
                b = int((r["bucket_start"] - t0).total_seconds()) // 3600
                assert r["n"] == expected_n.get((k, b), 0)
            # (c) LOCF: recompute expected sums per bucket
            obs: dict = {}
            for kk, m, v in events:
                if kk == k and v is not None:
                    obs.setdefault(m // 60, []).append(v)
            last = None
            for r in rs:
                b = int((r["bucket_start"] - t0).total_seconds()) // 3600
                if b in obs:
                    # mirror the engine's exact-decimal(27,6) contract:
                    # each value quantizes to 6 places (HALF_UP) before
                    # the order-free sum
                    import decimal as _d

                    q = _d.Decimal("0.000001")
                    last = float(sum(
                        _d.Decimal(repr(x)).quantize(q, _d.ROUND_HALF_UP)
                        for x in obs[b]
                    ))
                if last is None:
                    assert r["s"] is None
                else:
                    assert r["s"] is not None and abs(r["s"] - last) < 1e-9
            # (d) interp bounded by neighbours where defined
            gs = [r["g"] for r in rs]
            known = [(i, g) for i, g in enumerate(gs) if g is not None]
            for (i1, g1), (i2, g2) in zip(known, known[1:]):
                lo, hi = min(g1, g2), max(g1, g2)
                for j in range(i1 + 1, i2):
                    assert gs[j] is None or lo - 1e-9 <= gs[j] <= hi + 1e-9

    prop()


def test_resample_timeseries_non_utc_session(spark):
    """The step length must NOT absorb the session-zone offset at the
    1970 anchor (ADVICE r08): in America/New_York the old expression
    made a '1 hour' step 21600s; in a positive-offset zone it went
    negative and broke F.sequence.  Bucketing must be identical to the
    UTC session's."""
    import datetime

    from pyspark.sql import functions as F

    from asakusafw_spark_spark.operators import resample_timeseries

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00", 5.0),
         ("a", "2024-01-01 03:40:00", 1.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ref = resample_timeseries(
        df, "ts", "1 hour", ["k"], {"n": ("count", "v")}, fill={"n": "zero"}
    ).orderBy("bucket_start").collect()
    assert len(ref) == 4
    prev = spark.conf.get("spark.sql.session.timeZone")
    for tz in ("America/New_York", "Asia/Tokyo"):
        spark.conf.set("spark.sql.session.timeZone", tz)
        try:
            got = resample_timeseries(
                df, "ts", "1 hour", ["k"], {"n": ("count", "v")},
                fill={"n": "zero"},
            ).orderBy("bucket_start").collect()
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)
        # string literals parse in the session zone, so the wall-clock
        # buckets shift — but the step must stay one hour and the grid
        # gapless with identical counts
        assert [r["n"] for r in got] == [r["n"] for r in ref]
        starts = [r["bucket_start"] for r in got]
        assert all(
            (b - a) == datetime.timedelta(hours=1)
            for a, b in zip(starts, starts[1:])
        )


def test_resample_timeseries_negative_epoch_floor(spark):
    """Pre-1970 timestamps floor DOWN like the oracle's
    floor(epoch/step): 1969-12-31 23:30 belongs to the 23:00 bucket,
    not 1970-01-01 00:00 (ADVICE r08 cast-truncate bug)."""
    from pyspark.sql import functions as F

    from asakusafw_spark_spark.operators import resample_timeseries

    df = spark.createDataFrame(
        [("a", "1969-12-31 23:30:00", 1.0),
         ("a", "1970-01-01 00:30:00", 2.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_timeseries(
        df, "ts", "1 hour", ["k"], {"n": ("count", "v")}, fill={"n": "zero"}
    ).orderBy("bucket_start").collect()
    assert [str(r["bucket_start"]) for r in out] == [
        "1969-12-31 23:00:00",
        "1970-01-01 00:00:00",
    ]
    assert all(r["bucket_start"] <= df.collect()[0]["ts"] or i > 0
               for i, r in enumerate(out))
    assert [r["n"] for r in out] == [1, 1]


def test_resample_timeseries_max_buckets_guard(spark):
    """The adversarial-span guard: a key whose gap would explode more
    than max_buckets_per_key rows fails fast (executor-side
    raise_error), a compliant frame passes through unchanged, and the
    cap validates."""
    import pytest
    from pyspark.sql import functions as F

    from asakusafw_spark_spark.operators import resample_timeseries

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1.0),
         ("a", "2024-03-01 00:00:00", 2.0)],  # ~60 days → 5184001 seconds
        "k string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(Exception, match="max_buckets_per_key"):
        resample_timeseries(
            df, "ts", "1 second", ["k"], {"n": ("count", "v")},
            max_buckets_per_key=10_000,
        ).collect()
    ok = resample_timeseries(
        df, "ts", "1 day", ["k"], {"n": ("count", "v")}, fill={"n": "zero"},
        max_buckets_per_key=100,
    ).collect()
    assert len(ok) == 61
    with pytest.raises(ValueError, match="max_buckets_per_key"):
        resample_timeseries(
            df, "ts", "1 hour", ["k"], {"n": ("count", "v")},
            max_buckets_per_key=0,
        )
