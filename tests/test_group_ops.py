"""Summarize / Fold / CoGroup / GroupSort tests (reference CoGroupSpec,
AggregateSpec patterns — incl. partitioning invariance)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from asakusafw_spark_spark.operators import summarize, fold, cogroup, group_sort, Grouping


@pytest.fixture(scope="module")
def foo(spark):
    rows = [(i, i % 3, float(i), None if i == 7 else i * 10) for i in range(10)]
    return spark.createDataFrame(rows, "id int, grp int, v double, nv int")


@pytest.fixture(scope="module")
def bar(spark):
    # multiple bars per foo-group, with an ord column for secondary sort
    rows = [(100 + i, i % 3, 9 - i) for i in range(9)]
    return spark.createDataFrame(rows, "bid int, grp int, ord int")


def test_summarize_all_kinds(foo):
    out = summarize(
        foo,
        ["grp"],
        {
            "n": ("count", "id"),
            "sum_v": ("sum", "v"),
            "max_v": ("max", "v"),
            "min_v": ("min", "v"),
            "any_id": ("any", "id"),
        },
    )
    r = {x.grp: x for x in out.collect()}
    assert r[0].n == 4 and r[0].sum_v == 0 + 3 + 6 + 9
    assert r[1].max_v == 7.0 and r[1].min_v == 1.0
    assert r[0].any_id == 0  # deterministic ANY = min


def test_summarize_null_skipping(foo):
    # nv is null for id=7 (grp 1): SUM skips nulls, COUNT counts records
    out = summarize(foo, ["grp"], {"n": ("count", "nv"), "s": ("sum", "nv")})
    r = {x.grp: x for x in out.collect()}
    assert r[1].n == 3  # count(*) semantics — group members {1,4,7}
    assert r[1].s == 10 + 40  # null (id=7) skipped


def test_fold_native_exprs(foo):
    out = fold(foo, ["grp"], exprs={"id": F.min("id"), "v": F.sum("v"), "nv": F.sum("nv")})
    r = {x.grp: x for x in out.collect()}
    assert r[2].v == 2 + 5 + 8


def test_fold_python_fn_same_schema(foo):
    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        first = pdf.iloc[[0]].copy()
        first["v"] = pdf["v"].sum()
        return first

    out = fold(foo, ["grp"], fn=reduce_group, ordering=[("id", "asc")])
    assert out.columns == ["id", "grp", "v", "nv"]
    r = {x.grp: x for x in out.collect()}
    assert r[0].id == 0 and r[0].v == 18.0


@pytest.mark.parametrize("parts", [1, 4, 17])
def test_cogroup_two_inputs_sorted(spark, foo, bar, parts):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:

        def fn(key, foos: pd.DataFrame, bars: pd.DataFrame) -> pd.DataFrame:
            # emit one row: group, count of each side, first bar ord (sorted desc)
            return pd.DataFrame(
                {
                    "grp": [key[0]],
                    "nfoo": [len(foos)],
                    "nbar": [len(bars)],
                    "first_ord": [None if bars.empty else int(bars.iloc[0]["ord"])],
                }
            )

        out = cogroup(
            [Grouping(foo, ["grp"]), Grouping(bar, ["grp"], [("ord", "desc")])],
            fn,
            "grp int, nfoo long, nbar long, first_ord int",
        )
        r = {x.grp: x for x in out.collect()}
        assert r[0].nfoo == 4 and r[0].nbar == 3
        assert r[0].first_ord == 9  # ords for grp0: 9,6,3 → desc first = 9
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")


def test_cogroup_three_inputs(spark, foo, bar):
    baz = spark.createDataFrame([(0, "a"), (1, "b")], "grp int, tag string")

    def fn(key, foos, bars, bazs) -> pd.DataFrame:
        return pd.DataFrame(
            {"grp": [key[0]], "total": [len(foos) + len(bars) + len(bazs)]}
        )

    out = cogroup(
        [Grouping(foo, ["grp"]), Grouping(bar, ["grp"]), Grouping(baz, ["grp"])],
        fn,
        "grp int, total long",
    )
    r = {x.grp: x.total for x in out.collect()}
    assert r[0] == 4 + 3 + 1
    assert r[1] == 3 + 3 + 1
    assert r[2] == 3 + 3 + 0


def test_group_sort_emits_per_group(spark, bar):
    def top1(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.iloc[[0]]

    out = group_sort(bar, ["grp"], [("ord", "desc")], top1, bar.schema)
    r = {x.grp: x.ord for x in out.collect()}
    assert r == {0: 9, 1: 8, 2: 7}


def test_cogroup_null_keys_group_together(spark):
    import pandas as pd
    from pyspark.sql import Row

    a = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=None, v="x"), Row(k=None, v="y")],
        "k int, v string",
    )
    b = spark.createDataFrame([Row(k=None, w=9)], "k int, w int")

    def fn(key, apdf, bpdf):
        return {"k": key[0], "n_a": len(apdf), "n_b": len(bpdf)}

    out = {
        r.k: (r.n_a, r.n_b)
        for r in cogroup(
            [Grouping(a, ["k"]), Grouping(b, ["k"])],
            fn,
            "k int, n_a long, n_b long",
        ).collect()
    }
    assert out[1] == (1, 0)
    assert out[None] == (2, 1)  # SQL GROUP BY semantics: nulls form one group


def test_cogroup_empty_input_side(spark):
    from pyspark.sql import Row

    a = spark.createDataFrame([Row(k=1, v="a")], "k int, v string")
    b = spark.createDataFrame([], "k int, w int")

    def fn(key, apdf, bpdf):
        return {"k": key[0], "n_a": len(apdf), "n_b": len(bpdf)}

    rows = cogroup(
        [Grouping(a, ["k"]), Grouping(b, ["k"])], fn, "k int, n_a long, n_b long"
    ).collect()
    assert [(r.k, r.n_a, r.n_b) for r in rows] == [(1, 1, 0)]


def test_fold_python_path_matches_native_exprs(spark, sf_dir):
    import pandas as pd

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey", "l_quantity")
        .limit(500)
    )
    native = fold(li, ["l_suppkey"], exprs={"l_quantity": F.max("l_quantity")})

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"l_suppkey": [pdf["l_suppkey"].iloc[0]], "l_quantity": [pdf["l_quantity"].max()]}
        )

    python = fold(li, ["l_suppkey"], fn=fn)
    a = sorted(map(tuple, native.collect()))
    b = sorted(map(tuple, python.collect()))
    assert a == b


def test_fold_partial_giant_group_bounded_memory(spark):
    """A group ~100x the Arrow batch size completes via eager partial
    collapse (reference BufferType.SPILL analogue): the carry buffer is
    folded into one accumulator record at every batch boundary."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
    try:
        df = spark.range(200_000).select(
            (F.col("id") % 2).cast("int").alias("k"), F.col("id").alias("v")
        )

        def fsum(pdf):
            return pd.DataFrame([{"k": pdf["k"].iloc[0], "v": pdf["v"].sum()}])

        rows = {r.k: r.v for r in fold(df, ["k"], fn=fsum, partial=True).collect()}
        n = 200_000
        total = n * (n - 1) // 2
        odd = sum(range(1, n, 2))
        assert rows == {0: total - odd, 1: odd}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_fold_partial_high_cardinality_flush(spark):
    """The pre-fold accumulator FLUSHES past max_live_keys (VERDICT r13
    Next #5): near-unique keys — the combiner's worst case — must not
    grow the map-side dict O(distinct keys).  Driving _map_side_prefold
    directly with a tiny flush threshold forces many flush cycles per
    partition; the reduce-side fold must merge the resulting multiple
    partials per key back to the exact answer."""
    from asakusafw_spark_spark.operators.group import (
        Grouping,
        _map_side_prefold,
        cogroup,
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        # 1_000 distinct keys x50 over 2 partitions >> max_live_keys=64,
        # but a 500-row batch holds ~390 distinct (< the 0.9 skip
        # threshold) so the COMBINE path runs and must flush repeatedly
        n = 50_000
        df = spark.range(n).repartition(2).select(
            (F.col("id") % 1_000).cast("int").alias("k"),
            F.lit(1).cast("long").alias("v"),
        )

        def fsum(pdf):
            return pd.DataFrame([{"k": pdf["k"].iloc[0], "v": pdf["v"].sum()}])

        cols = ["k", "v"]
        pre = _map_side_prefold(df, ["k"], fsum, cols, max_live_keys=64)
        out = cogroup(
            [Grouping(pre, ["k"])],
            lambda _k, pdf: fsum(pdf)[cols],
            df.schema,
            partial=True,
        )
        rows = {r.k: r.v for r in out.collect()}
        assert len(rows) == 1_000
        assert all(v == 50 for v in rows.values())
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_fold_partial_near_unique_keys_passthrough(spark):
    """Keys ≈ rows (the combiner's degenerate case) must produce exact
    results via the passthrough skip — raw rows are valid partials under
    the @Fold reduce-side contract — and must not regress when a key's
    rows straddle the passthrough batches."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        n = 20_000
        df = spark.range(n).repartition(2).select(
            (F.col("id") % 10_000).cast("int").alias("k"),
            F.lit(1).cast("long").alias("v"),
        )

        def fsum(pdf):
            return pd.DataFrame([{"k": pdf["k"].iloc[0], "v": pdf["v"].sum()}])

        rows = {r.k: r.v for r in fold(df, ["k"], fn=fsum, partial=True).collect()}
        assert len(rows) == 10_000
        assert all(v == 2 for v in rows.values())
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_fold_partial_prefold_mode_not_pinned_to_first_batch(spark):
    """ADVICE r14 (group.py prefold): the combine/passthrough decision
    must not be made solely from the first Arrow batch.

    (a) a SMALL (<1024-row) all-distinct first batch must NOT flip the
    partition to passthrough — the clustered remainder must still be
    map-side combined (output rows ≪ input rows);
    (b) once passthrough IS entered from a representative batch, the
    ratio is re-validated every 16th batch, so a partition whose tail
    turns key-clustered drops back to combining."""
    from asakusafw_spark_spark.operators.group import _map_side_prefold

    def fsum(pdf):
        return pd.DataFrame([{"k": pdf["k"].iloc[0], "v": pdf["v"].sum()}])

    cols = ["k", "v"]
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    try:
        # (a) 500-row first batch, 500 distinct keys (ratio 1.0 but
        # under the 1024-row representativeness floor), then 49.5k
        # rows over 10 hot keys.  Old code: passthrough forever →
        # ~50k output rows.  New code: combine → ~510 partials.
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
        df = spark.range(50_000, numPartitions=1).select(
            F.when(F.col("id") < 500, F.col("id"))
            .otherwise(500 + F.col("id") % 10)
            .cast("int")
            .alias("k"),
            F.lit(1).cast("long").alias("v"),
        )
        n_a = _map_side_prefold(df, ["k"], fsum, cols).count()
        assert n_a < 2_000, f"small first batch pinned passthrough: {n_a} rows"

        # (b) 2000-row batches: batch 1 is all-distinct (passthrough
        # engages legitimately), the tail is 10 hot keys.  Re-validation
        # at every 16th batch must drop back to combining: output is
        # the raw passthrough prefix (≤ ~32k) plus a handful of
        # partials, NOT the full 80k.
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        df_b = spark.range(80_000, numPartitions=1).select(
            F.when(F.col("id") < 2_000, F.col("id"))
            .otherwise(2_000 + F.col("id") % 10)
            .cast("int")
            .alias("k"),
            F.lit(1).cast("long").alias("v"),
        )
        n_b = _map_side_prefold(df_b, ["k"], fsum, cols).count()
        assert n_b < 40_000, f"passthrough never re-validated: {n_b} rows"

        # correctness through the full fold on the clustered frame
        rows = {r.k: r.v for r in fold(df, ["k"], fn=fsum, partial=True).collect()}
        assert len(rows) == 510
        assert rows[505] == 49_500 // 10
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_cogroup_max_buffered_rows_fail_fast_names_key(spark):
    """In strict mode (on_overflow='error'), an over-limit group raises a
    diagnosable error carrying the key value instead of OOMing the
    executor."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        df = spark.range(10_000).select(F.lit(42).alias("k"), F.col("id").alias("v"))

        def fn(key, pdf):
            return {"k": key[0], "n": len(pdf)}

        bad = cogroup(
            [Grouping(df, ["k"])], fn, "k int, n long",
            max_buffered_rows=2_000, on_overflow="error",
        )
        with pytest.raises(Exception, match=r"\(42,\).*max_buffered_rows"):
            bad.collect()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_cogroup_giant_group_spills_and_completes(spark):
    """Default on_overflow='spill': a group far larger than
    max_buffered_rows spills its carry to local disk (Arrow IPC) and the
    consumer still sees the complete, correctly-ordered group at group
    end — the reference's BufferType.SPILL analogue."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        # one giant group (k=42, 50k rows ≫ 2k limit) + normal small groups
        giant = spark.range(50_000).select(
            F.lit(42).alias("k"), F.col("id").alias("v")
        )
        small = spark.range(100).select(
            (F.col("id") % 10 + 100).cast("long").alias("k"), F.col("id").alias("v")
        )
        df = giant.unionByName(small)

        def fn(key, pdf):
            # whole-group consumer: needs every row at once, in sort order
            vs = pdf["v"].to_numpy()
            assert (vs[1:] >= vs[:-1]).all(), "group arrived out of order"
            return {"k": key[0], "n": len(pdf), "s": int(vs.sum())}

        out = cogroup(
            [Grouping(df, ["k"], ordering=[("v", "asc")])],
            fn,
            "k long, n long, s long",
            max_buffered_rows=2_000,
        )
        rows = {r.k: (r.n, r.s) for r in out.collect()}
        n = 50_000
        assert rows[42] == (n, n * (n - 1) // 2)
        assert len(rows) == 11
        for k in range(100, 110):
            assert rows[k][0] == 10
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_cogroup_spill_multi_input_preserves_tags(spark):
    """Spill path with TWO inputs: per-input slices survive the disk
    round-trip (tag column and all-null wide columns keep their types)."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "300")
    try:
        a = spark.range(5_000).select(F.lit(1).alias("k"), F.col("id").alias("x"))
        b = spark.range(2_500).select(
            F.lit(1).alias("k"), (F.col("id") * 2).alias("y"), F.lit("s").alias("tag")
        )

        def fn(key, pa_, pb_):
            return {
                "k": key[0],
                "na": len(pa_),
                "nb": len(pb_),
                "sx": int(pa_["x"].sum()),
                "sy": int(pb_["y"].sum()),
            }

        out = cogroup(
            [Grouping(a, ["k"], [("x", "asc")]), Grouping(b, ["k"], [("y", "desc")])],
            fn,
            "k long, na long, nb long, sx long, sy long",
            max_buffered_rows=1_000,
        )
        r = out.collect()[0]
        assert (r.na, r.nb) == (5_000, 2_500)
        assert r.sx == 5_000 * 4_999 // 2
        assert r.sy == 2 * (2_500 * 2_499 // 2)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_fold_partial_matches_unpartial(spark, sf_dir):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
    )

    def fmax(pdf):
        return pd.DataFrame(
            [{
                "l_returnflag": pdf["l_returnflag"].iloc[0],
                "l_quantity": pdf["l_quantity"].max(),
                "l_extendedprice": pdf["l_extendedprice"].min(),
            }]
        )

    a = sorted(map(tuple, fold(li, ["l_returnflag"], fn=fmax).collect()))
    b = sorted(map(tuple, fold(li, ["l_returnflag"], fn=fmax, partial=True).collect()))
    assert a == b


def test_cogroup_chunked_matches_buffered(spark, foo, bar):
    """chunked=True must produce the same results as the buffered path."""

    def buffered_fn(key, foos, bars):
        return {
            "grp": key[0],
            "nfoo": len(foos),
            "nbar": len(bars),
            "sum_v": float(foos["v"].sum()),
            "first_ord": None if bars.empty else int(bars.iloc[0]["ord"]),
        }

    def chunked_fn(key, chunks):
        nfoo = nbar = 0
        sum_v = 0.0
        first_ord = None
        for i, df in chunks:
            if i == 0:
                nfoo += len(df)
                sum_v += float(df["v"].sum())
            else:
                nbar += len(df)
                if first_ord is None:
                    first_ord = int(df.iloc[0]["ord"])
        return {
            "grp": key[0], "nfoo": nfoo, "nbar": nbar,
            "sum_v": sum_v, "first_ord": first_ord,
        }

    schema = "grp int, nfoo long, nbar long, sum_v double, first_ord int"
    inputs = [Grouping(foo, ["grp"]), Grouping(bar, ["grp"], [("ord", "desc")])]
    a = sorted(map(tuple, cogroup(inputs, buffered_fn, schema).collect()))
    b = sorted(map(tuple, cogroup(inputs, chunked_fn, schema, chunked=True).collect()))
    assert a == b and len(a) == 3


def test_cogroup_chunked_giant_group_streams_in_pieces(spark):
    """A group far larger than one Arrow batch arrives as MULTIPLE chunks
    (nothing buffered), sort order survives across chunk boundaries, and
    the incremental result is exact."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        n = 5000
        df = spark.range(n).select(
            (F.col("id") % 2).alias("grp"), F.col("id").alias("x")
        )

        def fn(key, chunks):
            total = cnt = n_chunks = 0
            last = None
            monotone = True
            for _, c in chunks:
                n_chunks += 1
                cnt += len(c)
                total += int(c["x"].sum())
                xs = c["x"].tolist()
                if last is not None and xs and xs[0] < last:
                    monotone = False
                if xs:
                    if any(b < a for a, b in zip(xs, xs[1:])):
                        monotone = False
                    last = xs[-1]
            return {
                "grp": int(key[0]), "cnt": cnt, "total": total,
                "n_chunks": n_chunks, "monotone": monotone,
            }

        out = cogroup(
            [Grouping(df, ["grp"], [("x", "asc")])],
            fn,
            "grp long, cnt long, total long, n_chunks long, monotone boolean",
            chunked=True,
        )
        r = {x.grp: x for x in out.collect()}
        for g in (0, 1):
            xs = range(g, n, 2)
            assert r[g].cnt == len(xs) and r[g].total == sum(xs)
            assert r[g].monotone
            assert r[g].n_chunks > 5  # 2500 rows / 100-row batches
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_cogroup_chunked_partial_consume_and_validation(spark, foo, bar):
    # fn that stops reading after the first chunk — the executor must
    # drain the remainder and keep group boundaries intact
    def lazy_fn(key, chunks):
        for i, df in chunks:
            return {"grp": key[0], "first_n": len(df)}
        return {"grp": key[0], "first_n": 0}

    out = cogroup(
        [Grouping(foo, ["grp"]), Grouping(bar, ["grp"])],
        lazy_fn,
        "grp int, first_n long",
        chunked=True,
    ).collect()
    assert len(out) == 3 and all(x.first_n > 0 for x in out)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="chunked"):
        cogroup(
            [Grouping(foo, ["grp"])],
            lazy_fn,
            "grp int, first_n long",
            chunked=True,
            partial=True,
        )


def test_ansi_grouping_sets_empty_input_global_row(spark):
    """ANSI: the () grouping set is a global aggregate — ONE row even
    over an empty table (Spark's native Expand-based rollup returns
    zero; DuckDB/Postgres return one — the r14 empty-corpus gate)."""
    from asakusafw_spark_spark.operators import (
        ansi_grouping_sets,
        cube_agg,
        rollup_agg,
    )

    empty = spark.createDataFrame([], "k string, j string, v long")
    aggs = {"n": F.count(F.lit(1)), "s": F.sum("v")}

    r = rollup_agg(empty, ["k", "j"], aggs).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.k, row.j, row.n, row.s) == (None, None, 0, None)

    c = cube_agg(empty, ["k", "j"], aggs).collect()
    assert len(c) == 1 and c[0].n == 0

    g = ansi_grouping_sets(empty, [("k",), ()], aggs).collect()
    assert len(g) == 1 and g[0].n == 0


def test_ansi_grouping_sets_matches_native_on_rows(spark):
    """On non-empty input the split plan must equal Spark's native
    rollup/cube exactly (same rows including null-filled subtotals)."""
    from asakusafw_spark_spark.operators import cube_agg, rollup_agg

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3), (None, "y", 4)],
        "k string, j string, v long",
    )
    aggs = {"n": F.count(F.lit(1)), "s": F.sum("v")}

    got = sorted(
        map(tuple, rollup_agg(df, ["k", "j"], aggs).collect()),
        key=lambda t: tuple(map(str, t)),
    )
    want = sorted(
        map(
            tuple,
            df.rollup("k", "j")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect(),
        ),
        key=lambda t: tuple(map(str, t)),
    )
    assert got == want

    got_c = sorted(
        map(tuple, cube_agg(df, ["k", "j"], aggs).collect()),
        key=lambda t: tuple(map(str, t)),
    )
    want_c = sorted(
        map(
            tuple,
            df.cube("k", "j")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect(),
        ),
        key=lambda t: tuple(map(str, t)),
    )
    assert got_c == want_c
