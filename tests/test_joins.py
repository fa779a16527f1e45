"""Master/transaction join family tests — mirrors the reference's
Foo(master)/Bar(tx) patterns (runtime CoGroupSpec / join fragment specs)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from asakusafw_spark_spark.operators import (
    master_join,
    master_check,
    master_branch,
    master_join_update,
    MasterSelection,
)


@pytest.fixture(scope="module")
def masters(spark):
    # two masters share key 2 → selection must pick exactly one
    return spark.createDataFrame(
        [(1, "m1", 100.0), (2, "m2a", 50.0), (2, "m2b", 200.0), (4, "m4", 10.0)],
        "k int, name string, score double",
    )


@pytest.fixture(scope="module")
def txs(spark):
    return spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 6.0), (12, 3, 7.0), (13, 2, 8.0)],
        "tid int, k int, amount double",
    )


@pytest.mark.parametrize("strategy", ["auto", "broadcast", "shuffled"])
def test_master_join_hit_and_miss(masters, txs, strategy):
    out = master_join(masters, txs, ["k"], strategy=strategy)
    joined = out["joined"].orderBy("tid").collect()
    missed = out["missed"].collect()
    assert [r.tid for r in joined] == [10, 11, 13]
    # default selection = first master of sorted group → (2,'m2a',50.0)
    by_tid = {r.tid: r for r in joined}
    assert by_tid[11].name == "m2a"
    assert [r.tid for r in missed] == [12]


def test_master_join_mapping(masters, txs):
    out = master_join(
        masters,
        txs,
        ["k"],
        mapping={"tid": "t.tid", "mname": "m.name", "total": F.col("amount") + F.col("__m_score")},
    )
    r = {x.tid: x for x in out["joined"].collect()}
    assert r[10].mname == "m1" and r[10].total == 105.0


def test_master_join_ordering_selection(masters, txs):
    # pick master with highest score per key
    sel = MasterSelection(ordering=[("score", "desc")])
    out = master_join(masters, txs, ["k"], selection=sel)
    by_tid = {r.tid: r for r in out["joined"].collect()}
    assert by_tid[11].name == "m2b"


def test_master_join_where_selection(masters, txs):
    # candidate refinement depending on tx: master.score > tx.amount*10
    sel = MasterSelection(where=F.col("__m_score") > F.col("amount") * 10)
    out = master_join(masters, txs, ["k"], selection=sel)
    by_tid = {r.tid: r for r in out["joined"].collect()}
    assert by_tid[10].name == "m1"  # 100 > 50
    assert by_tid[11].name == "m2b"  # only 200 > 60
    assert 13 in by_tid and by_tid[13].name == "m2b"  # 200 > 80, 50 fails
    assert {r.tid for r in out["missed"].collect()} == {12}


def test_master_join_custom_fn_selection(masters, txs):
    # python selector: choose the LAST master of the sorted group
    def pick_last(m_pdf: pd.DataFrame, trow: pd.Series):
        return len(m_pdf) - 1

    sel = MasterSelection(ordering=[("name", "asc")], select_fn=pick_last)
    out = master_join(masters, txs, ["k"], selection=sel)
    by_tid = {r.tid: r for r in out["joined"].collect()}
    assert by_tid[11].name == "m2b"
    assert {r.tid for r in out["missed"].collect()} == {12}


@pytest.mark.parametrize("strategy", ["auto", "broadcast"])
def test_master_check(masters, txs, strategy):
    out = master_check(masters, txs, ["k"], strategy=strategy)
    assert {r.tid for r in out["found"].collect()} == {10, 11, 13}
    assert {r.tid for r in out["missed"].collect()} == {12}
    # existence only: schema is the tx schema
    assert out["found"].columns == ["tid", "k", "amount"]


def test_master_branch_null_master_allowed(masters, txs):
    router = (
        F.when(F.col("__m_k").isNull(), "nomaster")
        .when(F.col("__m_score") >= 100, "big")
        .otherwise("small")
    )
    outs = master_branch(masters, txs, ["k"], router, ["big", "small", "nomaster"])
    assert {r.tid for r in outs["big"].collect()} == {10}
    assert {r.tid for r in outs["small"].collect()} == {11, 13}
    assert {r.tid for r in outs["nomaster"].collect()} == {12}
    assert outs["big"].columns == ["tid", "k", "amount"]


def test_master_join_update(masters, txs):
    out = master_join_update(
        masters, txs, ["k"], updates={"amount": F.col("amount") + F.col("__m_score")}
    )
    by_tid = {r.tid: r for r in out["updated"].collect()}
    assert by_tid[10].amount == 105.0
    assert by_tid[11].amount == 56.0  # first-of-group master m2a (50)
    assert {r.tid for r in out["missed"].collect()} == {12}
    assert out["updated"].columns == ["tid", "k", "amount"]


def test_asof_join_backward_picks_latest_at_or_before(spark):
    import datetime

    from asakusafw_spark_spark.operators import asof_join

    d = lambda s: datetime.datetime.fromisoformat(s)
    quotes = spark.createDataFrame(
        [(1, d("2024-01-01 10:00"), 100.0),
         (1, d("2024-01-01 11:00"), 110.0),
         (2, d("2024-01-01 10:30"), 200.0)],
        "sym long, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, d("2024-01-01 10:30")),   # → 10:00 quote
         (1, d("2024-01-01 11:00")),   # boundary: ≤ includes 11:00
         (1, d("2024-01-01 09:00")),   # no quote yet → missed
         (2, d("2024-01-01 12:00")),
         (3, d("2024-01-01 12:00"))],  # unknown symbol → missed
        "sym long, tts timestamp",
    )
    out = asof_join(trades, quotes, ["sym"], left_ts="tts", right_ts="qts")
    joined = {(r.sym, r.tts): r.px for r in out["joined"].collect()}
    assert joined[(1, d("2024-01-01 10:30"))] == 100.0
    assert joined[(1, d("2024-01-01 11:00"))] == 110.0
    assert joined[(2, d("2024-01-01 12:00"))] == 200.0
    missed = {(r.sym, r.tts) for r in out["missed"].collect()}
    assert missed == {(1, d("2024-01-01 09:00")), (3, d("2024-01-01 12:00"))}


def test_group_view_broadcast_lookup(spark, sf_dir):
    import pandas as pd

    from asakusafw_spark_spark.operators import group_view

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    view = group_view(nation, ["n_nationkey"])
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )

    def enrich(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_name"] = [
                (view.value.get((k,), [{}])[0].get("n_name")) for k in pdf["c_nationkey"]
            ]
            yield pdf

    out = customer.mapInPandas(
        enrich, schema="c_custkey long, c_nationkey int, n_name string"
    )
    rows = out.collect()
    assert len(rows) == customer.count()
    assert all(r.n_name is not None for r in rows)
    # spot-check against a real join
    joined = {r.c_custkey: r.n_name for r in customer.join(
        nation, customer.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "n_name").collect()}
    assert all(joined[r.c_custkey] == r.n_name for r in rows)


def test_group_view_transfer_paths_identical(spark):
    """All three build paths — rows collect, arrow stream, distributed
    executor-side partials — must produce the SAME mapping, including
    the two Arrow shapes that diverge from the Row contract (ADVICE
    r11): MapType values (tuple lists vs dicts) and timestamps
    (tz-aware UTC vs naive local)."""
    from datetime import datetime

    from asakusafw_spark_spark.operators import group_view

    df = spark.createDataFrame(
        [
            (1, {"a": 10, "b": 20}, datetime(2024, 3, 1, 12, 30), [1.5, 2.5]),
            (1, {"c": 30}, datetime(2024, 3, 2, 0, 0), []),
            (2, None, None, None),
        ],
        "k int, m map<string,int>, ts timestamp, arr array<double>",
    )
    views = {
        name: group_view(df, ["k"], transfer=t, distributed=d).value
        for name, t, d in [
            ("rows", "rows", False),
            ("arrow", "arrow", False),
            ("dist", "arrow", True),
        ]
    }
    for name, v in views.items():
        # within-group order is unspecified; sort by a stable key
        v = {
            k: sorted(rows_, key=lambda r: str(r))
            for k, rows_ in v.items()
        }
        assert v == {
            (1,): sorted(
                [
                    {
                        "k": 1,
                        "m": {"a": 10, "b": 20},
                        "ts": datetime(2024, 3, 1, 12, 30),
                        "arr": [1.5, 2.5],
                    },
                    {
                        "k": 1,
                        "m": {"c": 30},
                        "ts": datetime(2024, 3, 2, 0, 0),
                        "arr": [],
                    },
                ],
                key=lambda r: str(r),
            ),
            (2,): [{"k": 2, "m": None, "ts": None, "arr": None}],
        }, f"path {name} diverged"


def test_group_view_enforces_cap(spark, sf_dir):
    import pytest as _pytest

    from asakusafw_spark_spark.operators import group_view

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    with _pytest.raises(ValueError, match="max_rows"):
        group_view(li, ["l_orderkey"], max_rows=10)


def test_range_join_band_lookup(spark):
    from asakusafw_spark_spark.operators import range_join

    bands = spark.createDataFrame(
        [("low", 0, 10), ("high", 10, 100)], "band string, lo int, hi int"
    )
    vals = spark.createDataFrame([(1, 5), (2, 10), (3, 150)], "id int, v int")
    out = range_join(bands, vals, value_col="v", lo_col="lo", hi_col="hi")
    joined = {r.id: r.band for r in out["joined"].collect()}
    assert joined == {1: "low", 2: "high"}  # [) bounds: 10 → high
    assert [r.id for r in out["missed"].collect()] == [3]


def test_range_join_overlap_resolves_by_ordering(spark):
    from asakusafw_spark_spark.operators import range_join

    bands = spark.createDataFrame(
        [("wide", 0, 100), ("narrow", 4, 6)], "band string, lo int, hi int"
    )
    vals = spark.createDataFrame([(1, 5)], "id int, v int")
    out = range_join(bands, vals, value_col="v", lo_col="lo", hi_col="hi")
    # default ordering (lo asc, hi asc): 'wide' (lo=0) wins
    assert out["joined"].collect()[0].band == "wide"


def test_asof_join_forward_picks_earliest_at_or_after(spark):
    import datetime

    from asakusafw_spark_spark.operators import asof_join

    d = lambda s: datetime.datetime.fromisoformat(s)
    quotes = spark.createDataFrame(
        [(1, d("2024-01-01 10:00"), 100.0), (1, d("2024-01-01 11:00"), 110.0)],
        "sym long, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, d("2024-01-01 10:30")), (1, d("2024-01-01 11:30"))],
        "sym long, tts timestamp",
    )
    out = asof_join(
        trades, quotes, ["sym"], left_ts="tts", right_ts="qts", direction="forward"
    )
    joined = {r.tts: r.px for r in out["joined"].collect()}
    assert joined[d("2024-01-01 10:30")] == 110.0  # earliest at-or-after
    missed = [r.tts for r in out["missed"].collect()]
    assert missed == [d("2024-01-01 11:30")]  # nothing after it


def test_master_join_batch_fn_selection(masters, txs):
    # vectorized selector: one Python call per (group, batch); pick the
    # LAST master of the sorted group, matching test_master_join_custom_fn
    import numpy as np

    def pick_last_batch(m_pdf: pd.DataFrame, t_pdf: pd.DataFrame):
        return np.full(len(t_pdf), len(m_pdf) - 1)

    sel = MasterSelection(ordering=[("name", "asc")], select_batch_fn=pick_last_batch)
    out = master_join(masters, txs, ["k"], selection=sel)
    by_tid = {r.tid: r for r in out["joined"].collect()}
    assert by_tid[11].name == "m2b"
    assert {r.tid for r in out["missed"].collect()} == {12}


def test_master_join_batch_fn_none_means_miss(masters, txs):
    # batch selector may return None/-1 per row → that tx row is missed
    def reject_all(m_pdf, t_pdf):
        return [None] * len(t_pdf)

    sel = MasterSelection(select_batch_fn=reject_all)
    out = master_join(masters, txs, ["k"], selection=sel)
    assert out["joined"].count() == 0
    assert {r.tid for r in out["missed"].collect()} == {10, 11, 12, 13}


def test_keyless_join_null_first_master_column_still_hits(spark):
    # ADVICE fix: a matched master whose FIRST column is null must land in
    # joined, not missed — hit/miss probes the constant __m_hit__ marker
    bands = spark.createDataFrame(
        [(None, 0.0, 10.0), ("hi", 10.0, 100.0)],
        "label string, lo double, hi double",
    )
    txs = spark.createDataFrame([(1, 5.0), (2, 50.0), (3, 500.0)], "tid int, v double")
    sel = MasterSelection(
        ordering=[("lo", "asc")],
        where=(F.col("v") >= F.col("__m_lo")) & (F.col("v") < F.col("__m_hi")),
    )
    out = master_join(bands, txs, [], selection=sel, strategy="broadcast")
    by_tid = {r.tid: r for r in out["joined"].collect()}
    assert set(by_tid) == {1, 2}           # tid 1 matches the null-label band
    assert by_tid[1].label is None
    assert by_tid[2].label == "hi"
    assert {r.tid for r in out["missed"].collect()} == {3}


@pytest.mark.parametrize("strategy", ["auto", "broadcast", "shuffled"])
def test_master_join_unique_master_same_result(spark, txs, strategy):
    # with a key-unique master, unique_master=True (no min_by
    # pre-reduction — the AQE-skew-eligible shuffled plan) must produce
    # identical results to the default path
    uniq = spark.createDataFrame(
        [(1, "m1", 100.0), (2, "m2", 50.0), (4, "m4", 10.0)],
        "k int, name string, score double",
    )
    plain = master_join(uniq, txs, ["k"], strategy=strategy)
    fast = master_join(uniq, txs, ["k"], strategy=strategy, unique_master=True)
    assert sorted(map(tuple, plain["joined"].collect())) == sorted(
        map(tuple, fast["joined"].collect())
    )
    assert sorted(map(tuple, plain["missed"].collect())) == sorted(
        map(tuple, fast["missed"].collect())
    )
    assert fast["joined"].columns == plain["joined"].columns


@pytest.mark.parametrize("strategy", ["auto", "shuffled"])
def test_master_join_skew_salt_same_result(masters, txs, strategy):
    # salting is a pure physical spread: results identical to unsalted
    plain = master_join(masters, txs, ["k"], strategy=strategy)
    salted = master_join(masters, txs, ["k"], strategy=strategy, skew_salt=4)
    assert sorted(map(tuple, plain["joined"].collect())) == sorted(
        map(tuple, salted["joined"].collect())
    )
    assert sorted(map(tuple, plain["missed"].collect())) == sorted(
        map(tuple, salted["missed"].collect())
    )
    assert salted["joined"].columns == plain["joined"].columns


def test_where_path_scatter_tx_is_exact(masters, txs):
    # scatter_tx round-robins tx before the candidate join — results
    # must be identical to the unscattered plan (order-insensitive)
    sel = MasterSelection(where=F.col("__m_score") > F.col("amount") * 10)
    sel_s = MasterSelection(
        where=F.col("__m_score") > F.col("amount") * 10, scatter_tx=True
    )
    plain = master_join(masters, txs, ["k"], selection=sel)
    scat = master_join(masters, txs, ["k"], selection=sel_s)
    key = lambda out: (
        sorted(map(tuple, out["joined"].collect())),
        sorted(map(tuple, out["missed"].collect())),
    )
    assert key(plain) == key(scat)


def test_where_path_max_candidates_exact_when_groups_fit(masters, txs):
    # every master group has ≤2 rows, so a cap of 2 keeps ALL candidates:
    # results must equal the uncapped plan (the exactness condition
    # documented on MasterSelection.max_candidates)
    sel = MasterSelection(where=F.col("__m_score") > F.col("amount") * 10)
    capped = MasterSelection(
        where=F.col("__m_score") > F.col("amount") * 10,
        ordering=[("score", "desc")],
        max_candidates=2,
    )
    # same ordering on both so the per-tx winner matches
    sel.ordering = [("score", "desc")]
    a = master_join(masters, txs, ["k"], selection=sel)
    b = master_join(masters, txs, ["k"], selection=capped)
    key = lambda out: (
        sorted(map(tuple, out["joined"].collect())),
        sorted(map(tuple, out["missed"].collect())),
    )
    assert key(a) == key(b)


def test_where_path_max_candidates_bounds_blowup_documented_approx(spark):
    # asof-style: 100 versions of one hot key; cap=3 keeps the 3 latest.
    # Recent tx rows still match exactly; a tx row older than all kept
    # versions reports missed — the DOCUMENTED approximation.
    from asakusafw_spark_spark.operators import MasterSelection, master_join

    quotes = spark.createDataFrame(
        [(1, t, float(t)) for t in range(100)], "sym long, qts long, px double"
    )
    trades = spark.createDataFrame(
        [(1, 99), (1, 98), (1, 0)], "sym long, tts long"
    )
    sel = MasterSelection(
        ordering=[("qts", "desc")],
        where=F.col("__m_qts") <= F.col("tts"),
        max_candidates=3,
    )
    out = master_join(quotes, trades, ["sym"], selection=sel)
    joined = {r.tts: r.px for r in out["joined"].collect()}
    assert joined == {99: 99.0, 98: 98.0}  # within the kept window: exact
    assert {r.tts for r in out["missed"].collect()} == {0}  # outside: missed


def test_bloom_prefilter_exact_hit_set_and_plan(spark, sf_dir):
    """The pre-filter keeps a superset of matching rows, so the joined
    port is identical with and without it; the filter itself is one
    broadcast LEFT-SEMI on a distinct bucket set — no Python, no extra
    shuffle on the fact side."""
    from asakusafw_spark_spark.operators import bloom_prefilter, master_join
    from asakusafw_spark_spark.plans import assert_scale_safe

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_totalprice") > 250000
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    filtered = bloom_prefilter(orders, li, [("o_orderkey", "l_orderkey")])
    # superset of true matches, subset of the fact
    n_match = li.join(
        orders.select("o_orderkey").distinct(),
        li.l_orderkey == orders.o_orderkey,
    ).count()
    assert n_match <= filtered.count() <= li.count()

    with_f = master_join(
        orders, filtered, [("o_orderkey", "l_orderkey")],
        strategy="shuffled", unique_master=True,
    )["joined"]
    without = master_join(
        orders, li, [("o_orderkey", "l_orderkey")],
        strategy="shuffled", unique_master=True,
    )["joined"]
    cols = sorted(with_f.columns)
    assert sorted(map(tuple, with_f.select(*cols).collect())) == sorted(
        map(tuple, without.select(*cols).collect())
    )

    s = assert_scale_safe(filtered, max_python_stages=0)
    assert "BroadcastHashJoin" in s["joins"]

    # tiny bucket space: still exact after the real join
    tight = bloom_prefilter(orders, li, [("o_orderkey", "l_orderkey")], buckets=64)
    with_t = master_join(
        orders, tight, [("o_orderkey", "l_orderkey")],
        strategy="shuffled", unique_master=True,
    )["joined"]
    assert with_t.count() == without.count()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="non-empty"):
        bloom_prefilter(orders, li, [])


def test_unique_master_debug_validation(spark):
    """unique_master=True silently fans out on a duplicate master key
    (documented SQL parity) — unless the debug conf is on, in which case
    the duplicate is caught with a clear error BEFORE the join."""
    import pytest as _pytest

    from asakusafw_spark_spark.operators.joins import (
        VALIDATE_UNIQUE_CONF, master_join,
    )

    dup_master = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, mv string"
    )
    tx = spark.createDataFrame([(1, 10), (2, 20)], "k long, tv int")

    out = master_join(dup_master, tx, ["k"], unique_master=True)
    assert out["joined"].count() == 3  # tx row k=1 fanned out (documented)

    spark.conf.set(VALIDATE_UNIQUE_CONF, "true")
    try:
        with _pytest.raises(ValueError, match="occurs 2x"):
            master_join(dup_master, tx, ["k"], unique_master=True)["joined"].count()
        # a genuinely unique master passes under the debug conf
        uniq = dup_master.dropDuplicates(["k"])
        assert master_join(uniq, tx, ["k"], unique_master=True)[
            "joined"
        ].count() == 2
    finally:
        spark.conf.unset(VALIDATE_UNIQUE_CONF)
