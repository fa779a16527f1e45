"""Sketch build→merge parameter-propagation audit (VERDICT r11 Next #1).

The r11 sf1 sweep caught ``theta_union`` silently defaulting
``lgNomEntries=12`` under lg_k=14 build sketches — a union of two EXACT
sketches entered estimation mode past 4096 retained entries.  That bug
is a *class*: any Spark sketch merge taking an optional size/accuracy
parameter can downgrade precision relative to the build side.  This
module is the audit of every build/merge pair the engine uses, with one
exactness- or parameter-boundary pin each, all probed ABOVE the 4096
default-nominal boundary where the theta incident hid:

=====================  ============================  =====================
pair                   probe (this module)            verdict
=====================  ============================  =====================
theta build→union      6000 disjoint @ lg_k=14       default DOWNGRADES;
 (+ union_agg)                                       pin lgNomEntries
hll build→union(_agg)  serialized size + error band  lgK PRESERVED
kll build→merge_agg /  serialized header k           k PRESERVED (default,
 pairwise merge                                      pinned, and pairwise)
count-min merge        _cms_merge_bytes validation   dims VALIDATED, raises
=====================  ============================  =====================

The HLL/KLL "preserved" rows are regression pins, not assumptions: if a
Spark upgrade changes a merge default, the header/size assertions here
flip before any value bug reaches the oracle sweeps.
"""

import re
import struct
from pathlib import Path

import pytest
from pyspark.sql import functions as F

PKG = Path(__file__).resolve().parent.parent / "asakusafw_spark_spark"
ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


def _two_disjoint_halves(spark, n=6000):
    """n distinct longs split into two disjoint build groups — n is
    chosen ABOVE the 4096 default-nominal boundary so a merge that
    drops to the lgNomEntries=12 default leaves exactness."""
    return spark.range(n).select(
        F.col("id").alias("v"), (F.col("id") % 2).alias("half")
    )


# ---------------------------------------------------------------- theta

def test_theta_union_agg_pinned_is_exact_above_default_boundary(spark):
    """theta_union_agg is the multi-sketch sibling of the r11
    theta_union bug: unpinned it unions at lgNomEntries=12 and
    ESTIMATES (observed 6006 on pyspark 4.1.2); pinned to the build
    lg_k it stays exact.  No production call site uses union_agg today
    — this pin documents the trap for the first one that does."""
    df = _two_disjoint_halves(spark)
    sk = df.groupBy("half").agg(
        F.theta_sketch_agg("v", F.lit(14)).alias("sketch")
    )
    pinned = sk.agg(
        F.theta_sketch_estimate(
            F.theta_union_agg("sketch", F.lit(14))
        ).alias("e")
    ).first()["e"]
    assert pinned == 6000.0  # exact: both inputs exact, union kept at lg_k


def test_theta_call_sites_all_pin_nominal_entries():
    """Static guard: every theta_union / theta_union_agg /
    theta_sketch_agg call in the package and the entry module must pass
    an explicit size argument — the default (lgNomEntries=12) silently
    downgrades lg_k>12 builds.  Scans source so a future call site
    can't forget the pin and wait for the sf1 sweep to catch it."""
    pat = re.compile(r"theta_(?:union_agg|union|sketch_agg)\(")
    bad = []
    for path in [*PKG.rglob("*.py"), ENTRY]:
        src = path.read_text()
        for m in pat.finditer(src):
            # extract the balanced-paren argument list
            depth, i = 1, m.end()
            while depth and i < len(src):
                depth += {"(": 1, ")": -1}.get(src[i], 0)
                i += 1
            args = src[m.end():i - 1]
            # count top-level commas to get the arity
            depth, commas = 0, 0
            for ch in args:
                if ch in "([{":
                    depth += 1
                elif ch in ")]}":
                    depth -= 1
                elif ch == "," and depth == 0:
                    commas += 1
            fn = m.group(0)[:-1]
            need = 1 if fn.endswith(("union_agg", "sketch_agg")) else 2
            if commas < need:
                bad.append(f"{path.name}: {fn}({args.strip()[:60]}…)")
    assert not bad, (
        "theta calls missing an explicit lgNomEntries pin "
        f"(default 12 downgrades lg_k>12 builds): {bad}"
    )


# ------------------------------------------------------------------ hll

def test_hll_union_preserves_build_lgk(spark):
    """hll_union / hll_union_agg carry the build lgConfigK through the
    merge (no optional size param to forget): the union result
    serializes to the SAME byte length as an lgK=14 build sketch — an
    lgK=12 downgrade would shrink it 4× (observed 16 424 B vs 4 136 B
    on pyspark 4.1.2) — and the merged estimate stays inside the lgK=14
    error envelope at a cardinality where lgK=12 noticeably drifts."""
    df = _two_disjoint_halves(spark)
    sk = df.groupBy("half").agg(
        F.hll_sketch_agg("v", F.lit(14)).alias("sketch")
    ).cache()
    build_len = sk.select(F.length("sketch").alias("n")).first()["n"]

    agg_row = sk.agg(
        F.length(F.hll_union_agg("sketch")).alias("n"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"),
    ).first()
    assert agg_row["n"] == build_len  # lgK preserved → same register bytes

    pair = sk.groupBy().pivot("half").agg(F.first("sketch"))
    pw = pair.select(
        F.length(F.hll_union("0", "1")).alias("n"),
        F.hll_sketch_estimate(F.hll_union("0", "1")).alias("e"),
    ).first()
    assert pw["n"] == build_len

    # 3σ band at lgK=14: 3·1.04/√2^14 ≈ 2.4 %
    for est in (agg_row["e"], pw["e"]):
        assert abs(est - 6000) / 6000 < 0.024
    sk.unpersist()


# ------------------------------------------------------------------ kll

def _kll_header_k(sketch_bytes: bytes) -> int:
    """k from the DataSketches KLL serial preamble: byte0 preambleInts,
    byte1 serVer, byte2 family(15), byte3 flags, bytes4-5 k (LE u16)."""
    _pre, _ver, fam, _flags, k = struct.unpack("<BBBBH", bytes(sketch_bytes)[:6])
    assert fam == 15, f"not a KLL sketch (family {fam})"
    return k


def test_kll_merge_agg_default_downgrades_k_when_multipartition(spark):
    """THE r12 BUG (found by this audit): kll_merge_agg with no k
    merges through a default-k=200 partial buffer whenever the sketch
    table spans multiple partitions, silently downgrading a k=800
    build — and partitioning-DEPENDENTLY (the coalesce(1) path keeps
    800).  Kept as a canary: if a Spark upgrade fixes the default,
    this flips and the column-name k plumbing can be simplified.

    Since r16 the engine session lets AQE re-plan above cached frames
    (canChangeCachedPlanOutputPartitioning=true), which at this toy
    size coalesces the 2-partition sketch table to ONE partition and so
    HIDES the downgrade (k stays 800 — an accuracy improvement, and the
    very behavior that conf was adopted for).  The canary therefore
    pins the underlying Spark behavior with AQE coalescing disabled:
    at real scale a sketch table spans partitions no coalesce removes,
    so the explicit-k plumbing is still required."""
    vals = spark.range(100_000).select(
        F.col("id").cast("double").alias("v"), (F.col("id") % 2).alias("half")
    )
    # the conf must be off BEFORE .cache(): the cached plan snapshots
    # the session conf at registration, not at first materialization
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    sk = None
    try:
        sk = vals.groupBy("half").agg(
            F.kll_sketch_agg_double("v", F.lit(800)).alias("qs")
        ).cache()
        m_default = sk.agg(F.kll_merge_agg_double("qs").alias("m")).first()["m"]
        m_one_part = sk.coalesce(1).agg(
            F.kll_merge_agg_double("qs").alias("m")
        ).first()["m"]
        assert _kll_header_k(m_default) == 200  # the downgrade
        assert _kll_header_k(m_one_part) == 800  # ...and its partition dependence
    finally:
        # in finally (ADVICE r16): an assert failure above must not leak
        # the cached sketch frame into later tests on the shared session
        if sk is not None:
            sk.unpersist()
        spark.conf.set(coalesce_key, prev)


def test_kll_merge_preserves_build_k_when_pinned(spark):
    """The two merge paths the engine actually uses keep the BUILD k:
    kll_merge_agg PINNED to the build k (what merge_quantile_sketches
    now always does, reading k from the qsketch__<dtype>__k<k> column
    name) and the streaming maintainer's pairwise kll_sketch_merge
    (no size parameter; header-verified to carry the input k)."""
    from asakusafw_spark_spark.functions import (
        merge_quantile_sketches, quantile_sketch_rollup,
    )

    vals = spark.range(100_000).select(
        F.col("id").cast("double").alias("v"), (F.col("id") % 2).alias("half")
    )
    sk = vals.groupBy("half").agg(
        F.kll_sketch_agg_double("v", F.lit(800)).alias("qs")
    ).cache()
    assert all(_kll_header_k(r["qs"]) == 800 for r in sk.collect())
    m_pinned = sk.agg(
        F.kll_merge_agg_double("qs", F.lit(800)).alias("m")
    ).first()["m"]
    pair = sk.groupBy().pivot("half").agg(F.first("qs"))
    m_pair = pair.select(
        F.kll_sketch_merge_double("0", "1").alias("m")
    ).first()["m"]
    for m in (m_pinned, m_pair):
        assert _kll_header_k(m) == 800

    # ...and k is not just carried in the header: the merged rank error
    # stays in the k=800 band (3·1.65/√800 ≈ 1.8 %) on a known uniform
    q95 = spark.createDataFrame([(m_pinned,)], "m binary").select(
        F.kll_sketch_get_quantile_double("m", F.lit(0.95)).alias("q")
    ).first()["q"]
    assert abs(q95 - 95_000) / 100_000 < 0.018

    # end-to-end: the public rollup→merge pair propagates k through the
    # column name even over a deliberately re-shuffled sketch table
    rolled = quantile_sketch_rollup(vals, "half", "v", k=800)
    assert "qsketch__double__k800" in rolled.columns
    got = merge_quantile_sketches(
        rolled.repartition(7), quantiles=(0.95,)
    ).first()
    assert got["n"] == 100_000  # n is exact through every merge
    assert abs(got["q95"] - 95_000) / 100_000 < 0.018
    sk.unpersist()


# ------------------------------------------------------------ count-min

def test_cms_merge_rejects_mismatched_dimensions():
    """The custom CMS byte merge refuses sketches built with different
    (eps, confidence, seed) — dimension/hash mismatch raises instead of
    silently merging incompatible tables (the validation the Spark
    theta default lacks)."""
    from asakusafw_spark_spark.functions.stats import _cms_merge_bytes

    def mk(depth, width, seed=7):
        hash_a = struct.pack(f">{depth}q", *range(seed, seed + depth))
        table = struct.pack(f">{depth * width}q", *([0] * depth * width))
        return struct.pack(">iqii", 1, 0, depth, width) + hash_a + table

    ok = _cms_merge_bytes([mk(3, 16), mk(3, 16)])
    assert _cms_merge_bytes([ok]) == ok
    with pytest.raises(ValueError):
        _cms_merge_bytes([mk(3, 16), mk(3, 32)])
    with pytest.raises(ValueError):
        _cms_merge_bytes([mk(3, 16), mk(4, 16)])
    with pytest.raises(ValueError):
        _cms_merge_bytes([mk(3, 16, seed=7), mk(3, 16, seed=9)])
