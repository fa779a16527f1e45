"""Fixed-point PageRank (functions/graph.py): known-graph values,
guard honesty, and the EXACT-match property against a pure-Python
integer-arithmetic reference — the determinism contract says every
engine computing the spec gets bit-identical BIGINT ranks, so the
assertion is ``==`` on dicts, no tolerances."""

import random

import pytest

from asakusafw_spark_spark.functions import pagerank

SCALE = 10**12


def pagerank_py(edge_list, iterations=5, damping=85, scale=SCALE):
    """Reference implementation of the module's integer-arithmetic
    spec, driven by plain Python ints (arbitrary precision — any
    silent overflow or float sneaking into the Spark path diverges)."""
    es = sorted(set(edge_list))
    nodes = sorted({u for u, _ in es} | {v for _, v in es})
    n = len(nodes)
    outdeg = {}
    for u, _ in es:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = (scale * (100 - damping)) // (100 * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for u, v in es:
            contrib[v] += rank[u] // outdeg[u]
        rank = {v: base + (damping * contrib[v]) // 100 for v in nodes}
    return rank


def test_pagerank_cycle_uniform(spark):
    """A directed cycle is perfectly symmetric: every node holds
    exactly scale // n forever (no quantization drift — the fixed
    point of the integer recurrence)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    out = {r.node: r.rank for r in pagerank(edges, iterations=7).collect()}
    assert out == {"a": SCALE // 3, "b": SCALE // 3, "c": SCALE // 3}


def test_pagerank_star_center_dominates(spark):
    """Hub-and-spoke with backlinks: the hub collects both spokes'
    full contribution each round; spokes split the hub's."""
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")], ["src", "dst"]
    )
    out = {r.node: r.rank for r in pagerank(edges, iterations=5).collect()}
    assert out["a"] > out["b"] == out["c"]
    assert out == pagerank_py(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")], iterations=5
    )


def test_pagerank_duplicate_edges_count_once(spark):
    """The spec dedupes: repeating an edge 5x must not change outdeg
    or contributions."""
    once = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    many = spark.createDataFrame(
        [("a", "b")] * 5 + [("b", "a")] * 3, ["src", "dst"]
    )
    r1 = {r.node: r.rank for r in pagerank(once, iterations=4).collect()}
    r2 = {r.node: r.rank for r in pagerank(many, iterations=4).collect()}
    assert r1 == r2


def test_pagerank_dangling_mass_drops(spark):
    """a->b with no out-edge from b: b's mass leaves the system (the
    documented simplification), so total rank shrinks monotonically
    but stays positive and matches the reference exactly."""
    el = [("a", "b")]
    edges = spark.createDataFrame(el, ["src", "dst"])
    out = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}
    assert out == pagerank_py(el, iterations=3)
    assert sum(out.values()) < SCALE


def test_pagerank_guards(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, damping=101)
    with pytest.raises(ValueError, match="scale"):
        pagerank(edges, scale=10)


def test_pagerank_property_exact_match(spark):
    """Random digraphs (self-loops, dangling nodes, multi-edges,
    disconnected parts): Spark == pure-Python reference EXACTLY.
    Seeded trials instead of hypothesis: each trial costs Spark jobs,
    and the input space is homogeneous (edge sets), so a fixed sweep
    over sizes x densities x seeds covers the same ground without
    shrinking machinery."""
    for seed, n_nodes, n_edges, iters in [
        (1, 5, 8, 3),
        (2, 12, 25, 4),
        (3, 8, 40, 2),   # dense, multi-edges certain
        (4, 20, 12, 3),  # sparse, disconnected + dangling certain
    ]:
        rng = random.Random(seed)
        el = [
            (f"n{rng.randrange(n_nodes)}", f"n{rng.randrange(n_nodes)}")
            for _ in range(n_edges)
        ]
        df = spark.createDataFrame(el, ["src", "dst"])
        got = {r.node: r.rank for r in pagerank(df, iterations=iters).collect()}
        assert got == pagerank_py(el, iterations=iters), (seed, el)


def bfs_py(edge_list, sources, max_iters):
    es = sorted(set(edge_list))
    level = {s: 0 for s in set(sources)}
    frontier = set(sources)
    for i in range(1, max_iters + 1):
        nxt = {
            v for u, v in es if u in frontier and v not in level
        }
        if not nxt:
            break
        for v in nxt:
            level[v] = i
        frontier = nxt
    return level


def test_bfs_levels_chain_and_direction(spark):
    """a->b->c->d chain from {a}: exact hop counts; edges are DIRECTED
    (d never reaches back); max_iters truncates the frontier."""
    from asakusafw_spark_spark.functions import bfs_levels

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    srcs = spark.createDataFrame([("a",)], ["node"])
    out = {r.node: r.level for r in bfs_levels(edges, srcs).collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}

    # reverse source: nothing downstream of d
    srcs_d = spark.createDataFrame([("d",)], ["node"])
    assert {r.node: r.level
            for r in bfs_levels(edges, srcs_d).collect()} == {"d": 0}

    # truncation at 2 hops
    out2 = {r.node: r.level
            for r in bfs_levels(edges, srcs, max_iters=2).collect()}
    assert out2 == {"a": 0, "b": 1, "c": 2}

    # max_iters=0: sources only
    out0 = {r.node: r.level
            for r in bfs_levels(edges, srcs, max_iters=0).collect()}
    assert out0 == {"a": 0}


def test_bfs_levels_multi_source_min(spark):
    """Two sources: every node takes the MIN distance over sources —
    and a node that is itself a source stays level 0 even with
    in-edges."""
    from asakusafw_spark_spark.functions import bfs_levels

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("z", "c"), ("c", "a")], ["src", "dst"]
    )
    srcs = spark.createDataFrame([("a",), ("z",)], ["node"])
    out = {r.node: r.level for r in bfs_levels(edges, srcs).collect()}
    assert out == {"a": 0, "z": 0, "b": 1, "c": 1}


def test_bfs_levels_property_exact_match(spark):
    """Random digraphs x random source sets: Spark frontier BFS ==
    pure-Python reference exactly (integer levels, no tolerances)."""
    from asakusafw_spark_spark.functions import bfs_levels

    for seed, n_nodes, n_edges, n_src, iters in [
        (21, 10, 18, 1, 5),
        (22, 15, 30, 3, 3),
        (23, 8, 6, 2, 10),  # sparse: unreached nodes certain
    ]:
        rng = random.Random(seed)
        el = [
            (f"n{rng.randrange(n_nodes)}", f"n{rng.randrange(n_nodes)}")
            for _ in range(n_edges)
        ]
        node_pool = sorted({u for u, _ in el} | {v for _, v in el})
        srcs = rng.sample(node_pool, min(n_src, len(node_pool)))
        edf = spark.createDataFrame(el, ["src", "dst"])
        sdf = spark.createDataFrame([(s,) for s in srcs], ["node"])
        got = {
            r.node: r.level
            for r in bfs_levels(edf, sdf, max_iters=iters).collect()
        }
        assert got == bfs_py(el, srcs, iters), (seed, el, srcs)


def test_bfs_levels_guard(spark):
    from asakusafw_spark_spark.functions import bfs_levels

    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    srcs = spark.createDataFrame([("a",)], ["node"])
    with pytest.raises(ValueError, match="max_iters"):
        bfs_levels(edges, srcs, max_iters=-1)


def ppr_py(edge_list, srcs, iterations=3, damping=85, scale=SCALE):
    es = sorted(set(edge_list))
    nodes = sorted({u for u, _ in es} | {v for _, v in es} | set(srcs))
    S = set(srcs)
    outdeg = {}
    for u, _ in es:
        outdeg[u] = outdeg.get(u, 0) + 1
    base_s = (scale * (100 - damping)) // (100 * len(S))
    rank = {v: (scale // len(S) if v in S else 0) for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0 for v in nodes}
        for u, v in es:
            contrib[v] += rank[u] // outdeg[u]
        rank = {
            v: (base_s if v in S else 0) + (damping * contrib[v]) // 100
            for v in nodes
        }
    return rank


def test_pagerank_personalized_exact_and_semantics(spark):
    """PPR: teleport/init mass only on the cohort; isolated sources
    stay ranked; nodes far from the cohort get 0 at round 1; exact ==
    vs the reference on random graphs."""
    el = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")]
    edf = spark.createDataFrame(el, ["src", "dst"])
    sdf = spark.createDataFrame([("a",), ("lonely",)], ["node"])
    got = {
        r.node: r.rank
        for r in pagerank(edf, iterations=2, sources=sdf).collect()
    }
    assert got == ppr_py(el, ["a", "lonely"], iterations=2)
    assert "lonely" in got and got["lonely"] > 0   # isolated source kept
    assert got["x"] == 0 and got["y"] == 0         # unreachable from cohort
    assert got["a"] > got["b"] > 0                 # mass radiates outward

    for seed in (41, 42):
        rng = random.Random(seed)
        el = [
            (f"n{rng.randrange(9)}", f"n{rng.randrange(9)}")
            for _ in range(16)
        ]
        pool = sorted({u for u, _ in el} | {v for _, v in el})
        srcs = rng.sample(pool, 2)
        got = {
            r.node: r.rank
            for r in pagerank(
                spark.createDataFrame(el, ["src", "dst"]),
                iterations=3,
                sources=spark.createDataFrame([(s,) for s in srcs], ["node"]),
            ).collect()
        }
        assert got == ppr_py(el, srcs, iterations=3), (seed, el, srcs)

    with pytest.raises(ValueError, match="sources"):
        pagerank(edf, sources=sdf.where("node = 'zzz'"))


def tri_py(edge_list):
    import itertools

    ce = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    nodes = sorted({x for e in ce for x in e})
    return sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in ce and (a, c) in ce and (b, c) in ce
    )


def test_triangle_count_semantics_and_exact(spark):
    """Direction ignored, duplicates/self-loops dropped, K4 has 4
    triangles, and random graphs match brute force exactly (the
    degree-oriented wedge join must count each triangle exactly once
    regardless of hub structure)."""
    from asakusafw_spark_spark.functions import triangle_count

    def count(el):
        df = spark.createDataFrame(el, ["src", "dst"])
        return triangle_count(df).collect()[0].n_triangles

    assert count([("a", "b"), ("b", "c"), ("c", "a")]) == 1
    # reverse duplicates + self-loop: still exactly 1
    assert count(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a")]
    ) == 1
    assert count([("a", "b"), ("b", "c")]) == 0
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    assert count(k4) == 4
    # hub star (no triangles despite a degree-7 hub)
    star = [("h", f"s{i}") for i in range(7)]
    assert count(star) == 0

    for seed in (51, 52, 53):
        rng = random.Random(seed)
        el = [
            (f"n{rng.randrange(9)}", f"n{rng.randrange(9)}")
            for _ in range(24)
        ]
        assert count(el) == tri_py(el), (seed, el)


def test_pagerank_personalized_empty_sources_always_raises(spark):
    """Empty sources must raise even when the edge table is ALSO empty
    (the n == 0 early exit used to bypass the guard — ADVICE r09)."""
    empty_edges = spark.createDataFrame([], "src string, dst string")
    empty_sources = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError, match="sources is empty"):
        pagerank(empty_edges, sources=empty_sources, iterations=1)
