"""Embedding similarity search over an ``array<float>`` column.

Two paths, as a 100 TB pipeline needs both:

- :func:`brute_force_topk` — exact cosine top-k; the baseline.  The
  query side is broadcast (queries ≪ corpus), so the corpus is scanned
  once with NO shuffle of the big side; per-query top-k runs as a
  partial top-k before the final merge.
- :func:`lsh_ann_topk` — random-hyperplane LSH buckets: corpus and
  queries hash to sign-pattern buckets; only same-bucket candidates are
  scored.  Approximate (misses across bucket boundaries) but the scan +
  shuffle is proportional to bucket-local candidates, the scale path.

Determinism contract: all float math is double, computed as a
sequential fold over the array (``F.aggregate``) — bit-identical to the
DuckDB oracle's ``list_sum(list_transform(...))`` — and similarity is
rounded to 6 decimals with (sim DESC, id ASC) tie-breaks.

The hyperplanes are derived from md5 of (seed, plane, dim) — the same
construction is expressible in SQL, keeping even the ANN path
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .dedup import str_hash64, ensure_parallelism


def _lit_doubles(vals) -> str:
    """SQL text for a literal array<double> — ONE parsed expression.

    Building the same array via ``F.array(*[F.lit(x) …])`` costs a py4j
    round-trip per element; a 64-dim vector × 8 centroids × 2 call sites
    is >1000 driver RPCs per plan build, which dominated the IVF/LSH
    queries' wall-clock at small scale.  ``repr(float)`` is the shortest
    round-trip form, so the JVM parses back the identical double."""
    return "array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")"


def _dot(a: Column, b: Column) -> Column:
    """Sequential double dot product (order-pinned fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column, b: Column, scale: int = 6) -> Column:
    """Cosine similarity rounded to ``scale`` decimals (cross-engine
    deterministic; see module doc)."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), scale)


def _paired_cosine(a: Column, b: Column, na: Column, nb: Column, scale: int = 6) -> Column:
    """:func:`cosine_similarity` with the norms supplied as columns.

    Join-based scorers hoist ``_norm`` to the per-ROW side of the join
    (norm depends only on one vector), so only the dot's single fold
    runs per candidate PAIR — 1 interpreted array fold per pair instead
    of 3.  Bit-identical to :func:`cosine_similarity`: the hoisted fold
    sees the same vector, and the final ``round(dot/(na*nb), scale)``
    is the same expression tree."""
    return F.round(_dot(a, b) / (na * nb), scale)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, sim).

    ``queries`` is broadcast — corpus never shuffles; the rank window
    partitions by query id (small), so the only shuffle carries
    (corpus×queries) scored rows, prunable by AQE.  Self-matches
    (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            _paired_cosine(
                F.col("q_vec"), F.col("c_vec"), F.col("__qn"), F.col("__cn")
            ),
        )
        .select("query_id", "neighbor_id", "sim")
    )
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k of (query_id, neighbor_id, sim) by
    (sim DESC, neighbor_id ASC) — the shared tail of every ANN entry
    point.

    Unscorable candidates are NOT neighbors (r16 contract): a NULL sim
    — a null-element or whole-NULL vector on either side propagates
    through the dot/norm folds — is dropped before ranking.  Spark's
    DESC sort puts NULLs last, so they would surface exactly when a
    query has < k finite candidates (LSH bucket tails); and the DuckDB
    twins cannot represent them — list_sum SKIPS null elements and
    would fabricate a partial dot where the engine has NULL.  NaN sims
    stay: both engines rank NaN above every finite value, consistently
    (r15 extremes gate)."""
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.filter(F.col("sim").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def cosine_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    seed: int = 42,
    exact: bool = False,
    max_bucket: "int | None" = 10_000,
) -> DataFrame:
    """Embedding near-duplicate pairs: (id_a, id_b, sim) with sim ≥
    threshold, id_a < id_b.

    Default is LSH-bucketed (pairs scored only within a sign-bucket);
    ``exact=True`` scores all pairs (quadratic — small corpora only).

    Scale contract (r16, found by the sf10 probe): the bucket self-join
    is quadratic PER BUCKET, so ``planes`` is the primary scale knob —
    size it so expected bucket ≈ n / 2^planes stays in the low
    thousands (the sf10 probe measured 200k vectors × planes=2 → four
    50k-buckets → a ~5-billion-pair join that never finishes; planes=7
    over the same corpus runs in ~a minute).  ``max_bucket`` (ON by
    default, same contract as ``minhash_lsh_pairs`` /
    ``simhash_pairs``) DROPS any sign-bucket larger than the cap
    before the join — an oversized bucket means the hyperplanes carry
    no discriminative power for that region and the join would melt
    down; the drop is observable (``_observe_cap`` metrics in the
    executed plan), never silent.  Within the cap, the self-join is
    SUB-BLOCKED (see the inline comment): per-bucket quadratic work is
    decomposed into uniform ~``SUB_BLOCK``² cells keyed into the join,
    so bucket-size skew cannot produce straggler tasks and dup-key
    groups stay small enough for any join strategy.  ``max_bucket=
    None`` restores the uncapped, un-blocked join.  No oracle corpus
    reaches the cap, and sub-blocking only re-partitions the SAME pair
    set, so the DuckDB twins stay exact without modelling either.
    """
    df = ensure_parallelism(df)
    if max_bucket is not None and max_bucket < 2:
        raise ValueError("max_bucket must be >= 2 (or None)")
    if exact:
        a = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            _norm(F.col(vec_col)).alias("__na"),
        )
        b = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            _norm(F.col(vec_col)).alias("__nb"),
        )
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        dim = _probe_dim(df, vec_col)
        bucketed = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            _norm(F.col(vec_col)).alias("nrm"),
            _bucket_key(vec_col, planes, seed, dim).alias("bucket"),
        )
        if max_bucket is not None:
            from .dedup import _observe_cap

            # NO persist here, deliberately: caching `bucketed` would
            # make both self-join sides deserialize array<float>
            # vectors from the in-memory columnar cache per pair row —
            # measured 6× slower than the vectorized parquet scan on
            # the 100M-pair sf1 join (348 s vs ~55 s).  The bucket key
            # is a cheap fold; re-evaluating it on three consumers
            # (count agg + both sides) costs three scans, which the
            # quadratic join dwarfs.
            counts = _observe_cap(
                bucketed.groupBy("bucket").agg(
                    F.count(F.lit(1)).alias("__n__")
                ),
                "cosine_near_dup",
                max_bucket,
            )
            # ≤ 2^planes rows of (bucket, g) — always broadcastable.
            # SUB-BLOCKED self-join (r16, sf10 probe): the quadratic
            # work of a bucket is single-task under a plain bucket
            # equi-join (the stage had full width but 2.5× straggler
            # skew at sf10; a cap-sized 10k bucket would be a ~50M-pair
            # single task).  Each bucket splits into g = ceil(n/1024)
            # hash sub-groups; side a replicates each row across the g
            # partner sub-groups of b and vice versa, so the join key
            # (bucket, __ca__, __cb__) makes every ~1024×1024 cell an
            # independent, uniformly-sized unit of parallel work —
            # bucket skew cannot straggle, and no join strategy can
            # melt down on the ≤1024-row dup-key groups (the estimate-
            # demoted SortMergeJoin of r16's first regression replayed
            # a 5k-row buffered group from disk per probe row: 299 s vs
            # ~50 s at sf1).  Small buckets degenerate to g=1 — one
            # cell, zero replication, the original join.  Replication
            # cost is g ≈ n/1024 rows per side per bucket, proportional
            # to the pair work itself, never the corpus.
            keep = counts.filter(F.col("__n__") <= max_bucket).select(
                "bucket",
                F.ceil(F.col("__n__") / F.lit(SUB_BLOCK))
                .cast("int")
                .alias("__g__"),
            )
            bucketed = (
                bucketed.join(F.broadcast(keep), "bucket")
                .withColumn(
                    "__sub__",
                    F.pmod(
                        F.xxhash64(F.col("id"), F.lit(seed)), F.col("__g__")
                    ).cast("int"),
                )
            )
            cells = F.explode(
                F.sequence(F.lit(0), F.col("__g__") - 1)
            )
            a = bucketed.select(
                F.col("id").alias("id_a"), F.col("v").alias("va"),
                F.col("nrm").alias("__na"), "bucket",
                F.col("__sub__").alias("__ca__"),
                cells.alias("__cb__"),
            )
            b = bucketed.select(
                F.col("id").alias("id_b"), F.col("v").alias("vb"),
                F.col("nrm").alias("__nb"), "bucket",
                cells.alias("__ca__"),
                F.col("__sub__").alias("__cb__"),
            )
            pairs = a.join(b, ["bucket", "__ca__", "__cb__"]).filter(
                F.col("id_a") < F.col("id_b")
            )
        else:
            a = bucketed.select(
                F.col("id").alias("id_a"), F.col("v").alias("va"),
                F.col("nrm").alias("__na"), "bucket",
            )
            b = bucketed.select(
                F.col("id").alias("id_b"), F.col("v").alias("vb"),
                F.col("nrm").alias("__nb"), "bucket",
            )
            pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "sim",
            _paired_cosine(
                F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def _plane_component(plane: int, dim: int, seed: int) -> float:
    """Deterministic hyperplane component in [-1, 1), reproducible in
    SQL: (md5_hash(seed:plane:dim) mod 2001 - 1000)/1000."""
    # materialized Python-side so the expression is a fold-able literal
    import hashlib

    h = int(hashlib.md5(f"{seed}:{plane}:{dim}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


#: sub-block side for the capped near-dup self-join: a bucket of n rows
#: splits into ceil(n/1024) hash sub-groups so every join cell is a
#: ~1024×1024 ≈ 1M-pair unit of work — big enough to amortize task
#: overhead, small enough that the largest capped bucket (10k rows)
#: becomes ~100 uniform cells instead of one 50M-pair straggler task.
SUB_BLOCK = 1024

MAX_DIM = 512


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Embedding dimension from the first row (tiny plan-time job);
    None when the frame is empty."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    return row[0]["d"] if row else None


def _bucket_key_sql(vec_name: str, planes: int, seed: int, dim: int | None = None) -> str:
    """SQL text for the sign-pattern bucket key: bit p = sign(vec · plane_p).

    Planes are md5-derived literal arrays (see :func:`_plane_component`)
    zipped against the vector — a pure fold, SQL-replicable.  Pass the
    actual ``dim`` (probed from data) so plane literals are exactly
    vector-sized; without it, arrays are built at MAX_DIM and sliced
    per row (zip_with pads the shorter side with nulls, which would
    null the whole projection).

    Emitted as TEXT so a whole bucket key — and in the multi-table case
    a whole array of per-table keys — parses in ONE ``F.expr`` round
    trip; per-plane Column construction cost ~10 py4j RPCs × planes ×
    tables × 2 sides per plan build (the dominant cost at small scale).
    Arithmetic is unchanged: sequential double fold, ``NULL`` vectors
    fall to the '0' branch exactly like the old ``F.when`` form."""
    v = f"`{vec_name}`"
    parts = []
    for p in range(planes):
        if dim is not None:
            plane = _lit_doubles(_plane_component(p, d, seed) for d in range(dim))
        else:
            plane = (
                f"slice({_lit_doubles(_plane_component(p, d, seed) for d in range(MAX_DIM))},"
                f" 1, size({v}))"
            )
        proj = (
            f"aggregate(zip_with({v}, {plane}, (x, w) -> CAST(x AS DOUBLE) * w),"
            " 0.0D, (acc, s) -> acc + s)"
        )
        parts.append(f"(CASE WHEN {proj} >= 0.0D THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(parts) + ")"


def _bucket_key(vec_name: str, planes: int, seed: int, dim: int | None = None) -> Column:
    return F.expr(_bucket_key_sql(vec_name, planes, seed, dim))


#: per-table seed stride (prime) — table t hashes with seed + 7919·t;
#: the DuckDB oracle uses the same construction
LSH_TABLE_SEED_STRIDE = 7919


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 6,
    seed: int = 42,
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing a sign-bucket
    with the query in ANY of ``num_tables`` independent hyperplane tables
    (classic multi-table LSH).  Output: (query_id, neighbor_id, sim) —
    ≤ k rows per query; a query with < k bucket-mates returns fewer.

    Recall model: one table's bucket match needs ALL ``planes`` signs to
    agree (miss-prone as planes grow); L independent tables recover
    recall ≈ 1−(1−p^planes)^L while keeping per-table candidate sets
    small — the standard precision/recall dial pair.  Measured at sf0.1
    (tools/ann_recall.py): planes=8 single-table recall@10 = 0.03;
    planes=8 × 4 tables ≈ an order of magnitude better candidate
    coverage at 4× the (slim) bucket rows.

    Scale shape: the corpus explodes only (id, bucket-string) per table —
    vectors are not replicated in the shuffle when the query side is
    broadcast; candidate pairs found in several tables dedupe BEFORE the
    cosine, so each pair is scored once.
    """
    dim = _probe_dim(corpus, vec_col)

    def tables(vec_name: str) -> Column:
        # one parsed expression for ALL tables' bucket keys
        entries = ", ".join(
            "named_struct('tbl', {t}, 'bucket', {key})".format(
                t=t,
                key=_bucket_key_sql(
                    vec_name, planes, seed + LSH_TABLE_SEED_STRIDE * t, dim
                ),
            )
            for t in range(num_tables)
        )
        return F.expr(f"array({entries})")

    cb = (
        ensure_parallelism(corpus)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            _norm(F.col(vec_col)).alias("__cn"),
            F.explode(tables(vec_col)).alias("tb"),
        )
        .select(
            "neighbor_id", "c_vec", "__cn",
            F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"),
        )
    )
    qb = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(F.col(vec_col)).alias("__qn"),
            F.explode(tables(vec_col)).alias("tb"),
        )
        .select(
            "query_id", "q_vec", "__qn",
            F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"),
        )
    )
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "sim",
        _paired_cosine(
            F.col("q_vec"), F.col("c_vec"), F.col("__qn"), F.col("__cn")
        ),
    ).select("query_id", "neighbor_id", "sim")
    return _rank_topk(scored, k)


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label embedding centroid, one (label, pos, c) row per
    dimension — class prototypes for nearest-centroid classification,
    cluster drift monitoring, or IVF seeding.

    Scale shape: ``posexplode`` fans each vector into (label, pos, value)
    rows — dim× the input, but slim — then ONE partial-aggregable hash
    aggregate computes the per-dimension mean.  No collect, no windows;
    exploded-row shuffle only carries (label, pos, partial sum) after
    map-side combine.  Mean is rounded to 6 dp for cross-engine hash
    stability (parallel double sums drift at ~1e-15).
    """
    exploded = ensure_parallelism(df).select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    return exploded.groupBy("label", "pos").agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("c"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def _centroids(corpus: DataFrame, n: int, id_col: str, vec_col: str):
    """Deterministic coarse centroids: the ``n`` lowest-id corpus
    vectors.  A stand-in quantizer that is oracle-replicable in SQL
    (the default — see :func:`_kmeans_centroids` for the quality path).
    Driver-bounded collect of n rows — the same bounded round-trip as
    the reference's MapBroadcast (MapBroadcast.scala:36-59).
    """
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(n).collect()
    return [(r[id_col], list(r[vec_col])) for r in rows]


def _kmeans_centroids(
    corpus: DataFrame,
    n: int,
    id_col: str,
    vec_col: str,
    iters: int = 8,
    sample: int = 4096,
    seed: int = 42,
):
    """Sampled spherical k-means quantizer: Lloyd iterations over a
    BOUNDED deterministic sample on the driver (numpy), cosine
    assignment.  The sample is hash-ordered (md5 of the id), so the
    same corpus + seed always yields the same centroids — reproducible
    index builds.  Driver memory is capped at ``sample`` vectors no
    matter the corpus size; at 100 TB raise ``sample``/``n`` together
    (the collect stays a bounded MapBroadcast-style round-trip).
    """
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))))
        .limit(sample)
        .collect()
    )
    if not rows:  # empty corpus → no lists; ivf_topk returns empty
        return []
    n = min(n, len(rows))  # fewer vectors than lists: one list each
    X = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[:n].copy()  # deterministic init: first n of the hash order
    for _ in range(iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(Xn @ Cn.T, axis=1)
        for j in range(n):
            members = Xn[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
            # empty cluster: keep the previous centroid (deterministic)
    return [(j, [float(x) for x in C[j]]) for j in range(n)]


def _nearest_centroids(vec_name: str, cents, nprobe: int) -> Column:
    """array<long> of the ``nprobe`` centroid ids nearest to column
    ``vec_name`` (cosine desc, centroid id asc tie-break).

    The WHOLE expression is emitted as one SQL string → ONE ``F.expr``
    parse.  Building it with Column operators cost hundreds of py4j
    round-trips per plan (8 centroids × cosine trees × 2 call sites
    ≈ 2 s of driver time per ivf_topk call, dominating small-scale
    wall-clock).  Arithmetic is kept bit-identical to
    :func:`cosine_similarity`: sequential double fold for the dot and
    the row-vector norm; the CENTROID norm is pre-folded in Python over
    the same literal doubles in the same order (IEEE-identical to the
    runtime fold it replaces), so oracle hashes are unchanged.

    Cosine stays a top-level expression, NOT inside a higher-order-
    function lambda over a centroid array: a column reference captured
    in a lambda trips Spark's deduplicate-relations rewrite when the
    same scan feeds both join sides (observed
    INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on warm sessions)."""
    if not cents:
        # empty corpus → no centroids; a typed null array keeps the plan
        # analyzable (element_at → null, explode → zero rows)
        return F.lit(None).cast("array<bigint>")
    import math

    v = f"`{vec_name}`"
    # row-vector norm; repeated per centroid in the TEXT, deduplicated at
    # runtime by whole-stage-codegen subexpression elimination
    nv = (
        f"sqrt(aggregate({v}, 0.0D,"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    entries = []
    for cid, cvec in cents:
        lit = _lit_doubles(cvec)
        nl = math.sqrt(sum(float(x) * float(x) for x in cvec))
        dot = (
            f"aggregate(zip_with({v}, {lit},"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " 0.0D, (acc, s) -> acc + s)"
        )
        entries.append(
            f"named_struct('sim', round({dot} / ({nv} * {float(nl)!r}D), 6),"
            f" 'negid', {-int(cid)}L)"
        )
    # struct sort compares (sim, negid): sim desc via sort desc, and
    # negid desc == centroid id asc — the deterministic tie-break.
    return F.expr(
        f"transform(slice(sort_array(array({', '.join(entries)}), false),"
        f" 1, {int(nprobe)}), s -> -s.negid)"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 8,
    quantizer: str = "kmeans",
    quantized: bool = False,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is coarse-quantized into
    ``n_centroids`` inverted lists (each vector assigned to its nearest
    centroid); a query probes only its ``nprobe`` nearest lists.

    Output: (query_id, neighbor_id, sim), ≤ k rows per query; neighbors
    outside the probed lists are missed — documented ANN semantics,
    recall grows with ``nprobe``.

    Defaults are the MEASURED recall/cost frontier (tools/ann_recall.py,
    BASELINE.md ann_recall table): per-query cost is the corpus
    fraction scored, ``nprobe/n_centroids``.  At EQUAL 0.50 cost,
    finer lists win — kmeans 16 lists @ nprobe=8 ≈ 0.84 recall@10 vs
    0.76 for 8 @ 4 (the pre-r09 default), so 16/8 is the default.
    Clearing the ~0.9 production bar on these (weakly clustered)
    embeddings takes 24/16 ≈ 0.92 at 0.67 cost or 16/12 ≈ 0.95 at
    0.75 cost — recall here is bounded by candidate coverage, so pay
    nprobe, not scoring precision.  The quantizer cost is one bounded
    4,096-row driver sample + a few local k-means rounds (one-off,
    independent of corpus size).  Raise ``n_centroids`` with corpus
    size (cost per query ~ nprobe × corpus/n_centroids) to keep the
    scored candidate set flat.

    ``quantizer``: ``"kmeans"`` (default) runs sampled spherical
    k-means (:func:`_kmeans_centroids`) for balanced lists and the
    measured recall above; ``"ids"`` uses the n lowest-id vectors as
    centroids — SQL-replicable, so the correctness oracle can cover
    the whole IVF pipeline (the registered oracle query pins it).

    Scale: assignment is a per-row expression over broadcast centroid
    literals (no shuffle of the corpus); the probe join shuffles on the
    centroid id — ``n_centroids`` partition-able lists, the classic IVF
    shape.  At 100 TB raise ``n_centroids`` so each list fits a task.

    ``quantized=True`` composes the two ANN cost levers: list probing
    prunes CANDIDATES while int8 codes shrink the BYTES each candidate
    costs — assignment still uses the float vectors (centroid-routing
    quality unchanged), but the rows that ride the probe shuffle carry
    4×-smaller codes and score with exact int64 dot products (the
    recall delta of the int8 scoring alone is ~0.98 vs float, see
    tools/ann_recall.py).

    ``rerank=m`` (with ``quantized=True``) adds the classic two-stage
    retrieval: stage 1 scores int8 codes inside the probed lists and
    keeps each query's top ``m×k`` CANDIDATES; stage 2 joins those
    slim (query_id, neighbor_id) pairs back to the float vectors and
    re-scores exactly, returning the exact-cosine top k.  Candidate
    coverage (what nprobe bought) is unchanged; the int8 scoring
    error — the only approximation the codes introduce — is removed
    for the winners, at the cost of one keyed join over m×k rows per
    query (never corpus-sized).  ``rerank`` without ``quantized`` is
    a no-op (stage-1 scores are already exact float cosine) and
    raises to keep the cost model honest.
    """
    if rerank is not None:
        if not quantized:
            raise ValueError(
                "ivf_topk: rerank without quantized=True is a no-op "
                "(float stage-1 scores are already exact) — drop rerank "
                "or set quantized=True"
            )
        if rerank < 1:
            raise ValueError("ivf_topk: rerank must be >= 1")
    if quantizer == "kmeans":
        cents = _kmeans_centroids(corpus, n_centroids, id_col, vec_col)
    elif quantizer == "ids":
        cents = _centroids(corpus, n_centroids, id_col, vec_col)
    else:
        raise ValueError(f"ivf_topk: unknown quantizer {quantizer!r}")
    payload = (
        (lambda v: _int8_codes(v)) if quantized else (lambda v: v)
    )
    cb = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        payload(F.col(vec_col)).alias("c_vec"),
        F.element_at(_nearest_centroids(vec_col, cents, 1), 1).alias("cid"),
    )
    # explode_outer + null-drop: a plain explode's inferred size()>0
    # filter would evaluate the full centroid-distance sort a second
    # time per query row; the null filter on the generated attribute
    # also preserves the empty-corpus (typed-null array) behavior
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        payload(F.col(vec_col)).alias("q_vec"),
        F.explode_outer(
            _nearest_centroids(vec_col, cents, nprobe)
        ).alias("cid"),
    ).where(F.col("cid").isNotNull())
    if quantized:
        qn, cn = _int_norm(F.col("q_vec")), _int_norm(F.col("c_vec"))
        sim = F.when(
            (qn > 0.0) & (cn > 0.0),
            F.round(_int_dot(F.col("q_vec"), F.col("c_vec")).cast("double") / (qn * cn), 6),
        ).otherwise(F.lit(0.0))
    else:
        cb = cb.withColumn("__cn", _norm(F.col("c_vec")))
        qb = qb.withColumn("__qn", _norm(F.col("q_vec")))
        sim = _paired_cosine(
            F.col("q_vec"), F.col("c_vec"), F.col("__qn"), F.col("__cn")
        )
    scored = (
        cb.join(F.broadcast(qb), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", sim)
        .select("query_id", "neighbor_id", "sim")
    )
    stage1_k = k if rerank is None else rerank * k
    top = _rank_topk(scored, stage1_k)
    if rerank is None:
        return top
    # stage 2: exact float re-score of the ≤ m×k candidates per query —
    # slim id-pair join back to the float vectors, never corpus-sized
    fv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__c_fvec"),
        _norm(F.col(vec_col)).alias("__c_fn"),
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q_fvec"),
        _norm(F.col(vec_col)).alias("__q_fn"),
    )
    exact = (
        top.drop("sim")
        .join(fv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "sim",
            _paired_cosine(
                F.col("__q_fvec"), F.col("__c_fvec"),
                F.col("__q_fn"), F.col("__c_fn"),
            ),
        )
        .select("query_id", "neighbor_id", "sim")
    )
    return _rank_topk(exact, k)


def _int8_codes(vec: Column) -> Column:
    """Symmetric per-vector int8 codes (see :func:`quantize_embeddings`)."""
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    scale = F.when(maxabs > 0.0, F.lit(127.0) / maxabs).otherwise(F.lit(0.0))
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x.cast("double") * scale).cast("int")),
        ).cast("tinyint"),
    )


def _int_norm(c: Column) -> Column:
    """sqrt of the exact int64 self-dot of a code array."""
    return F.sqrt(
        F.aggregate(
            c,
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long") * x.cast("long"),
        ).cast("double")
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two code arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column.

    Returns (``id_col``, ``codes`` array<tinyint>, ``inv_scale``
    double): per vector, ``scale = 127 / max|x|`` and ``codes[i] =
    clamp(floor(x[i]·scale), -127, 127)``; reconstruct with ``x̂[i] =
    codes[i] · inv_scale`` where ``inv_scale = max|x| / 127``.
    All-zero vectors quantize to all-zero codes with ``inv_scale`` 0.
    Vectors with any non-finite component (NaN/±Inf) are EXCLUDED:
    they have no meaningful scale — Spark's NaN-greatest comparison
    semantics would otherwise leak a NaN ``inv_scale`` downstream and
    poison every dot product (r15 extreme-numerics gate).  The finite
    domain is the same contract the ANN candidate paths assume.

    Why it matters at 100 TB: a float32 embedding column is usually the
    WIDEST column in the corpus — int8 codes cut the scan, the shuffle,
    and the ANN candidate state by 4× while keeping cosine ranking
    nearly intact (quantized cosine recall is characterised in
    tests/tools, same protocol as the LSH/IVF paths).  Everything here
    is a projection — no shuffle, no Python, and the math (IEEE double
    multiply + floor) is bit-identical cross-engine, so even the codes
    themselves are oracle-checkable.
    """
    vec = F.col(vec_col)
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    # NULL-explicit finiteness (r15 ADVICE): forall over a vector with a
    # NULL element yields NULL, which filter() drops — the right call (a
    # NULL component has no quantizable magnitude) but it must be
    # DECLARED, not an artifact of 3VL: coalesce pins the contract to
    # "any NULL/NaN/±Inf component ⇒ vector excluded" so the DuckDB twin
    # (list bool_and SKIPS NULLs and would keep the row) can mirror it
    # with an explicit e IS NOT NULL term.
    finite = F.coalesce(
        F.forall(
            vec,
            lambda x: x.isNotNull()
            & ~F.isnan(x.cast("double"))
            & (F.abs(x.cast("double")) != F.lit(float("inf"))),
        ),
        F.lit(False),
    )
    # spread the per-vector quantization math (array transform + clamp
    # per component) across the cluster when the source scan is narrower
    # than it — a single-file embeddings table otherwise quantizes on
    # one core (r16, guide §2.5 input-side narrowness; no-op at scale)
    return ensure_parallelism(df).filter(finite).select(
        F.col(id_col),
        _int8_codes(vec).alias("codes"),
        F.when(maxabs > 0.0, maxabs / F.lit(127.0)).otherwise(F.lit(0.0)).alias("inv_scale"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-over-quantized cosine top-k: brute-force search run on
    int8 codes instead of float vectors.

    Both sides are quantized with :func:`quantize_embeddings`; the
    score is the cosine of the CODE vectors — the int×int dot product
    accumulates exactly in long (codes are ≤127, so 2^14 per term:
    no rounding until the final two sqrts), making the scores
    bit-deterministic cross-engine without any float-fold contract.
    Symmetric per-vector scaling preserves cosine up to quantization
    error; ranking quality vs the float path is measured in tests.

    Scale shape: identical to :func:`brute_force_topk` (queries
    broadcast, corpus unshuffled, partial per-query top-k) but the
    corpus side rides 4× fewer bytes — this is the brute-force scan
    you can actually afford at 10⁹ vectors.
    """
    # norms projected BEFORE the join: computed once per row, not once
    # per (query × corpus) candidate pair
    cq = quantize_embeddings(corpus, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("codes").alias("c_codes"),
        _int_norm(F.col("codes")).alias("c_norm"),
    )
    qq = quantize_embeddings(queries, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("codes").alias("q_codes"),
        _int_norm(F.col("codes")).alias("q_norm"),
    )
    idot = _int_dot(F.col("q_codes"), F.col("c_codes"))
    scored = (
        ensure_parallelism(cq)
        .join(F.broadcast(qq), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.when(
                (F.col("q_norm") > 0.0) & (F.col("c_norm") > 0.0),
                F.round(idot.cast("double") / (F.col("q_norm") * F.col("c_norm")), 6),
            ).otherwise(F.lit(0.0)),
        )
        .select("query_id", "neighbor_id", "sim")
    )
    return _rank_topk(scored, k)
