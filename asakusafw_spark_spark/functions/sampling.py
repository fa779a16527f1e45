"""Deterministic sampling / dataset-split operators for training-data
pipelines.

Everything here is HASH-derived, never ``rand()``: a row's fate depends
only on its key and the seed, so samples are reproducible across runs,
retries, cluster sizes, and engines (the md5-prefix hash is the repo's
cross-engine determinism primitive — see ``functions.dedup.str_hash64``),
and a re-run of a 100 TB job selects byte-identical training sets.  All
expressions are native Columns: sampling is a filter pushed into the
scan's partition-parallel evaluation — no shuffle, no Python.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import str_hash64

#: hash-unit denominator: u = h mod 1e6 / 1e6 gives ~20 bits of rate
#: resolution, enough for any practical sampling rate while keeping the
#: arithmetic exact in both Spark and DuckDB integers.
_UNIT = 1_000_000


def unit_hash(key: Column, seed: int = 42) -> Column:
    """Uniform [0, 1) hash of a key column — the sampling coin flip.
    ``u = (md5_60bit(key || ':' || seed) mod 1e6) / 1e6``."""
    h = str_hash64(F.concat(key.cast("string"), F.lit(f":{seed}")))
    return F.pmod(h, F.lit(_UNIT)) / F.lit(float(_UNIT))


def hash_sample(
    df: DataFrame,
    rate: float | Mapping[str, float],
    key_col: str,
    strata_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with ``unit_hash < rate``.

    ``rate`` may be a single float or, with ``strata_col``, a mapping of
    stratum value → rate (unlisted strata keep rate 0.0) — per-language /
    per-source quota curation in one pass.
    """
    u = unit_hash(F.col(key_col), seed)
    if isinstance(rate, Mapping):
        if strata_col is None:
            raise ValueError("hash_sample: per-stratum rates need strata_col")
        expr: Column = F.lit(0.0)
        for value, r in sorted(rate.items()):
            expr = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(expr)
        return df.filter(u < expr)
    return df.filter(u < F.lit(float(rate)))


def assign_split(
    df: DataFrame,
    weights: Mapping[str, float],
    key_col: str,
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one ``split`` label per
    row by cumulative hash-unit thresholds.  Weights must sum to ~1;
    insertion order of ``weights`` defines the threshold order."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"assign_split: weights sum to {total}, expected 1")
    u = unit_hash(F.col(key_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        case = F.when(u < F.lit(acc), F.lit(name))
        expr = case if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str,
    seed: int = 42,
    shard_col: str = "shard",
    order_col: str = "shard_order",
) -> DataFrame:
    """Deterministic balanced shard assignment + within-shard
    pseudo-random order — the global-shuffle step before exporting
    training shards.

    ``shard = hash(key:shard:seed) mod n_shards`` and ``order`` is the
    raw hash, so (a) shard sizes are multinomial-balanced, (b) rows
    land in a pseudo-random order UNCORRELATED with the source layout
    (no sorted-by-crawl-date shards), and (c) the whole assignment is
    replay-identical — no ``rand()``, task retries and re-runs produce
    byte-identical shards.
    """
    if n_shards <= 0:
        raise ValueError("assign_shards: n_shards must be positive")
    h = str_hash64(F.concat(F.col(key_col).cast("string"), F.lit(f":shard:{seed}")))
    return df.withColumn(shard_col, F.pmod(h, F.lit(n_shards)).cast("int")).withColumn(
        order_col, h
    )


def export_shards(
    df: DataFrame,
    base_path: str,
    n_shards: int,
    key_col: str,
    format: str = "parquet",
    seed: int = 42,
    **options,
) -> None:
    """Write ``df`` as ``n_shards`` deterministic training shards under
    ``base_path/shard=<i>/``, rows pseudo-randomly ordered within each
    shard (see :func:`assign_shards`).

    One range-repartition on (shard, order) + a within-partition sort —
    a single wide dependency, the same shape as grouped Direct I/O.
    Range partitioning (not hash: hashing the shard id collides shard
    ids into the same task and idles others) gives ≈1 shard per task;
    a shard that straddles a sampled range boundary lands as 2 files in
    its directory — file COUNT is physical layout, while the
    row→shard assignment and within-shard order are the deterministic
    contract.
    """
    from ..sources.write import write_flat

    sharded = assign_shards(df, n_shards, key_col, seed)
    arranged = sharded.repartitionByRange(
        n_shards, F.col("shard"), F.col("shard_order")
    ).sortWithinPartitions("shard", "shard_order")
    write_flat(
        arranged.drop("shard_order"), base_path, format=format,
        partition_by=["shard"], **options,
    )


def mix_corpus(
    df: DataFrame,
    proportions: Mapping[str, float],
    token_budget: int,
    key_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """Deterministic corpus mixing: sample each source so the output
    approximates ``token_budget`` whitespace-tokens blended in the given
    ``proportions`` — the data-mixture step of training-set assembly
    (e.g. 50% web, 30% code, 20% books).

    Per-source keep rate = ``min(1, token_budget·prop / source_tokens)``
    (a source too small for its quota is taken whole — the shortfall is
    reported by downstream ``corpus_stats``, not silently rebalanced);
    rows are kept by :func:`unit_hash` ``< rate`` on ``key_col``, so
    the sample is replay-identical and composes with the other hash-
    based curation ops.  Sources absent from ``proportions`` get rate 0.

    Scale shape: one map-side-combinable token aggregate (rows = number
    of SOURCES, broadcast back) + a stateless hash filter — the corpus
    itself never shuffles.
    """
    from .text import token_count

    if token_budget <= 0:
        raise ValueError("mix_corpus: token_budget must be positive")
    if not proportions or any(p < 0 for p in proportions.values()):
        raise ValueError("mix_corpus: proportions must be non-empty and ≥ 0")
    tok = token_count(F.col(text_col))
    totals = df.groupBy(source_col).agg(F.sum(tok).alias("__tokens__"))
    prop: Column = F.lit(0.0)
    for name, p in sorted(proportions.items()):
        prop = F.when(F.col(source_col) == name, F.lit(float(p))).otherwise(prop)
    # a zero-token source (all-empty texts) gets rate 0, not a
    # DIVIDE_BY_ZERO abort (Spark 4 runs ANSI mode by default)
    rates = totals.withColumn(
        "__rate__",
        F.when(
            F.col("__tokens__") > 0,
            F.least(
                F.lit(1.0),
                F.lit(float(token_budget)) * prop / F.col("__tokens__"),
            ),
        ).otherwise(F.lit(0.0)),
    )
    out = df.join(F.broadcast(rates.select(source_col, "__rate__")), source_col)
    return out.filter(unit_hash(F.col(key_col), seed) < F.col("__rate__")).drop(
        "__rate__"
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    by: str | None = None,
    shards: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Concat-then-chunk sequence packing: assign each document its
    position in fixed-token training sequences → adds ``n_tokens``,
    ``pack_id`` (which pack the doc STARTS in) and ``pack_pos`` (token
    offset of the doc's start inside that pack), plus ``pack_shard``
    when ``shards > 1``.

    Documents are laid out in deterministic hash order (hash of the id +
    seed, id tiebreak — no ``rand()``, replay/retry/engine-identical),
    concatenated, and chunked every ``budget_tokens``: exactly the
    pretraining packing convention where sequence N holds tokens
    ``[N·budget, (N+1)·budget)`` of the concatenated stream.  The pack
    layout is therefore a pure FUNCTION of (ids, token counts, seed) —
    a 100 TB re-run or a per-shard retry rebuilds byte-identical packs.

    Scale shape: one window cumsum per packing domain (``by`` × shard).
    A total order inside each domain is inherent to packing; ``shards=N``
    subdivides domains by id-hash so each window sorts 1/N of the data
    independently (N× parallelism, still deterministic) — size shards so
    a domain's token stream fits a task's spill budget.

    ``token_col`` supplies pre-computed token counts (e.g. from a real
    tokenizer); default is whitespace :func:`~..text.token_count`.
    """
    from pyspark.sql import Window as W

    from .text import token_count

    n = (
        F.col(token_col).cast("long")
        if token_col
        else token_count(text_col)
    )
    out = df.withColumn("n_tokens", F.coalesce(n, F.lit(0)))
    order_h = str_hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f":pack:{seed}"))
    )
    parts = [by] if by else []
    if shards > 1:
        shard = F.pmod(
            str_hash64(
                F.concat(F.col(id_col).cast("string"), F.lit(f":packshard:{seed}"))
            ),
            F.lit(shards),
        ).cast("int")
        out = out.withColumn("pack_shard", shard)
        parts.append("pack_shard")
    w = (
        (W.partitionBy(*parts) if parts else W.partitionBy())
        .orderBy(order_h.asc(), F.col(id_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        out.withColumn("__start__", start)
        .withColumn(
            "pack_id", F.expr(f"__start__ div {int(budget_tokens)}").cast("long")
        )
        .withColumn(
            "pack_pos", F.pmod(F.col("__start__"), F.lit(int(budget_tokens))).cast("long")
        )
        .drop("__start__")
    )


def materialize_packs(
    df: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = None,
    shards: int = 1,
    seed: int = 42,
    sep: str = " ",
) -> DataFrame:
    """Materialize :func:`pack_sequences` into training rows: one row per
    (domain, shard, pack) with the documents' text concatenated in pack
    order → ``(…, pack_id, n_docs, n_tokens, doc_ids, pack_text)``.
    ``doc_ids`` is the ``sep``-ordered comma-joined id list (a string,
    not an array — engine-stable for the oracle and cheap to log).

    Scale shape: the packing window shuffle, then ONE hash aggregate
    keyed by (domain, shard, pack).  Per-group state is bounded by the
    pack budget (a pack holds ≤ budget tokens by construction, modulo
    one straddling document), so ``collect_list`` here — normally a red
    flag — is bounded the way a Spark aggregate needs; sorting each
    pack's few structs (``array_sort``) replaces a global order-by.
    """
    packed = pack_sequences(
        df,
        budget_tokens,
        id_col=id_col,
        text_col=text_col,
        by=by,
        shards=shards,
        seed=seed,
    )
    keys = ([by] if by else []) + (["pack_shard"] if shards > 1 else []) + ["pack_id"]
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("pack_pos").alias("p"),
                F.col(id_col).cast("string").alias("i"),
                F.col(text_col).alias("t"),
            )
        )
    )
    return packed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.array_join(F.transform(ordered, lambda s: s["i"]), ",").alias("doc_ids"),
        F.array_join(F.transform(ordered, lambda s: s["t"]), sep).alias("pack_text"),
    )


def cap_per_group(
    df: DataFrame,
    by: str | list[str],
    n: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-group cap: keep at most ``n`` rows per group,
    chosen by hash order — reservoir sampling's reproducible cousin.

    The anti-dominance curation primitive: cap documents per domain /
    source so no single origin swamps the mixture.  Selection order is
    ``(unit_hash(key), key)`` — a uniform, seed-stable shuffle within
    the group, so the kept set is a uniform sample that never changes
    across runs, retries, or cluster sizes (no ``rand()``, no
    first-n-in-arrival-order bias).  ``key_col`` must be row-unique
    (a document/record id): it is the determinism tiebreak — duplicate
    keys inside one group would leave the cut arbitrary among them.

    Scale shape: one shuffle on the group key; the rank window sorts
    within groups only.  Hot groups sort ``group_size·log`` — if a
    group is pathologically hot, pre-filter with
    :func:`hash_sample` at ``~2n/size`` to bound the sort input; the
    docstring-level contract (hash order) makes the two compose
    exactly.
    """
    from pyspark.sql import Window as W

    keys = [by] if isinstance(by, str) else list(by)
    w = W.partitionBy(*keys).orderBy(
        unit_hash(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )


def sample_exact_n(
    df: DataFrame,
    n: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic EXACT-size sample: the ``n`` rows whose key hashes
    lowest (``unit_hash`` asc, key asc tie-break) — eval-set carving
    where "about 1%" (``hash_sample``) isn't acceptable and the same
    ``n`` rows must come back on every run, engine, and cluster size.

    Requires ``key_col`` to be unique for a fully deterministic result
    (ties inside one hash bucket fall back to key order).

    Scale shape: ``orderBy().limit(n)`` lowers to Spark's
    TakeOrderedAndProject — each task keeps a local top-``n`` heap and
    the driver merges ``n × partitions`` candidates; no global sort, no
    shuffle of the data.  Driver memory is ``O(n · partitions)`` slim
    rows: fine for eval-set sizes (10²–10⁶); for a sample that is a
    large FRACTION of the corpus use ``hash_sample`` instead.
    """
    u = unit_hash(F.col(key_col), seed)
    return df.orderBy(u.asc(), F.col(key_col).asc()).limit(int(n))
