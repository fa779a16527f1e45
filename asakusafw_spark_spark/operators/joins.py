"""Master/transaction join family (SURVEY.md §2.4).

All reference joins are equi-joins on a group key between a *master*
input and a *transaction* input; per transaction record at most ONE
master is chosen by a "master selection":

- default: the first master of the group in group-sort order
  (runtime/.../operator/DefaultMasterSelection.scala:22-27);
- custom: a user method that sees the whole (sorted) master group and
  the transaction record and may encode range/as-of/theta predicates
  (SURVEY.md §2.4 "non-default masterSelection").

Physical strategies mirror the reference's planner choice
(Shuffled*/Broadcast* compiler twins): ``strategy ∈ {"auto",
"broadcast", "shuffled"}`` — ``auto`` lets Catalyst/AQE pick using the
20 MiB TINY threshold configured in :mod:`..session`.

Scale design:

- Master selection is pushed BEFORE the join whenever it only depends on
  master columns: we reduce each master group to its selected single row
  (partial-aggregable ``min_by`` on an ordering struct → map-side
  combine, no sort), then the join is a plain 1:N equi-join that AQE can
  broadcast or sort-merge.  This keeps the big transaction side
  shuffle-free in the broadcast case.
- A per-transaction predicate (``where``) makes selection depend on the
  tx record; we then left-join ALL candidate masters and keep the best
  per tx row with one ``min_by`` aggregation keyed by a transaction row
  id — no window sort, map-side combinable, skew handled by AQE.
- A fully custom Python ``select_fn`` falls back to a cogrouped
  ``applyInPandas`` (Arrow-batched; documented slow path).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

Ordering = Sequence[tuple[str, str]]  # [(col, "asc"|"desc"), ...]

# constant match marker carried on the master side through every join path:
# non-null iff the row matched a master (probing a data column instead would
# misclassify matched masters whose probed column happens to be null)
_HIT = "__m_hit__"


@dataclass
class MasterSelection:
    """How to pick ≤1 master per transaction record.

    ``ordering``   — sort spec over master columns; the FIRST candidate
                     wins (default selection semantics).  Defaults to all
                     master columns ascending for determinism.
    ``where``      — optional Column predicate over (master, tx) columns
                     refining candidates per transaction (range/as-of/
                     theta inside the group — the reference expresses
                     these inside a @MasterSelection Java method).
    ``select_fn``  — optional Python callable
                     ``(masters: pd.DataFrame, tx: pd.Series) -> int|None``
                     returning the index of the chosen master (or None);
                     forces the cogroup slow path.  Per-ROW Python — prefer
                     ``select_batch_fn`` on hot keys.
    ``select_batch_fn`` — vectorized variant:
                     ``(masters: pd.DataFrame, txs: pd.DataFrame) ->
                     array-like of int`` with one positional master index
                     per tx row (−1 / None / NaN = no match).  One Python
                     call per (group × Arrow batch) instead of per tx row.

    Skew defence for the ``where`` path (the candidate join multiplies a
    hot key's tx rows by its master-group size BEFORE the per-tx
    reduction, and AQE has no recourse when the master side is
    broadcast):

    ``max_candidates`` — keep only the N best master rows per key group
                     under ``ordering`` before the candidate join,
                     bounding the blowup at N× regardless of group size.
                     EXACT whenever every tx row's admissible set (under
                     ``where``) intersects the kept N or is empty — e.g.
                     bounded versions-per-key, or a predicate that admits
                     a prefix of the ordering.  For a backward as-of
                     join it is an approximation: a tx row older than
                     all N kept masters reports missed instead of
                     matching an older master.  Measured in
                     tools/skew_probe.py (BASELINE.md "where-path skew").
    ``scatter_tx`` — round-robin-repartition the tx side before the
                     candidate join.  EXACT always; defends the common
                     real-world skew where hot-key tx rows arrive
                     CLUSTERED in a few input partitions (sorted files),
                     which concentrates the whole blowup in those tasks.
                     Costs one extra tx shuffle — worth it only when the
                     blowup is task-concentrated.
    """

    ordering: Ordering | None = None
    where: Column | None = None
    select_fn: Callable | None = field(default=None, repr=False)
    select_batch_fn: Callable | None = field(default=None, repr=False)
    max_candidates: int | None = None
    scatter_tx: bool = False


def _dedupe_masters(master: DataFrame, key: Sequence[str], sel: MasterSelection) -> DataFrame:
    """Reduce masters to the single selected row per group key.

    Spark structs compare field-by-field, so ``min_by(row, ord_struct)``
    picks the first row of the sorted group WITHOUT sorting — it runs as
    a partial-aggregable hash aggregate (map-side combine), the scalable
    replacement for a window ``row_number() = 1``.  Descending orderings
    fall back to the window (sort-based, still a single shuffle).
    """
    ordering = sel.ordering or [(c, "asc") for c in master.columns]
    all_asc = all(d == "asc" for _, d in ordering)
    if all_asc:
        ord_struct = F.struct(*[F.col(c) for c, _ in ordering])
        row_struct = F.struct(*[F.col(c) for c in master.columns])
        picked = (
            master.groupBy(*key)
            .agg(F.min_by(row_struct, ord_struct).alias("__m__"))
            .select(*key, *[F.col(f"__m__.{c}").alias(c) for c in master.columns if c not in key])
        )
        return picked
    # window fallback for desc orderings (sort-based, still one shuffle)
    from pyspark.sql import Window as W

    order_cols = [F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in ordering]
    w = W.partitionBy(*key).orderBy(*order_cols)
    return (
        master.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


#: Debug conf gating the unique_master key-uniqueness assertion.
VALIDATE_UNIQUE_CONF = "spark.asakusafw.validateUniqueMaster"


def _validate_unique_master(master: DataFrame, mkey: Sequence[str]) -> None:
    """Debug-mode guard for ``unique_master=True``: when the session conf
    ``spark.asakusafw.validateUniqueMaster`` is ``true``, assert the
    declared key-uniqueness with one count-distinct aggregate BEFORE the
    join — a duplicate dimension key silently fans out tx rows (the
    documented SQL-parity behaviour), which is exactly the pipeline bug
    class this catches in integration runs.  Off by default: the whole
    point of ``unique_master`` is skipping the per-key aggregate, so the
    check must not reinstate that cost on production paths."""
    spark = master.sparkSession
    try:
        enabled = spark.conf.get(VALIDATE_UNIQUE_CONF, "false")
    except Exception:
        return
    if str(enabled).lower() != "true":
        return
    dup = (
        master.groupBy(*[F.col(k) for k in mkey])
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        keyval = {k: dup[0][k] for k in mkey}
        raise ValueError(
            f"unique_master=True, but master key {keyval} occurs "
            f"{dup[0]['__n__']}x — the join would fan out tx rows; "
            "deduplicate the master or drop unique_master"
        )


def _apply_strategy(master: DataFrame, strategy: str) -> DataFrame:
    if strategy == "broadcast":
        return F.broadcast(master)
    if strategy == "shuffled":
        return master.hint("shuffle_merge")
    if strategy == "auto":
        return master
    raise ValueError(f"unknown join strategy {strategy!r}")


def _prefix(df: DataFrame, prefix: str) -> DataFrame:
    return df.select(*[F.col(c).alias(prefix + c) for c in df.columns])


def _join_selected(
    master: DataFrame,
    tx: DataFrame,
    key: Sequence[str] | Sequence[tuple[str, str]],
    selection: MasterSelection | None,
    strategy: str,
    skew_salt: int = 1,
    unique_master: bool = False,
) -> tuple[DataFrame, list[str], list[str]]:
    """Left-join tx with its selected master.

    Returns (joined frame with master columns prefixed ``m_``…, master
    column names as present in the joined frame, tx column names).
    ``key`` is either shared column names or (master_col, tx_col) pairs.

    The joined frame always carries a ``__m_hit__`` boolean column that is
    non-null iff the row matched a master — callers probe it for the
    hit/miss split instead of a data column (a genuinely matched master
    whose probed column is null would otherwise misreport as missed).

    ``unique_master=True`` declares the master already key-unique: the
    ``min_by`` pre-reduction is skipped, so on the shuffled path both
    sort-merge-join children are bare shuffle stages — the shape that
    keeps AQE's OptimizeSkewedJoin eligible on every Spark version
    (Spark 4.1 also splits through the pre-reduction, older versions
    required bare ENSURE_REQUIREMENTS children on both sides; either
    way skipping the aggregate removes a full hash-agg pass over the
    master — measured in tools/skew_probe.py).  The caller's guarantee
    is NOT validated (validation would cost the aggregate being
    skipped); a duplicate master key silently fans out tx rows, exactly
    like a duplicate dimension key in plain SQL.
    """
    sel = selection or MasterSelection()
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in key]
    mkey = [p[0] for p in pairs]

    if sel.select_fn is not None or sel.select_batch_fn is not None:
        return _join_selected_cogroup(master, tx, pairs, sel)

    m = _prefix(master, "__m_").withColumn(_HIT, F.lit(True))
    mcols = [f"__m_{c}" for c in master.columns]
    cond = None
    for mk, tk in pairs:
        c = F.col(f"__m_{mk}") == F.col(tk)
        cond = c if cond is None else (cond & c)

    if sel.where is None:
        if cond is None:
            raise ValueError("master join without key requires selection.where")
        # selection independent of tx → pre-reduce master groups, then 1:N
        # join (skipped when the caller guarantees key-uniqueness, keeping
        # the master child a bare shuffle so AQE skew-split stays eligible)
        if unique_master:
            _validate_unique_master(master, mkey)
        m1 = master if unique_master else _dedupe_masters(master, mkey, sel)
        m1 = _prefix(m1, "__m_").withColumn(_HIT, F.lit(True))
        if skew_salt > 1:
            # Hot-tx-key mitigation for the SHUFFLED path: AQE's skew-split
            # can't rewrite this join (the master child is an aggregate, not
            # a bare shuffle stage — OptimizeSkewedJoin requires both SMJ
            # children to be plain ENSURE_REQUIREMENTS shuffles), so spread
            # the hot key classically: replicate each (already 1-row-per-key)
            # master `skew_salt`× and give tx rows a random salt.  Output is
            # salt-invariant, so retries are safe even though rand() isn't
            # replay-stable.
            m1 = m1.withColumn(
                "__m_salt__",
                F.explode(F.array(*[F.lit(i) for i in range(skew_salt)])),
            )
            tx_s = tx.withColumn(
                "__salt__", (F.rand(42) * skew_salt).cast("int")
            )
            salted = cond & (F.col("__m_salt__") == F.col("__salt__"))
            joined = tx_s.join(
                _apply_strategy(m1, strategy), on=salted, how="left"
            ).drop("__salt__", "__m_salt__")
            return joined, mcols, list(tx.columns)
        joined = tx.join(_apply_strategy(m1, strategy), on=cond, how="left")
        return joined, mcols, list(tx.columns)

    # tx-dependent candidate predicate: LEFT-join all candidates, keep the
    # best per tx row with one aggregation.  An EMPTY key is allowed (pure
    # theta/range predicate — e.g. band lookups); the master must then be
    # broadcast-small, as the join is a nested-loop over the broadcast side.
    #
    # The tx row id feeds a single linear plan (project → left join →
    # reduce): the non-deterministic id expression is evaluated exactly once
    # and its VALUES flow downstream.  (An earlier design inner-joined and
    # then self-joined `best` back onto a second branch of the id frame —
    # two independent evaluations of monotonically_increasing_id that can
    # silently diverge under AQE re-planning or task retries.)  The left
    # join also keeps unmatched tx rows, so no re-join is needed at all.
    full_cond = sel.where if cond is None else (cond & sel.where)
    ordering = sel.ordering or [(c, "asc") for c in master.columns]
    if sel.max_candidates is not None:
        # bound the candidate blowup: N best master rows per key group
        # under the selection ordering (window sort over the SMALL master
        # side only; keyless band tables get a global window — they are
        # broadcast-small by contract).  Semantics documented on
        # MasterSelection.max_candidates.
        from pyspark.sql import Window as W

        order_cols = [
            F.col(c).asc() if d == "asc" else F.col(c).desc()
            for c, d in ordering
        ]
        w = (W.partitionBy(*mkey) if mkey else W.partitionBy()).orderBy(*order_cols)
        capped = (
            master.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= sel.max_candidates)
            .drop("__rn__")
        )
        m = _prefix(capped, "__m_").withColumn(_HIT, F.lit(True))
    if sel.scatter_tx:
        # spread input-clustered hot-key tx rows across the cluster before
        # the multiplying join (round-robin = exact: the left join and the
        # per-tx reduction are partitioning-independent, and __txid__ is
        # assigned AFTER the scatter)
        spark = tx.sparkSession
        try:
            width = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):  # e.g. "auto" on some builds
            width = spark.sparkContext.defaultParallelism
        tx = tx.repartition(width)
    txid = tx.withColumn("__txid__", F.monotonically_increasing_id())
    cand = txid.join(_apply_strategy(m, strategy), on=full_cond, how="left")
    if all(d == "asc" for _, d in ordering):
        ord_struct = F.struct(*[F.col(f"__m_{c}") for c, _ in ordering])
        row_struct = F.struct(*[F.col(c) for c in cand.columns if c != "__txid__"])
        joined = (
            cand.groupBy("__txid__")
            .agg(F.min_by(row_struct, ord_struct).alias("__r__"))
            .select("__r__.*")
        )
    else:
        from pyspark.sql import Window as W

        order_cols = [
            F.col(f"__m_{c}").asc() if d == "asc" else F.col(f"__m_{c}").desc()
            for c, d in ordering
        ]
        w = W.partitionBy("__txid__").orderBy(*order_cols)
        joined = (
            cand.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__", "__txid__")
        )
    return joined, mcols, list(tx.columns)


def _join_selected_cogroup(
    master: DataFrame, tx: DataFrame, pairs: list[tuple[str, str]], sel: MasterSelection
) -> tuple[DataFrame, list[str], list[str]]:
    """Slow path: custom Python master selection over the whole sorted
    group, mirroring the reference's shuffled join fragment
    (runtime/.../fragment/user/join/ShuffledJoinOperatorFragment.scala:
    22-47: masters buffered, transactions streamed).  Runs on the
    streaming cogroup (per-Arrow-batch Python cost, JVM secondary sort of
    the master group) so high-cardinality keys don't pay a per-group
    round-trip.

    Selector indices are gathered per batch; output columns are built
    column-wise with numpy ``take`` (no per-row dict building).  With
    ``select_batch_fn`` the whole path is one Python call per
    (group × batch); the per-row ``select_fn`` still pays a Python call
    per tx row to compute indices, but nothing else is per-row."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .group import Grouping, cogroup

    mkey = [p[0] for p in pairs]
    tkey = [p[1] for p in pairs]
    ordering = sel.ordering or [(c, "asc") for c in master.columns]
    select_fn = sel.select_fn
    select_batch_fn = sel.select_batch_fn
    mcols_src = list(master.columns)
    tcols = list(tx.columns)

    out_fields = (
        [tx.schema[c] for c in tcols]
        + [T.StructField(f"__m_{f.name}", f.dataType, True) for f in master.schema.fields]
        + [T.StructField(_HIT, T.BooleanType(), True)]
    )
    out_schema = T.StructType(out_fields)
    names = [f.name for f in out_fields]

    def fn(_key_vals, m_pdf: pd.DataFrame, t_pdf: pd.DataFrame) -> pd.DataFrame | None:
        n = len(t_pdf)
        if n == 0:
            return None
        if len(m_pdf) == 0:
            idx = np.full(n, -1, dtype="int64")
        elif select_batch_fn is not None:
            raw = np.asarray(select_batch_fn(m_pdf, t_pdf))
            if raw.dtype == object:
                idx = np.array(
                    [-1 if v is None else int(v) for v in raw], dtype="int64"
                )
            elif raw.dtype.kind == "f":
                idx = np.where(np.isnan(raw), -1, raw).astype("int64")
            else:
                idx = raw.astype("int64")
        else:
            if n > 10_000:
                import warnings

                # fixed text: a per-batch row count in the message would
                # defeat the warnings registry's once-per-location dedup
                warnings.warn(
                    "master selection: select_fn is per-row Python over a "
                    ">10k-row tx group batch — switch hot keys to "
                    "select_batch_fn (one vectorized call per group x batch)",
                    RuntimeWarning,
                    stacklevel=2,
                )
            idx = np.array(
                [
                    -1 if (i := select_fn(m_pdf, trow)) is None else int(i)
                    for _, trow in t_pdf.iterrows()
                ],
                dtype="int64",
            )
        matched = idx >= 0
        safe = np.where(matched, idx, 0)
        out = t_pdf[tcols].reset_index(drop=True).copy()
        for c in mcols_src:
            if len(m_pdf):
                vals = m_pdf[c].to_numpy(dtype=object, copy=True)[safe]
                vals[~matched] = None
            else:
                vals = np.full(n, None, dtype=object)
            out[f"__m_{c}"] = vals
        hit = np.full(n, None, dtype=object)
        hit[matched] = True
        out[_HIT] = hit
        return out[names]

    joined = cogroup(
        [Grouping(master, mkey, ordering), Grouping(tx, tkey)], fn, out_schema
    )
    return joined, [f"__m_{c}" for c in mcols_src], tcols


def _null_split(joined: DataFrame) -> tuple[DataFrame, DataFrame]:
    hit = joined.filter(F.col(_HIT).isNotNull())
    miss = joined.filter(F.col(_HIT).isNull())
    return hit, miss


def master_join(
    master: DataFrame,
    tx: DataFrame,
    key: Sequence[str] | Sequence[tuple[str, str]],
    mapping: dict[str, Column | str] | None = None,
    selection: MasterSelection | None = None,
    strategy: str = "auto",
    skew_salt: int = 1,
    unique_master: bool = False,
) -> dict[str, DataFrame]:
    """@MasterJoin → ``{"joined", "missed"}``.

    Reference: runtime/.../fragment/user/join/MasterJoin.scala:22-40 —
    build a joined record from (master, tx); tx with no master → missed.

    ``mapping`` maps output column → source column: ``"m.col"`` /
    ``"t.col"`` strings or arbitrary Columns over the joined frame (master
    columns visible as ``__m_<name>``).  Default: all tx columns + all
    non-key master columns.

    ``skew_salt > 1`` spreads a hot transaction key over that many
    partitions on the shuffled path (master rows replicated per salt) —
    use when one key dominates and the master side is too big to
    broadcast; broadcast strategy is inherently skew-immune.

    ``unique_master=True`` declares the master key-unique (a PK'd
    dimension): skips the per-key master selection, which on the
    shuffled path makes the join AQE-skew-split-eligible — the
    preferred hot-key defence (runtime, partition-local) over the
    static ``skew_salt`` replication.
    """
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in key]
    joined, mcols, tcols = _join_selected(
        master, tx, key, selection, strategy,
        skew_salt=skew_salt, unique_master=unique_master,
    )
    hit, miss = _null_split(joined)

    if mapping is None:
        mapping = {c: f"t.{c}" for c in tcols}
        for c in [m.removeprefix("__m_") for m in mcols]:
            if c not in mapping and c not in [p[0] for p in pairs]:
                mapping[c] = f"m.{c}"

    def resolve(spec: Column | str) -> Column:
        if isinstance(spec, str):
            if spec.startswith("m."):
                return F.col("__m_" + spec[2:])
            if spec.startswith("t."):
                return F.col(spec[2:])
            return F.col(spec)
        return spec

    out = hit.select(*[resolve(v).alias(k) for k, v in mapping.items()])
    missed = miss.select(*tcols)
    return {"joined": out, "missed": missed}


def master_check(
    master: DataFrame,
    tx: DataFrame,
    key: Sequence[str] | Sequence[tuple[str, str]],
    strategy: str = "auto",
) -> dict[str, DataFrame]:
    """@MasterCheck → ``{"found", "missed"}`` (existence only).

    Reference: runtime/.../fragment/user/join/MasterCheck.scala:22-31.
    Pure semi/anti joins — no master payload crosses the join, so Spark
    can use a bloom-ish broadcast existence probe; the big tx side never
    shuffles under broadcast strategy.
    """
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in key]
    m = _apply_strategy(master.select(*[p[0] for p in pairs]).dropDuplicates(), strategy)
    cond = None
    for mk, tk in pairs:
        c = m[mk] == tx[tk]
        cond = c if cond is None else (cond & c)
    return {
        "found": tx.join(m, on=cond, how="left_semi"),
        "missed": tx.join(m, on=cond, how="left_anti"),
    }


def master_branch(
    master: DataFrame,
    tx: DataFrame,
    key: Sequence[str] | Sequence[tuple[str, str]],
    router: Column | Callable[[DataFrame], Column],
    branches: Sequence[str],
    selection: MasterSelection | None = None,
    strategy: str = "auto",
) -> dict[str, DataFrame]:
    """@MasterBranch → N enum outputs routed by an expression over the
    joined (master, tx) record; null master IS allowed (the router sees
    null master columns — reference MasterBranch.scala:22-31).

    Master columns are visible to the router as ``__m_<name>``.
    Outputs contain the tx record (reference semantics: the branched
    record is the transaction).
    """
    joined, mcols, tcols = _join_selected(master, tx, key, selection, strategy)
    rcol = router(joined) if callable(router) else router
    tagged = joined.withColumn("__branch__", rcol)
    return {
        b: tagged.filter(F.col("__branch__") == F.lit(b)).select(*tcols) for b in branches
    }


def master_join_update(
    master: DataFrame,
    tx: DataFrame,
    key: Sequence[str] | Sequence[tuple[str, str]],
    updates: dict[str, Column | str],
    selection: MasterSelection | None = None,
    strategy: str = "auto",
) -> dict[str, DataFrame]:
    """@MasterJoinUpdate → ``{"updated", "missed"}``: mutate the tx
    record using its master (reference MasterJoinUpdate.scala:22-38).

    ``updates`` maps tx column → expression over the joined frame
    (master columns as ``__m_<name>`` or ``"m.col"`` strings).
    """
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in key]
    joined, mcols, tcols = _join_selected(master, tx, key, selection, strategy)
    hit, miss = _null_split(joined)

    def resolve(spec: Column | str) -> Column:
        if isinstance(spec, str):
            return F.col("__m_" + spec[2:]) if spec.startswith("m.") else F.col(spec)
        return spec

    upd = hit.withColumns({k: resolve(v) for k, v in updates.items()}).select(*tcols)
    return {"updated": upd, "missed": miss.select(*tcols)}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str] | Sequence[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tie_break: Sequence[str] = (),
) -> dict[str, DataFrame]:
    """As-of join: for each left row, the single right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (backward) or smallest ≥
    (forward), per key group.

    The reference expresses exactly this inside a ``@MasterSelection``
    method (SURVEY.md §2.4: range/as-of/theta predicates inside the
    group); here it is sugar over :func:`master_join`'s tx-dependent
    ``where`` path — join candidates, keep the best per left row via a
    single aggregation, no window sort in the all-asc case.

    ``key`` as in master_join ((right_col, left_col) pairs or shared
    names); ``tie_break``: right columns ordering equal-ts candidates
    deterministically (recommended — an unordered tie is
    planner-dependent).  Returns ``{"joined", "missed"}``.
    """
    if direction == "backward":
        where = F.col(f"__m_{right_ts}") <= F.col(left_ts)
        ts_dir = "desc"
    elif direction == "forward":
        where = F.col(f"__m_{right_ts}") >= F.col(left_ts)
        ts_dir = "asc"
    else:
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    ordering = [(right_ts, ts_dir)] + [(c, "asc") for c in tie_break]
    return master_join(
        right, left, key, selection=MasterSelection(ordering=ordering, where=where)
    )


def range_join(
    master: DataFrame,
    tx: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    key: Sequence[str] | Sequence[tuple[str, str]] = (),
    inclusive: str = "[)",
    selection_ordering: Ordering | None = None,
    strategy: str = "broadcast",
) -> dict[str, DataFrame]:
    """Range/band join: match each tx row to the master whose
    ``[lo_col, hi_col)`` interval contains ``value_col`` (optionally
    also equi-joined on ``key``).  ≤1 master per tx row — overlapping
    intervals resolve by ``selection_ordering`` (default: (lo, hi) asc).

    The reference expresses this inside @MasterSelection methods; here
    it is the tx-dependent ``where`` path.  Keyless band tables must be
    broadcast-small (nested-loop over the broadcast side — the classic
    dimension-band shape); with a ``key`` the range is evaluated within
    hash-join groups.  Returns ``{"joined", "missed"}``.
    """
    lo = F.col(f"__m_{lo_col}")
    hi = F.col(f"__m_{hi_col}")
    v = F.col(value_col)
    bounds = {
        "[)": (v >= lo) & (v < hi),
        "[]": (v >= lo) & (v <= hi),
        "()": (v > lo) & (v < hi),
        "(]": (v > lo) & (v <= hi),
    }
    if inclusive not in bounds:
        raise ValueError(f"range_join: inclusive must be one of {sorted(bounds)}")
    sel = MasterSelection(
        ordering=selection_ordering or [(lo_col, "asc"), (hi_col, "asc")],
        where=bounds[inclusive],
    )
    return master_join(master, tx, key, selection=sel, strategy=strategy)


def bloom_prefilter(
    master: DataFrame,
    tx: DataFrame,
    key: Sequence[str] | Sequence[tuple[str, str]],
    buckets: int = 1 << 22,
) -> DataFrame:
    """Approximate membership pre-filter for a selective join: drop tx
    rows whose key hash-bucket contains NO master key, BEFORE the
    exact join shuffles the fact.

    The middle ground the strategy picker lacks: a master too big to
    broadcast as ROWS but whose key fingerprint fits — e.g. 50M keys at
    100 TB don't broadcast, but their 4M-bucket hash bitmap does.  The
    filter is a k=1 Bloom filter built from Spark native pieces: hash
    master keys into ``pmod(xxhash64(keys), buckets)``, ``distinct``
    the bucket ids (≤ ``buckets`` rows ≈ 8 bytes each), broadcast that
    slim set, and LEFT-SEMI join the fact on its hashed key — whole-
    stage-codegen end to end, no Python, no UDF, and the fact is
    filtered at SCAN altitude so the expensive key shuffle moves only
    probable matches.

    EXACTNESS: false POSITIVES only (rate ≈ n_master_keys / buckets for
    distinct keys; size ``buckets`` ≥ ~8× expected keys).  The filtered
    tx is a superset of the join's hit set, so a subsequent
    ``master_join(...)["joined"]`` is byte-identical with or without
    the pre-filter.  The "missed" port is NOT preserved — rows dropped
    here are exactly (a superset of) the missed rows; compute misses
    against the unfiltered tx.

    Reference parity: the reference's broadcast decision is static
    (TINY ≤ 20 MiB, compiler/.../graph/BroadcastKind); this node covers
    the dimension-too-big-for-TINY case its shuffled path pays full
    price for.
    """
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in key]
    if not pairs:
        raise ValueError("bloom_prefilter: key must be non-empty")
    mkeys = [p[0] for p in pairs]
    tkeys = [p[1] for p in pairs]
    mbucket = F.pmod(F.xxhash64(*[F.col(c) for c in mkeys]), F.lit(buckets))
    tbucket = F.pmod(F.xxhash64(*[F.col(c) for c in tkeys]), F.lit(buckets))
    bucket_set = master.select(mbucket.alias("__bloom_bucket__")).distinct()
    return (
        tx.withColumn("__tb__", tbucket)
        .join(
            F.broadcast(bucket_set),
            F.col("__tb__") == F.col("__bloom_bucket__"),
            "left_semi",
        )
        .drop("__tb__")
    )
