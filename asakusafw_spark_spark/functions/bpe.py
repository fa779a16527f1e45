"""Distributed BPE tokenizer training + application — the canonical
100 TB tokenizer workload (Sennrich et al. 2016, the algorithm behind
GPT-2/LLaMA-family vocabularies).

Scale design: every training iteration runs on the WORD HISTOGRAM
(distinct word → count), never the corpus — the corpus is scanned
exactly once (`word_histogram`: explode → hash-agg, map-side
combinable).  Natural-language corpora have ~10⁶–10⁷ distinct words
regardless of corpus size, so the per-merge cost is independent of the
100 TB input.  The per-merge steps are

  1. `bpe_pair_counts` — adjacent-symbol pair frequencies weighted by
     word count: one native array transform + explode + hash-agg (no
     Python);
  2. argmax — `orderBy(...).limit(1)` = distributed
     TakeOrderedAndProject, a 1-row driver fetch per merge;
  3. merge application — a native `aggregate` (fold) over each word's
     symbol array, greedy left-to-right, still no Python.

The symbols column is persisted per round and the plan is truncated
with `localCheckpoint` every few merges, so a 32k-merge vocabulary
does not build a 32k-deep lineage.

`bpe_apply` (tokenizing the corpus with a trained table) is inherently
per-word iterative, so it is the honest Arrow-batched Pandas-UDF path
— with a per-batch word cache, natural text hits the cache for almost
every token (Zipf), so the per-doc cost is near the dict-lookup floor.

Determinism: pair counts are integers, the argmax tiebreak is total
(count desc, left asc, right asc), so the merge table is a pure
function of the corpus — `bpe_pair_counts` carries a strict DuckDB
value-hash oracle and `bpe_train` is pinned exactly against a
pure-Python reference in tests.

End-of-word marker: each word's symbol sequence is its characters plus
a trailing ``</w>`` (the paper's variant), so merges never cross word
boundaries and detokenization stays possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

__all__ = [
    "word_histogram",
    "initial_symbols",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_apply",
    "bpe_detokenize",
]

EOW = "</w>"


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE corpus scan → ``(word, wcount)``: whitespace tokens (same
    tokenizer as :func:`.text.vocab_top_k`), exact counts."""
    from .text import tokens

    # explode_outer: a plain explode's inferred size()>0 filter would
    # re-evaluate tokens() a second time; the existing != '' predicate
    # on the generated attribute already drops outer's null rows
    return (
        df.select(F.explode_outer(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def initial_symbols(word_col: str = "word") -> "F.Column":
    """word → [c1, c2, …, cn, '</w>'] (characters + end-of-word)."""
    chars = F.split(F.col(word_col), "")
    # Spark's split on '' yields chars with no trailing empty element
    return F.concat(chars, F.array(F.lit(EOW)))


def _sym_pairs(syms_col: str = "syms") -> "F.Column":
    """[(s_i, s_{i+1})] structs for one symbol array (native).

    zip_with over two slices, not transform-over-sequence: Spark's
    ``sequence(1, 0)`` yields the DESCENDING [1, 0] rather than an
    empty range, which indexes out of bounds for fully-merged
    single-symbol words; both slices are simply empty there."""
    s = syms_col
    return F.expr(
        f"zip_with(slice({s}, 1, size({s}) - 1), "
        f"slice({s}, 2, size({s}) - 1), "
        f"(l, r) -> struct(l AS left, r AS right))"
    )


def bpe_pair_counts(
    hist: DataFrame,
    syms_col: str = "syms",
    count_col: str = "wcount",
) -> DataFrame:
    """Adjacent-pair frequencies over a symbolized word histogram →
    ``(left, right, pair_count)``.  The BPE inner-loop statistic: one
    native transform+explode and one map-side-combined hash-agg."""
    # explode_outer + null-drop: a plain explode's inferred size()>0
    # filter would re-evaluate the zip_with a second time; fully-merged
    # single-symbol words have an empty pair array → one null row each
    return (
        hist.select(
            F.explode_outer(_sym_pairs(syms_col)).alias("p"),
            F.col(count_col).alias("__c__"),
        )
        .where(F.col("p").isNotNull())
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("__c__").alias("pair_count"))
    )


def _apply_merge(syms: "F.Column", left: str, right: str) -> "F.Column":
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — a native fold, parameterized via literals (corpus text may
    contain quotes; never string-format symbols into SQL)."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a corpus → DataFrame
    ``(merge_rank, left, right, merged)`` in training order.  Stops
    early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (weighted).  See the module docstring for
    the per-merge cost model; driver state is one 3-field row per
    merge."""
    if num_merges < 1:
        raise ValueError("bpe_train: num_merges must be >= 1")
    if min_pair_count < 1:
        raise ValueError("bpe_train: min_pair_count must be >= 1")
    spark = df.sparkSession
    hist = (
        word_histogram(df, text_col)
        .select(initial_symbols("word").alias("syms"), "wcount")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hist.count()

    merges: list[tuple[int, str, str, str]] = []
    for rank in range(num_merges):
        top = (
            bpe_pair_counts(hist)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((rank, left, right, left + right))
        new_hist = hist.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"), "wcount"
        )
        if (rank + 1) % checkpoint_every == 0:
            # truncate the fold-upon-fold plan — persist alone keeps
            # the full expression tree for the optimizer to re-chew
            new_hist = new_hist.localCheckpoint(eager=True)
        else:
            new_hist = new_hist.persist(StorageLevel.MEMORY_AND_DISK)
            new_hist.count()
        hist.unpersist()
        hist = new_hist

    hist.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, merged string"
    )


def bpe_apply(
    df: DataFrame,
    merges,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    max_merges: int = 1_000_000,
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge table → ``df`` plus
    ``out_col`` (array<string> of BPE symbols, end-of-word markers
    kept).  ``merges`` is the :func:`bpe_train` DataFrame or a list of
    ``(left, right)`` in rank order.

    The standard pair-priority algorithm per word (repeatedly merge the
    LOWEST-RANK pair present — equivalent to replaying training order),
    Arrow-batched with a per-batch word cache: Zipf makes the cache hit
    for almost every token, so throughput approaches dict lookups, not
    merge loops."""
    if isinstance(merges, DataFrame):
        n = merges.limit(max_merges + 1).count()
        if n > max_merges:
            raise ValueError(
                f"bpe_apply: merge table exceeds max_merges={max_merges}"
            )
        rows = merges.orderBy("merge_rank").collect()
        pairs = [(r["left"], r["right"]) for r in rows]
    else:
        pairs = [(l, r) for l, r in merges]
    rank_of = {p: i for i, p in enumerate(pairs)}

    def encode_word(word: str, cache: dict) -> list:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                rk = rank_of.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best, best_rank = i, rk
            if best is None:
                break
            l, r = pairs[best_rank]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    import pandas as pd
    import re

    # Same tokenizer as word_histogram/tokens(): Java regex \s+ is the
    # ASCII class [ \t\n\x0B\f\r] — Python's str.split() additionally
    # splits on Unicode whitespace (NBSP, U+2028, …), which would make a
    # word that was ONE unit at training time several units at apply
    # time, degrading it to character fallback.
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def run(batches):
        cache: dict = {}
        for pdf in batches:
            toks = []
            for t in pdf[text_col]:
                if t is None:
                    toks.append([])
                    continue
                row: list = []
                for w in _ws.split(str(t)):
                    if w:
                        row.extend(encode_word(w, cache))
                toks.append(row)
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(toks, index=pdf.index, dtype=object)
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )
    return df.mapInPandas(run, schema=schema)


def bpe_detokenize(
    df: DataFrame,
    tokens_col: str = "bpe_tokens",
    out_col: str = "text",
) -> DataFrame:
    """Inverse of :func:`bpe_apply`: BPE symbol array → whitespace-
    joined text (concatenate symbols, turn each ``</w>`` end-of-word
    marker into a space, trim).  Pure native expressions — one
    projection, no Python, no shuffle.  Exact roundtrip for any text
    whose words are whitespace-separated (the tokenizer's
    normalization: runs of whitespace collapse to single spaces)."""
    joined = F.array_join(F.col(tokens_col), "")
    text = F.trim(F.regexp_replace(joined, EOW, " "))
    return df.withColumn(out_col, text)
