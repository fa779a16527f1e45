"""Distributed BPE (functions/bpe.py): the paper's canonical merges,
exact-match property vs a pure-Python reference trainer, encoder/
trainer self-consistency, and guard honesty."""

import random

import pytest
from pyspark.sql import functions as F

from asakusafw_spark_spark.functions import bpe_apply, bpe_train

EOW = "</w>"


def bpe_train_py(texts, num_merges, min_pair_count=2):
    """Pure-Python reference of the module's spec: word histogram →
    per-merge (weighted pair counts, argmax with count-desc/left-asc/
    right-asc tiebreak, greedy left-to-right merge)."""
    hist = {}
    for t in texts:
        for w in (t or "").split():
            hist[w] = hist.get(w, 0) + 1
    syms = {w: tuple(list(w) + [EOW]) for w in hist}
    merges = []
    for _ in range(num_merges):
        pc = {}
        for w, c in hist.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_pair_count:
            break
        (l, r), _ = best
        merges.append((l, r))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges, syms


def test_bpe_paper_merges(spark):
    """Sennrich et al.'s worked example: {low x5, lower x2, newest x6,
    widest x3} — first merges must be (e,s), (es,t), (est,</w>) in that
    order (the famous 'es' from newest+widest)."""
    text = ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    m = bpe_train(df, num_merges=5)
    got = [(r.left, r.right) for r in m.orderBy("merge_rank").collect()]
    assert got[:3] == [("e", "s"), ("es", "t"), ("est", EOW)]
    assert m.orderBy("merge_rank").collect()[0].merged == "es"


def test_bpe_train_property_exact_match(spark):
    """Random word-salad corpora (repeats guaranteed by a tiny
    alphabet): Spark merge table == pure-Python reference EXACTLY —
    integer counts + total tiebreak leave zero engine freedom.  Seeded
    sweep instead of hypothesis: each trial costs a Spark train loop."""
    for seed, n_docs, n_merges in [(11, 4, 6), (12, 8, 10), (13, 2, 12)]:
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randrange(1, 5)))
            for _ in range(12)
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randrange(3, 15)))
            for _ in range(n_docs)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = [
            (r.left, r.right)
            for r in bpe_train(df, num_merges=n_merges, checkpoint_every=3)
            .orderBy("merge_rank")
            .collect()
        ]
        want, _ = bpe_train_py(texts, n_merges)
        assert got == want, (seed, got, want)


def test_bpe_apply_matches_training_state(spark):
    """Encoder/trainer consistency: applying the learned table to the
    training corpus reproduces, word for word, the trainer's final
    symbol state (pair-priority replay == training-order replay)."""
    texts = ["the cat sat on the mat", "the cat ate the rat", "a cat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    m = bpe_train(df, num_merges=8)
    want_merges, want_syms = bpe_train_py(texts, 8)
    assert [(r.left, r.right) for r in m.orderBy("merge_rank").collect()] \
        == want_merges

    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(df, m).select("doc_id", "bpe_tokens").collect()
    }
    for i, t in enumerate(texts):
        want = [s for w in t.split() for s in want_syms[w]]
        assert out[i] == want, (i, out[i], want)


def test_bpe_apply_edge_cases(spark):
    """Unseen words fall back toward characters; empty/null/whitespace
    text → empty token array; list-of-pairs merges accepted."""
    df = spark.createDataFrame(
        [(1, "zzzz"), (2, ""), (3, None), (4, "   ")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(df, [("z", "z")]).collect()
    }
    assert out[1] == ["zz", "zz", EOW]  # greedy left-to-right, no overlap
    assert out[2] == [] and out[3] == [] and out[4] == []


def test_bpe_guards(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train(df, num_merges=0)
    with pytest.raises(ValueError, match="min_pair_count"):
        bpe_train(df, num_merges=1, min_pair_count=0)
    big = spark.createDataFrame(
        [(i, chr(97 + i % 26), chr(97 + (i + 1) % 26), "x")
         for i in range(5)],
        ["merge_rank", "left", "right", "merged"],
    )
    with pytest.raises(ValueError, match="max_merges"):
        bpe_apply(df, big, max_merges=3)


def test_bpe_early_stop(spark):
    """min_pair_count binds: a corpus where every pair occurs once
    yields zero merges (and an empty, correctly-typed table)."""
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    m = bpe_train(df, num_merges=10, min_pair_count=2)
    assert m.count() == 0
    assert [f.name for f in m.schema.fields] \
        == ["merge_rank", "left", "right", "merged"]


def test_bpe_detokenize_roundtrip(spark):
    """apply → detokenize reproduces the whitespace-normalized text
    exactly (for ANY merge table — segmentation never loses bytes),
    via pure native expressions."""
    from asakusafw_spark_spark.functions import bpe_detokenize

    texts = ["the cat  sat ", "lowest newest", "", None, "  "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    m = bpe_train(df.where(F.col("text").isNotNull()), num_merges=6)
    out = {
        r.doc_id: r.rt
        for r in bpe_detokenize(
            bpe_apply(df, m), out_col="rt"
        ).select("doc_id", "rt").collect()
    }
    assert out[0] == "the cat sat"   # whitespace normalized
    assert out[1] == "lowest newest"
    assert out[2] == "" and out[3] == "" and out[4] == ""


def test_bpe_apply_unicode_whitespace_matches_training(spark):
    """NBSP (and other non-ASCII Unicode whitespace) is NOT a token
    separator for the training tokenizer (Java regex \\s+ = ASCII
    class); the encoder must split identically or such words silently
    degrade to character fallback (ADVICE r09)."""
    from asakusafw_spark_spark.functions.bpe import word_histogram

    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    hist = {(r.word, r.wcount) for r in word_histogram(df).collect()}
    assert hist == {("a b", 2)}  # ONE word at training time
    out = bpe_apply(df, [("a", " ")]).collect()[0].bpe_tokens
    # one word per occurrence — the merge straddling the NBSP applies
    assert out == ["a ", "b", EOW, "a ", "b", EOW]


def test_pinned_merge_table_matches_training_output(spark):
    """__spark_entry__._BPE_PINNED_MERGES is documented as the EXACT
    bpe_train(documents@sf0.01, num_merges=24) output.  Assert that
    equality so the literal cannot silently drift from what training
    produces (the bpe_tokenize oracle stays self-consistently green
    either way, since both engines apply the same literal — this test
    is the only thing tying it back to the trainer; ADVICE r10)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __spark_entry__ import _BPE_PINNED_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    trained = [
        (r.left, r.right)
        for r in bpe_train(docs, num_merges=24).orderBy("merge_rank").collect()
    ]
    assert trained == _BPE_PINNED_MERGES
