"""Scalar + LLM-data-pipeline function surface.

The reference has NO scalar function library — scalar logic lives inside
opaque user Java methods (SURVEY.md §2.7/§2.8).  Our engine's scalar
surface IS ``pyspark.sql.functions`` (re-exported as ``F``); on top we
add the operators a large-scale training-data pipeline needs: text
analysis, dedup sketches (exact / MinHash-LSH / SimHash / n-gram
Jaccard), embedding similarity search, and multimodal column plumbing.
"""

from pyspark.sql import functions as F  # noqa: F401  (scalar surface)

from .text import (
    tokens,
    redact,
    extract_json,
    normalize_text,
    bm25_rank,
    build_text_index,
    search_text_index,
    vocab_top_k,
    tfidf,
    token_count,
    bpe_token_count,
    chunk_documents,
    lang_id,
    quality_score,
    quality_quantile_filter,
    fingerprint,
    corpus_stats,
)
from .dedup import (
    str_hash64,
    word_shingles,
    minhash_signature,
    dedup_exact,
    dedup_corpus,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_contamination,
    simhash,
    simhash_dup_groups,
    simhash_pairs,
    dup_clusters,
    scrub_duplicate_spans,
    build_dedup_index,
    dedup_against_corpus,
)
from .similarity import (
    cosine_similarity,
    brute_force_topk,
    cosine_near_dup,
    lsh_ann_topk,
    ivf_topk,
    label_centroids,
    quantize_embeddings,
    quantized_topk,
)
from .text import repetition_signals, word_ngrams
from .text import bigram_lm_score
from .sampling import (
    unit_hash,
    hash_sample,
    sample_exact_n,
    assign_split,
    assign_shards,
    export_shards,
    mix_corpus,
    pack_sequences,
    materialize_packs,
    cap_per_group,
)
from .stats import winsorize, quantile_bucket, analyze_table, heavy_hitters
from .events import funnel, retention
from .quality import (
    check_constraints,
    assert_constraints,
    k_anonymity_report,
    suppress_rare_groups,
)
from .multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
    fake_decoder,
)
from .png_codec import (
    encode_png,
    decode_png,
    png_resizer,
    png_feature_decoder,
)

__all__ = [
    "analyze_table",
    "bigram_lm_score",
    "check_constraints",
    "k_anonymity_report",
    "suppress_rare_groups",
    "assert_constraints",
    "F",
    "tokens",
    "token_count",
    "bpe_token_count",
    "chunk_documents",
    "corpus_stats",
    "lang_id",
    "quality_score",
    "quality_quantile_filter",
    "redact",
    "extract_json",
    "normalize_text",
    "bm25_rank",
    "build_text_index",
    "search_text_index",
    "vocab_top_k",
    "tfidf",
    "fingerprint",
    "str_hash64",
    "word_shingles",
    "minhash_signature",
    "dedup_exact",
    "dedup_corpus",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ngram_contamination",
    "simhash",
    "simhash_dup_groups",
    "simhash_pairs",
    "dup_clusters",
    "scrub_duplicate_spans",
    "build_dedup_index",
    "dedup_against_corpus",
    "repetition_signals",
    "word_ngrams",
    "cosine_similarity",
    "brute_force_topk",
    "cosine_near_dup",
    "lsh_ann_topk",
    "ivf_topk",
    "label_centroids",
    "quantize_embeddings",
    "quantized_topk",
    "unit_hash",
    "hash_sample",
    "sample_exact_n",
    "heavy_hitters",
    "assign_split",
    "assign_shards",
    "export_shards",
    "mix_corpus",
    "pack_sequences",
    "materialize_packs",
    "cap_per_group",
    "winsorize",
    "quantile_bucket",
    "funnel",
    "retention",
    "MEDIA_SCHEMA",
    "extract_features",
    "resize_images",
    "sample_frames",
    "fake_decoder",
    "encode_png",
    "decode_png",
    "png_resizer",
    "png_feature_decoder",
]
