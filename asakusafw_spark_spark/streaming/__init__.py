"""Structured-Streaming surface (beyond-reference capability, SURVEY.md
§2.8 — the reference's iterative extension re-runs *batches*; it has no
streaming)."""

from .stream import (
    stream_parquet_source,
    windowed_aggregate,
    sessionize,
    stream_dedup,
    stateful_running_agg,
    stream_interval_join,
    stream_to_direct_output,
    stream_merge_upsert,
    stream_dedup_ingest,
    stream_agg_maintain,
    stream_distinct_sketch_maintain,
    stream_freq_sketch_maintain,
    stream_quantile_sketch_maintain,
    stream_theta_sketch_maintain,
    stream_quality_monitor,
    run_available_now,
)

__all__ = [
    "stream_parquet_source",
    "windowed_aggregate",
    "sessionize",
    "stream_dedup",
    "stateful_running_agg",
    "stream_interval_join",
    "stream_to_direct_output",
    "stream_merge_upsert",
    "stream_dedup_ingest",
    "stream_agg_maintain",
    "stream_distinct_sketch_maintain",
    "stream_freq_sketch_maintain",
    "stream_quantile_sketch_maintain",
    "stream_theta_sketch_maintain",
    "stream_quality_monitor",
    "run_available_now",
]
