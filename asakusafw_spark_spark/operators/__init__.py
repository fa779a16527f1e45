"""The operator vocabulary (SURVEY.md §2).

Core projections, record-kind ops, master/transaction joins, group ops —
plus Spark-native extensions (windows / top-k / distinct / set ops) the
reference lacks (SURVEY.md §2.8).
"""

from .core import (
    project,
    extend,
    restructure,
    checkpoint,
    confluent,
    snapshot_diff,
    scd2_apply,
    apply_agg_delta,
    unpivot,
    flatten_struct,
)
from .record import extract, update, convert, branch, split, logging_op
from .joins import (
    master_join,
    master_check,
    master_branch,
    master_join_update,
    asof_join,
    bloom_prefilter,
    range_join,
    MasterSelection,
)
from .group import (
    summarize,
    fold,
    cogroup,
    group_sort,
    Grouping,
    ansi_grouping_sets,
    rollup_agg,
    cube_agg,
)
from .view import group_view
from .window import (
    resample_timeseries,
    top_k_per_group,
    rank_in_group,
    distinct_records,
    running_agg,
    sessionize_batch,
)

__all__ = [
    "project",
    "snapshot_diff",
    "scd2_apply",
    "apply_agg_delta",
    "unpivot",
    "flatten_struct",
    "extend",
    "restructure",
    "checkpoint",
    "extract",
    "update",
    "convert",
    "branch",
    "split",
    "logging_op",
    "master_join",
    "master_check",
    "master_branch",
    "master_join_update",
    "asof_join",
    "bloom_prefilter",
    "range_join",
    "MasterSelection",
    "summarize",
    "ansi_grouping_sets",
    "rollup_agg",
    "cube_agg",
    "fold",
    "cogroup",
    "group_sort",
    "Grouping",
    "resample_timeseries",
    "top_k_per_group",
    "rank_in_group",
    "distinct_records",
    "confluent",
    "running_agg",
    "sessionize_batch",
    "group_view",
]
