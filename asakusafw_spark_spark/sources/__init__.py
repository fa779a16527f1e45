"""Direct I/O surface (SURVEY.md §2.5): sources, sinks, pattern-generated
grouped outputs, and a multi-dataset two-phase commit."""

from .read import (
    hadoop_input,
    hadoop_input_newapi,
    direct_input,
    direct_input_fixed_width,
    read_parquet,
)
from .pattern import OutputPattern
from .write import (
    hadoop_output_newapi,
    expire_partitions,
    write_flat,
    write_grouped,
    write_bucketed,
    TransactionalOutput,
    merge_upsert,
    recover_merge,
    compact_files,
    write_zordered,
    dataset_manifest,
)

__all__ = [
    "direct_input",
    "direct_input_fixed_width",
    "hadoop_input",
    "hadoop_input_newapi",
    "hadoop_output_newapi",
    "expire_partitions",
    "read_parquet",
    "OutputPattern",
    "write_flat",
    "write_bucketed",
    "write_grouped",
    "TransactionalOutput",
    "merge_upsert",
    "recover_merge",
    "compact_files",
    "write_zordered",
    "dataset_manifest",
]
