from streamprocessing_spark.operators.core import (
    source_scan,
    filter_contains,
    project_columns,
    filter_equality_project,
    count_by_key,
    flatmap_tokens,
    repartition_by_key,
    dedup_by_id,
)

__all__ = [
    "source_scan",
    "filter_contains",
    "project_columns",
    "filter_equality_project",
    "count_by_key",
    "flatmap_tokens",
    "repartition_by_key",
    "dedup_by_id",
]
