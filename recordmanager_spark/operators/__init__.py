from . import (
    count_values,
    dedup,
    incremental,
    merge,
    range_query,
    similarity,
    text_dedup,
)

__all__ = [
    "count_values",
    "dedup",
    "incremental",
    "merge",
    "range_query",
    "similarity",
    "text_dedup",
]
