from . import (  # noqa: F401
    count_values,
    dedup,
    enrich,
    incremental,
    merge,
    multimodal,
    normalize,
    preview,
    range_query,
    similarity,
    text_dedup,
)

__all__ = [
    "count_values", "dedup", "enrich", "incremental", "merge",
    "multimodal", "normalize", "preview", "range_query", "similarity",
    "text_dedup",
]
