from .filter_dsl import compile_filter, apply_query

__all__ = ["compile_filter", "apply_query"]
