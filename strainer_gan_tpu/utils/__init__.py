from .trees import param_count, tree_bytes, dtype_summary, finite_check  # noqa: F401
