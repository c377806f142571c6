from .registry import load_table  # noqa: F401
