from .rollup import RollupManager  # noqa: F401
