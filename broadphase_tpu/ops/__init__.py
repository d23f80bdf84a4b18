from . import u64  # noqa: F401
