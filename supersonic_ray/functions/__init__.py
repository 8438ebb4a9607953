from . import expressions  # noqa: F401
