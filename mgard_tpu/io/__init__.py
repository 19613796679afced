from . import format  # noqa: F401
