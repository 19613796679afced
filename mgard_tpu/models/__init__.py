from .compressor import Compressor  # noqa: F401
