from . import transform, tridiag, quantize, bitplane  # noqa: F401
