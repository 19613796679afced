"""High-level public API (counterpart of mgard::compress /
mgard_x::compress, include/compress.hpp:33-72 and
include/compress_x.hpp:31-178).

``compress`` takes a NumPy/JAX array and an error bound and returns a
self-describing byte buffer; ``decompress`` needs only the buffer.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from .config import Config, ErrorMode
from .io import format as fmt
from .models.compressor import get_compressor

__all__ = ["compress", "decompress"]


def compress(data, tolerance: float, s: float = math.inf,
             mode: str = "abs",
             coordinates: Optional[Sequence[np.ndarray]] = None,
             config: Optional[Config] = None) -> bytes:
    """Compress an N-D floating point array with a guaranteed error bound.

    Args:
      data: N-D float32/float64 array (NumPy or JAX).
      tolerance: error tolerance (absolute, or relative if mode="rel").
      s: smoothness parameter — ``math.inf`` bounds the L-infinity error,
         finite ``s`` bounds the s-norm (s=0 gives L2).
      mode: "abs" or "rel" (relative to the data's norm).
      coordinates: optional per-dimension node coordinates (nonuniform grid).
      config: codec configuration.
    """
    arr = np.asarray(data)
    if arr.dtype not in (np.float32, np.float64):
        raise TypeError("only float32/float64 data is supported")
    comp = get_compressor(arr.shape, arr.dtype, s=s,
                          coordinates=coordinates, config=config)
    emode = ErrorMode.REL if mode == "rel" else ErrorMode.ABS
    return comp.compress(arr, tolerance, mode=emode)


def decompress(buf: bytes) -> np.ndarray:
    """Decompress a self-describing buffer.

    Accepts both this framework's containers and reference-MGARD CPU
    buffers (magic ``MGARD``); all parameters are read from the header
    (reference compress_internal dispatch,
    include/compress_internal.hpp:28-60).
    """
    buf = bytes(buf)
    if buf[:8] != fmt.MAGIC and buf[:5] == b"MGARD":
        from .io import mgard_compat
        return mgard_compat.decompress_mgard(buf)
    header, sections = fmt.read_container(buf)
    if header.roi_block:
        from .models.roi import decompress_roi
        return decompress_roi(header, sections)
    comp = get_compressor(header.shape, header.dtype, s=header.s,
                          coordinates=header.coordinates)
    return comp.decompress_parsed(header, sections)
