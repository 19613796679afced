"""High-level public API (counterpart of mgard::compress /
mgard_x::compress, include/compress.hpp:33-72 and
include/compress_x.hpp:31-178).

``compress`` takes a NumPy/JAX array and an error bound and returns a
self-describing byte buffer; ``decompress`` needs only the buffer.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import numpy as np

from .config import Config, ErrorMode
from .io import format as fmt
from .models.compressor import get_compressor

__all__ = ["compress", "decompress", "release_cache",
           "estimate_memory_footprint"]


def release_cache():
    """Drop cached compressors and their compiled executables (reference
    mgard_x::release_cache, include/compress_x.hpp:159-166)."""
    from .models.compressor import _cached_compressor
    _cached_compressor.cache_clear()


def estimate_memory_footprint(shape, dtype=np.float32) -> int:
    """Rough device-memory bytes needed to compress an array of this
    shape (reference Compressor::EstimateMemoryFootprint).  The pipeline
    holds ~2 float copies (pyramid + blocks), one int32 stream, the padded
    bitplane layout and the condense buffer."""
    n = int(np.prod([int(s) for s in shape]))
    item = np.dtype(dtype).itemsize
    return int(n * (2.3 * item + 4 * 3.2))


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
    emode = ErrorMode.REL if mode == "rel" else ErrorMode.ABS
    cfg = config or Config()
    if arr.nbytes > cfg.max_block_bytes:
        return _compress_multiblock(arr, tolerance, s, emode, coordinates,
                                    cfg)
    comp = get_compressor(arr.shape, arr.dtype, s=s,
                          coordinates=coordinates, config=cfg)
    return comp.compress(arr, tolerance, mode=emode)


def _block_edges(n: int, nblocks: int) -> np.ndarray:
    return np.linspace(0, n, nblocks + 1).astype(int)


# In-flight device blocks during the multiblock pipeline (the reference
# GPU pipeline rotates 3 queues, GPUPipelines.hpp:93; JAX's async
# dispatch plays the queue role, this caps device-resident working sets).
_PIPELINE_DEPTH = int(os.environ.get("MGARD_TPU_PIPELINE_DEPTH", "2"))


def _block_coords(coordinates, dd_dim, lo, hi):
    if coordinates is None:
        return None
    bcoords = [np.asarray(c) for c in coordinates]
    bcoords[dd_dim] = bcoords[dd_dim][lo:hi]
    return bcoords


def _compress_multiblock(arr, tolerance, s, emode, coordinates, cfg):
    """Domain-decomposed compression (reference DomainDecomposer +
    general_compress, include/mgard-x/CompressionHighLevel/
    CompressionHighLevel.hpp:47-290): split the largest dim into slabs,
    split the error budget so the global bound holds
    (ErrorToleranceCalculator.hpp:135-154), and PIPELINE the blocks —
    block i+1's device encode is dispatched before block i's host
    readback/assembly, so host and device work overlap (the reference's
    3-queue prefetch rotation, GPUPipelines.hpp:93)."""
    import math as _math
    from collections import deque

    from .parallel.domain import local_abs_tol

    dd_dim = int(np.argmax(arr.shape))
    nblocks = int(-(-arr.nbytes // cfg.max_block_bytes))
    edges = _block_edges(arr.shape[dd_dim], nblocks)

    abs_tol = float(tolerance)
    norm = 1.0
    if emode == ErrorMode.REL:
        norm = (float(np.abs(arr).max()) if _math.isinf(s)
                else float(np.sqrt(np.sum(arr.astype(np.float64) ** 2))))
        abs_tol *= norm
    block_tol = local_abs_tol(abs_tol, s, nblocks)

    # One lossless id for the whole container: resolve the adaptive
    # small-domain choice on block 0's shape, then pin it.
    shape0 = list(arr.shape)
    shape0[dd_dim] = int(edges[1] - edges[0])
    probe = get_compressor(tuple(shape0), arr.dtype, s=s,
                           coordinates=_block_coords(coordinates, dd_dim,
                                                     edges[0], edges[1]),
                           config=cfg)
    bcfg = cfg.replace(lossless=probe.lossless, adapt_lossless=False)
    lossless = int(probe.lossless)

    sections = []
    pending = deque()

    def drain_one():
        comp_i, handle = pending.popleft()
        sections.extend(comp_i.finalize_sections(handle))

    for i in range(nblocks):
        sl = [slice(None)] * arr.ndim
        sl[dd_dim] = slice(edges[i], edges[i + 1])
        block = np.ascontiguousarray(arr[tuple(sl)])
        bcoords = _block_coords(coordinates, dd_dim, edges[i], edges[i + 1])
        comp = get_compressor(block.shape, arr.dtype, s=s,
                              coordinates=bcoords, config=bcfg)
        pending.append((comp, comp.encode_async(block, block_tol)))
        if len(pending) >= _PIPELINE_DEPTH:
            drain_one()
    while pending:
        drain_one()

    from .config import Decomposition
    dec_wire = (1 + max(1, int(cfg.num_local_levels))
                if cfg.decomposition == Decomposition.HYBRID
                else int(cfg.decomposition))
    header = fmt.Header(
        dtype=arr.dtype, shape=arr.shape,
        uniform=coordinates is None,
        coordinates=None if coordinates is None else [
            np.asarray(c) for c in coordinates],
        error_mode=int(emode), s=float(s), tolerance=block_tol,
        norm=norm, lossless=lossless, n_levels=0,
        section_sizes=(), dd_dim=dd_dim, dd_nblocks=nblocks,
        decomposition=dec_wire, layout=int(cfg.layout))
    return fmt.write_container(header, sections)


def _decompress_multiblock(header: fmt.Header, sections) -> np.ndarray:
    """Pipelined mirror of :func:`_compress_multiblock`: block i+1's
    device decode is dispatched before block i's host readback."""
    import dataclasses
    from collections import deque

    edges = _block_edges(header.shape[header.dd_dim], header.dd_nblocks)
    per_block = len(sections) // header.dd_nblocks
    bcfg = _config_from_header(header)
    outs = []
    pending = deque()
    for i in range(header.dd_nblocks):
        bshape = list(header.shape)
        bshape[header.dd_dim] = int(edges[i + 1] - edges[i])
        bcoords = _block_coords(header.coordinates, header.dd_dim,
                                edges[i], edges[i + 1])
        comp = get_compressor(tuple(bshape), header.dtype, s=header.s,
                              coordinates=bcoords, config=bcfg)
        bh = dataclasses.replace(header, shape=tuple(bshape),
                                 coordinates=bcoords, dd_nblocks=0,
                                 section_sizes=())
        pending.append(comp.decode_async(
            bh, sections[per_block * i:per_block * (i + 1)]))
        if len(pending) >= _PIPELINE_DEPTH:
            outs.append(np.asarray(pending.popleft()))
    while pending:
        outs.append(np.asarray(pending.popleft()))
    return np.concatenate(outs, axis=header.dd_dim)


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
    if header.dd_nblocks:
        return _decompress_multiblock(header, sections)
    if header.roi_block:
        from .models.roi import decompress_roi
        return decompress_roi(header, sections)
    cfg = _config_from_header(header)
    comp = get_compressor(header.shape, header.dtype, s=header.s,
                          coordinates=header.coordinates, config=cfg)
    return comp.decompress_parsed(header, sections)


def _config_from_header(header: fmt.Header) -> Config:
    """Decode the wire decomposition byte: values >= 2 encode HYBRID
    with 1 + num_local_levels (config.py)."""
    from .config import Decomposition, Layout
    if header.decomposition >= 2:
        return Config(decomposition=Decomposition.HYBRID,
                      num_local_levels=header.decomposition - 1,
                      layout=Layout(header.layout))
    return Config(decomposition=Decomposition(header.decomposition),
                  layout=Layout(header.layout))
