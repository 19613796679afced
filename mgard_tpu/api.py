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
           "estimate_memory_footprint", "adjust_shape", "plan_blocks"]


def release_cache():
    """Drop cached compressors and their compiled executables (reference
    mgard_x::release_cache, include/compress_x.hpp:159-166)."""
    from .models.compressor import _cached_compressor
    _cached_compressor.cache_clear()


def estimate_memory_footprint(shape, dtype=np.float32) -> int:
    """Device-memory bytes needed to compress an array of this shape
    (reference Compressor::EstimateMemoryFootprint).

    Validated against XLA's compile-time memory analysis of the default
    encode executable (temp + args + outputs): measured 3.90x input
    bytes at 512^3 f32, 3.75x at 256^3 (see test_footprint.py, which
    re-checks the constant against memory_analysis()).  The composition:
    input (1x), pyramid levels (~8/7 x), the scaled PYRAMID stream +
    zigzag chunks (~2 x 8/7 x), and the condense capacity buffer
    (33/32 x 8/7 x), plus small per-level temporaries.  A 1.15 safety
    factor covers fragmentation and scheduling overlap.
    """
    n = int(np.prod([int(s) for s in shape]))
    item = np.dtype(dtype).itemsize
    return int(n * item * 3.9 * 1.15) + (32 << 20)


def _device_memory_budget() -> int:
    """Usable device-memory bytes (reference
    DeviceRuntime::GetAvailableMemory).  Falls back to 12 GB (a v5e
    chip's practical HBM budget) when the backend exposes no stats —
    e.g. the tunneled TPU or the CPU test backend."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        if limit:
            return int(limit - stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return 12 << 30


def plan_blocks(shape, dtype, cfg: Config) -> int:
    """Number of domain-decomposition slabs (reference
    DomainDecomposer::need_domain_decomposition +
    num_subdomains sizing, DomainDecomposer.hpp:72-89): split when the
    estimated footprint exceeds the available device memory (or the
    configured cap), sized so every slab fits."""
    nbytes = int(np.prod([int(x) for x in shape])) * np.dtype(dtype).itemsize
    budget = cfg.max_memory_footprint or _device_memory_budget()
    est = estimate_memory_footprint(shape, dtype)
    nb = 1
    if est > budget:
        # footprint scales ~linearly with elements; add slabs until the
        # per-slab estimate fits
        nb = max(2, int(-(-est // budget)))
    nb = max(nb, int(-(-nbytes // cfg.max_block_bytes)))
    return min(nb, int(shape[int(np.argmax(shape))]))


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
    orig_shape = None
    if cfg.adjust_shape and coordinates is None:
        new_shape = adjust_shape(arr.shape)
        if new_shape != arr.shape:
            orig_shape = arr.shape
            arr = arr.reshape(new_shape)
    if cfg.dd_method == "block":
        grid = tuple(1 if s_ == 1 else max(1, -(-s_ // cfg.block_edge))
                     for s_ in arr.shape)
        if int(np.prod(grid)) > 1:
            buf = _compress_blocknd(arr, tolerance, s, emode, coordinates,
                                    cfg, grid)
            return _finish_adjust(buf, orig_shape)
    if cfg.dd_sizes is not None:
        sizes = [int(x) for x in cfg.dd_sizes]
        if sum(sizes) != arr.shape[cfg.dd_dim]:
            raise ValueError("dd_sizes must sum to the dd_dim extent")
        edges = np.concatenate([[0], np.cumsum(sizes)]).astype(int)
        buf = _compress_multiblock(arr, tolerance, s, emode, coordinates,
                                   cfg, len(sizes), dd_dim=cfg.dd_dim,
                                   edges=edges)
        return _finish_adjust(buf, orig_shape)
    nblocks = plan_blocks(arr.shape, arr.dtype, cfg)
    if nblocks > 1:
        buf = _compress_multiblock(arr, tolerance, s, emode, coordinates,
                                   cfg, nblocks)
    else:
        comp = get_compressor(arr.shape, arr.dtype, s=s,
                              coordinates=coordinates, config=cfg)
        buf = comp.compress(arr, tolerance, mode=emode)
    return _finish_adjust(buf, orig_shape)


def _finish_adjust(buf, orig_shape):
    if orig_shape is not None:
        import dataclasses
        header, sections = fmt.read_container(buf)
        header = dataclasses.replace(header, orig_shape=orig_shape)
        buf = fmt.write_container(header, sections)
    return buf


def adjust_shape(shape) -> tuple:
    """Rebalance a lopsided shape by redistributing the largest dim's
    prime factors onto the smallest dims (reference
    ShapeAdjustment.hpp:43-77, config.adjust_shape).  Total element
    count (and row-major byte order) is unchanged — the grid is merely
    reinterpreted, which helps compression of flattened/stacked data."""
    shape = [int(x) for x in shape]
    max_d = int(np.argmax(shape))
    n = shape[max_d]
    factors = []
    z = 2
    while z * z <= n:
        if n % z == 0:
            factors.append(z)
            n //= z
        else:
            z += 1
    if n > 1:
        factors.append(n)
    shape[max_d] = 1
    for f in reversed(factors):
        min_d = int(np.argmin(shape))
        shape[min_d] *= f
    return tuple(shape)


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


def _compress_multiblock(arr, tolerance, s, emode, coordinates, cfg,
                         nblocks, dd_dim=None, edges=None):
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

    if dd_dim is None:
        dd_dim = int(np.argmax(arr.shape))
    if edges is None:
        edges = _block_edges(arr.shape[dd_dim], nblocks)
        dd_edges = None
    else:
        dd_edges = tuple(int(x) for x in edges)

    import jax

    devices = jax.local_devices()
    ndev = max(1, len(devices))

    def _dev(i):
        return devices[i % ndev] if ndev > 1 else None

    abs_tol = float(tolerance)
    norm = 1.0
    if emode == ErrorMode.REL:
        # Norm over subdomains ON DEVICE (reference computes REL norms
        # per-subdomain on device too, CompressionHighLevel.hpp:122-136)
        # — a host-side np.abs(arr).max() on a multi-GB array defeats
        # the purpose of domain decomposition.  Blocks cycle over the
        # local devices; partial results combine on host.
        partials = []
        for i in range(nblocks):
            sl = [slice(None)] * arr.ndim
            sl[dd_dim] = slice(edges[i], edges[i + 1])
            blk = np.ascontiguousarray(arr[tuple(sl)])
            bj = jax.device_put(blk, _dev(i))
            comp_n = get_compressor(blk.shape, arr.dtype, s=s,
                                    coordinates=_block_coords(
                                        coordinates, dd_dim,
                                        edges[i], edges[i + 1]),
                                    config=cfg)
            partials.append(comp_n._norm(bj))
        vals = [float(p) for p in partials]
        norm = (max(vals) if _math.isinf(s)
                else float(np.sqrt(np.sum(np.square(vals)))))
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

    # MPMD multi-device dispatch: blocks cycle over the local devices
    # (heterogeneous Variable-edge blocks get per-shape compiled
    # pipelines — the inhomogeneous counterpart of the SPMD shard_map
    # path in parallel/sharded.py).  jit executes on its input's
    # device, so placement alone spreads the work; the pipeline depth
    # widens to keep every device busy.
    depth = max(_PIPELINE_DEPTH, ndev + 1)
    for i in range(nblocks):
        sl = [slice(None)] * arr.ndim
        sl[dd_dim] = slice(edges[i], edges[i + 1])
        block = np.ascontiguousarray(arr[tuple(sl)])
        bj = jax.device_put(block, _dev(i))
        bcoords = _block_coords(coordinates, dd_dim, edges[i], edges[i + 1])
        comp = get_compressor(block.shape, arr.dtype, s=s,
                              coordinates=bcoords, config=bcfg)
        pending.append((comp, comp.encode_async(bj, block_tol)))
        if len(pending) >= depth:
            drain_one()
    while pending:
        drain_one()

    from .config import Decomposition
    dec_wire = (1 + max(1, int(cfg.num_local_levels))
                if cfg.decomposition == Decomposition.HYBRID
                else int(cfg.decomposition))
    header = fmt.Header(
        chunk_groups=probe.chunk_groups,
        dtype=arr.dtype, shape=arr.shape,
        uniform=coordinates is None,
        coordinates=None if coordinates is None else [
            np.asarray(c) for c in coordinates],
        error_mode=int(emode), s=float(s), tolerance=block_tol,
        norm=norm, lossless=lossless, n_levels=0,
        section_sizes=(), dd_dim=dd_dim, dd_nblocks=nblocks,
        dd_edges=dd_edges,
        decomposition=dec_wire, layout=int(cfg.layout))
    return fmt.write_container(header, sections)


def _blocknd_coords(coordinates, origin, bshape):
    if coordinates is None:
        return None
    return [np.asarray(c)[o:o + n]
            for c, o, n in zip(coordinates, origin, bshape)]


def _compress_blocknd(arr, tolerance, s, emode, coordinates, cfg, grid):
    """Block (N-D) domain decomposition (reference
    domain_decomposition_type::Block, DomainDecomposer.hpp:91-170):
    uniform N-D blocks in raster order, per-block hierarchies, the
    s-norm error budget split across ALL blocks
    (ErrorToleranceCalculator.hpp:135-154), blocks cycled over local
    devices with the same pipelined dispatch as the slab path."""
    import math as _math
    from collections import deque

    import jax

    from .parallel.domain import block_grid_blocks, local_abs_tol

    blocks = block_grid_blocks(arr.shape, grid)
    nblocks = len(blocks)
    devices = jax.local_devices()
    ndev = max(1, len(devices))

    def _dev(i):
        return devices[i % ndev] if ndev > 1 else None

    def _slices(origin, bshape):
        return tuple(slice(o, o + n) for o, n in zip(origin, bshape))

    abs_tol = float(tolerance)
    norm = 1.0
    if emode == ErrorMode.REL:
        partials = []
        for i, (origin, bshape) in enumerate(blocks):
            blk = np.ascontiguousarray(arr[_slices(origin, bshape)])
            comp_n = get_compressor(
                bshape, arr.dtype, s=s,
                coordinates=_blocknd_coords(coordinates, origin, bshape),
                config=cfg)
            partials.append(comp_n._norm(jax.device_put(blk, _dev(i))))
        vals = [float(p) for p in partials]
        norm = (max(vals) if _math.isinf(s)
                else float(np.sqrt(np.sum(np.square(vals)))))
        abs_tol *= norm
    block_tol = local_abs_tol(abs_tol, s, nblocks)

    origin0, bshape0 = blocks[0]
    probe = get_compressor(
        bshape0, arr.dtype, s=s,
        coordinates=_blocknd_coords(coordinates, origin0, bshape0),
        config=cfg)
    bcfg = cfg.replace(lossless=probe.lossless, adapt_lossless=False)
    lossless = int(probe.lossless)

    sections = []
    pending = deque()

    def drain_one():
        comp_i, handle = pending.popleft()
        sections.extend(comp_i.finalize_sections(handle))

    depth = max(_PIPELINE_DEPTH, ndev + 1)
    for i, (origin, bshape) in enumerate(blocks):
        blk = np.ascontiguousarray(arr[_slices(origin, bshape)])
        comp = get_compressor(
            bshape, arr.dtype, s=s,
            coordinates=_blocknd_coords(coordinates, origin, bshape),
            config=bcfg)
        pending.append((comp, comp.encode_async(
            jax.device_put(blk, _dev(i)), block_tol)))
        if len(pending) >= depth:
            drain_one()
    while pending:
        drain_one()

    from .config import Decomposition
    dec_wire = (1 + max(1, int(cfg.num_local_levels))
                if cfg.decomposition == Decomposition.HYBRID
                else int(cfg.decomposition))
    header = fmt.Header(
        chunk_groups=probe.chunk_groups,
        dtype=arr.dtype, shape=arr.shape,
        uniform=coordinates is None,
        coordinates=None if coordinates is None else [
            np.asarray(c) for c in coordinates],
        error_mode=int(emode), s=float(s), tolerance=block_tol,
        norm=norm, lossless=lossless, n_levels=0,
        section_sizes=(), dd_nblocks=nblocks, dd_grid=tuple(grid),
        decomposition=dec_wire, layout=int(cfg.layout))
    return fmt.write_container(header, sections)


def _decompress_blocknd(header: fmt.Header, sections,
                        chunk_groups: int = 0) -> np.ndarray:
    """Mirror of :func:`_compress_blocknd`."""
    import dataclasses
    from collections import deque

    import jax

    from .parallel.domain import block_grid_blocks

    blocks = block_grid_blocks(header.shape, header.dd_grid)
    if len(sections) % len(blocks):
        raise ValueError(
            f"block container holds {len(sections)} sections, not a "
            f"multiple of its {len(blocks)} blocks")
    per_block = len(sections) // len(blocks)
    bcfg = _config_from_header(header)
    devices = jax.local_devices()
    ndev = max(1, len(devices))
    depth = max(_PIPELINE_DEPTH, ndev + 1)
    out = np.empty(header.shape, dtype=header.dtype)
    pending = deque()

    def drain_one():
        origin, bshape, h = pending.popleft()
        sl = tuple(slice(o, o + n) for o, n in zip(origin, bshape))
        out[sl] = np.asarray(h)

    for i, (origin, bshape) in enumerate(blocks):
        bcoords = _blocknd_coords(header.coordinates, origin, bshape)
        comp = get_compressor(bshape, header.dtype, s=header.s,
                              coordinates=bcoords, config=bcfg,
                              chunk_groups=chunk_groups)
        bh = dataclasses.replace(header, shape=bshape, coordinates=bcoords,
                                 dd_nblocks=0, dd_grid=None,
                                 section_sizes=())
        secs = sections[per_block * i:per_block * (i + 1)]
        if ndev > 1:
            with jax.default_device(devices[i % ndev]):
                pending.append((origin, bshape,
                                comp.decode_async(bh, secs)))
        else:
            pending.append((origin, bshape, comp.decode_async(bh, secs)))
        if len(pending) >= depth:
            drain_one()
    while pending:
        drain_one()
    return out


def _decompress_multiblock(header: fmt.Header, sections,
                           chunk_groups: int = 0) -> np.ndarray:
    """Pipelined mirror of :func:`_compress_multiblock`: block i+1's
    device decode is dispatched before block i's host readback."""
    import dataclasses
    from collections import deque

    import jax

    edges = (np.asarray(header.dd_edges, dtype=int)
             if header.dd_edges is not None else
             _block_edges(header.shape[header.dd_dim], header.dd_nblocks))
    if len(sections) % header.dd_nblocks:
        raise ValueError(
            f"multiblock container holds {len(sections)} sections, not a "
            f"multiple of its {header.dd_nblocks} blocks")
    per_block = len(sections) // header.dd_nblocks
    bcfg = _config_from_header(header)
    devices = jax.local_devices()
    ndev = max(1, len(devices))
    depth = max(_PIPELINE_DEPTH, ndev + 1)
    outs = []
    pending = deque()
    for i in range(header.dd_nblocks):
        bshape = list(header.shape)
        bshape[header.dd_dim] = int(edges[i + 1] - edges[i])
        bcoords = _block_coords(header.coordinates, header.dd_dim,
                                edges[i], edges[i + 1])
        comp = get_compressor(tuple(bshape), header.dtype, s=header.s,
                              coordinates=bcoords, config=bcfg,
                              chunk_groups=chunk_groups)
        bh = dataclasses.replace(header, shape=tuple(bshape),
                                 coordinates=bcoords, dd_nblocks=0,
                                 section_sizes=())
        if ndev > 1:
            with jax.default_device(devices[i % ndev]):
                pending.append(comp.decode_async(
                    bh, sections[per_block * i:per_block * (i + 1)]))
        else:
            pending.append(comp.decode_async(
                bh, sections[per_block * i:per_block * (i + 1)]))
        if len(pending) >= depth:
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
    # Codec chunk width the container was ENCODED with (header field;
    # absent = the pre-sweep 2048 default).  It parameterizes the
    # decoder directly — per-width compiled decoders coexist in the
    # compressor cache, so any process decodes any container no matter
    # what its own autotuned default is (reference contract:
    # include/format.hpp:90 populate_defaults).
    enc_cg = header.chunk_groups or 2048
    if header.dd_grid is not None:
        out = _decompress_blocknd(header, sections, enc_cg)
    elif header.dd_nblocks:
        out = _decompress_multiblock(header, sections, enc_cg)
    elif header.roi_block:
        # ROI containers ride the per-group codec, whose stream layout
        # is chunk-width independent (groups beyond the data have zero
        # exponents and emit nothing).
        from .models.roi import decompress_roi
        out = decompress_roi(header, sections)
    else:
        cfg = _config_from_header(header)
        comp = get_compressor(header.shape, header.dtype, s=header.s,
                              coordinates=header.coordinates, config=cfg,
                              chunk_groups=enc_cg)
        out = comp.decompress_parsed(header, sections)
    if header.orig_shape is not None:
        out = out.reshape(header.orig_shape)
    return out


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
