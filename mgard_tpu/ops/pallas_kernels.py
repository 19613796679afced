"""Pallas TPU kernels for the bitplane codec.

``bp_encode_condense`` / ``bp_decode_condense`` fuse the 32x32 butterfly
bit-transpose with the variable-length condense (one exact-size DMA per
chunk); ``bp_encode_core`` / ``bp_decode_core`` are the transpose-only
cores kept for stage benchmarking.  The XLA formulation of the butterfly
materializes every one of the ~480 intermediate slabs in HBM (~45 GB of
traffic at 512^3); here each tile is read once, transformed in
registers, and written once.

(The fused Thomas-solve kernel from round 1 was removed: the dense MXU
correction matmul in ops/transform.py replaced it on every reachable
path, and the lax.scan form in ops/tridiag.py covers dims beyond the
dense-matrix cap.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# Bitplane codec core (see ops/bitplane.py for the stream layout)
# ---------------------------------------------------------------------------

_BP_MASKS = [np.uint32(0x0000FFFF), np.uint32(0x00FF00FF),
             np.uint32(0x0F0F0F0F), np.uint32(0x33333333),
             np.uint32(0x55555555)]
_BP_SHIFTS = [16, 8, 4, 2, 1]
# Chunks per grid step.
# With 4096-group chunks, 4 chunks per step keeps double-buffered in
# tiles + planes scratch + temps within VMEM (each (4, 32, BP_R, 128) u32
# buffer is 2 MB; 8 chunks per step OOMs Mosaic's scoped budget).  BP_CB and BP_W mirror ops/bitplane.py's env-seeded
# CHUNK_TILE / CHUNK_GROUPS (utils/autotune.py seeds the env before the
# ops modules import) — imported from there rather than re-read from the
# env so a late first import of this module under a mutated environment
# cannot diverge from the stream layout bitplane already committed to.
# Reference analog: the AutoTuner's per-kernel block-size tables
# (include/mgard-x/RuntimeX/AutoTuners/AutoTuner.h:46-120).
from .bitplane import CHUNK_TILE as BP_CB

assert 1 <= BP_CB <= 8, "MGARD_TPU_BP_CB must be in [1, 8]"


def _butterfly_rows(rows):
    """5-round 32x32 bit-matrix transpose on a list of 32 equal-shape
    uint32 arrays (Hacker's-Delight butterfly), fully in registers."""
    rows = list(rows)
    for mask, sh in zip(_BP_MASKS, _BP_SHIFTS):
        shu = np.uint32(sh)
        for i in range(32):
            if i & sh:
                continue
            a, b = rows[i], rows[i | sh]
            t = ((a >> shu) ^ b) & mask
            rows[i] = a ^ (t << shu)
            rows[i | sh] = b ^ t
    return rows


def _bp_encode_kernel(q_ref, planes_ref, sign_ref, e_ref):
    q = q_ref[:]                                   # (CB, 32, 128) int32
    m = jnp.abs(q).astype(jnp.uint32)
    rows = _butterfly_rows([m[:, i, :] for i in range(32)])
    planes = jnp.stack(rows, axis=1)               # (CB, 32, 128)
    planes_ref[:] = planes
    neg = (q < 0).astype(jnp.uint32)
    sign = neg[:, 0, :]
    for i in range(1, 32):
        sign = sign | (neg[:, i, :] << np.uint32(i))
    sign_ref[:] = sign
    occ = (planes != np.uint32(0)).any(axis=2)     # (CB, 32)
    bit_idx = jax.lax.broadcasted_iota(jnp.int32, occ.shape, 1) + 1
    e = jnp.max(jnp.where(occ, bit_idx, 0), axis=1, keepdims=True)
    # lane-broadcast: rank-1 int32 outputs hit XLA/Mosaic layout-tiling
    # mismatches; a (CB, 128) broadcast costs ~0.1%% of the planes write.
    e_ref[:] = jnp.broadcast_to(e, (e.shape[0], 128))


def bp_encode_core(qc: jax.Array):
    """(nchunks, 32, 128) int32 -> (planes u32 same shape, sign u32
    (nchunks, 128), e int32 (nchunks,)).  nchunks is padded to BP_CB
    internally; callers slice."""
    nc = qc.shape[0]
    ncp = -(-nc // BP_CB) * BP_CB
    if ncp != nc:
        qc = jnp.concatenate(
            [qc, jnp.zeros((ncp - nc,) + qc.shape[1:], qc.dtype)])
    grid = (ncp // BP_CB,)
    planes, sign, e = pl.pallas_call(
        _bp_encode_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((BP_CB, 32, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((BP_CB, 32, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP_CB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP_CB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ncp, 32, 128), jnp.uint32),
            jax.ShapeDtypeStruct((ncp, 128), jnp.uint32),
            jax.ShapeDtypeStruct((ncp, 128), jnp.int32),
        ),
    )(qc)
    return planes[:nc], sign[:nc], e[:nc, 0]


# ---------------------------------------------------------------------------
# Fused transpose + condense codec (the default on TPU)
# ---------------------------------------------------------------------------
#
# The XLA condense (row gather over the capacity-sized buffer) moved
# ~2.2 GB of HBM traffic per 512^3 encode and ran at ~30 GB/s effective
# (37.9 ms measured) — over half the encode budget.  These kernels read
# the zigzag chunks once, butterfly-transpose them in VMEM (all vector
# work on tile-aligned slabs), and move each chunk's bitplane prefix
# with ONE exact-size DMA between the aligned planes scratch and the
# chunk's stream rows — the DMA engine handles the arbitrary stream
# offsets that scalarize catastrophically as vector ops (~76 us per
# chunk measured for a dynamic sublane store).
#
# Layout trick that makes the DMAs legal AND cheap: one bitplane of one
# 32768-value chunk is exactly 1024 words = one (8, 128) int32 TPU
# tile, so the word buffer is shaped (rows, 8, 128) and every DMA
# slices only the UNTILED outer dim — Mosaic accepts arbitrary dynamic
# offsets there (a (rows, W) buffer with W > 128 gets sublane-tiled and
# rejects offsets it cannot prove divisible by 8).
#
# Stream layout contract (shared with the XLA fallback in ops/bitplane.py):
# chunk c with zigzag exponent e > 0 owns plane-rows
# [offsets[c], offsets[c]+e) — bitplane b at slot b (LSB-first), each
# plane row 1024 words in row-major (8, 128) order, which equals the
# flat order of the XLA fallback's (rows, 1024) condense.  Exact sizes
# keep all writes disjoint, so every chunk DMA in a tile (and across
# tiles) can be in flight concurrently; a second pass waits on all of
# them before the grid step returns.  Encode sizes go through a 33-way
# lax.switch; decode reads a FIXED 32 rows per chunk (overlapping reads
# are harmless and the capacity buffer has 33 rows/chunk of headroom),
# so it needs no switch at all.

from .bitplane import CHUNK_GROUPS as BP_W  # noqa: E402
#                      the PROCESS-DEFAULT chunk width; the kernels below
#                      derive the actual width W from their input shapes
#                      (one plane = (W // 128) x (8,128) tiles), so a
#                      container encoded at any width decodes in any
#                      process (round-5 self-describability fix).
assert BP_W % 128 == 0 and BP_W > 0, \
    "MGARD_TPU_CHUNK_GROUPS must be a positive multiple of 128"
BP_R = BP_W // 128     # (8,128) sublane tiles per default-width plane


def _bp_r(W: int) -> int:
    assert W % 128 == 0 and W > 0, \
        "chunk width must be a positive multiple of 128"
    return W // 128


_META_STRIDE = 16      # int32 slots per tile in the flat SMEM meta
assert BP_CB + 1 <= _META_STRIDE


def _pack_meta(offsets: jax.Array, ntiles: int,
               total_rows: jax.Array) -> jax.Array:
    """Pack per-tile chunk offsets (slots 0..BP_CB-1) and the NEXT
    tile's first offset (slot BP_CB; the stream's total row count for
    the last tile) into one flat SMEM int32 array, _META_STRIDE slots
    per tile.  Kept whole in SMEM (a few KB) rather than blocked per
    grid step so the double-buffered condense can reconstruct the DMA
    descriptors of EARLIER tiles when it waits on their transfers."""
    nxt = jnp.concatenate(
        [offsets[BP_CB::BP_CB], total_rows.reshape(1)]).astype(jnp.int32)
    meta = jnp.concatenate(
        [offsets.reshape(ntiles, BP_CB).astype(jnp.int32),
         nxt.reshape(ntiles, 1),
         jnp.zeros((ntiles, _META_STRIDE - BP_CB - 1), jnp.int32)], axis=1)
    return meta.reshape(-1)


_META_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)   # whole array


def _enc_dma_loop(meta_ref, planes_ref, out_ref, sems, action: str,
                  t, p: int) -> None:
    """Per-chunk exact-size DMA between tile ``t``'s planes scratch
    (STATIC parity slot ``p``) and the stream.

    ``action``: 'start' or 'wait' — all BP_CB transfers of a tile
    (disjoint by exact sizing) fly concurrently.
    """
    base = t * _META_STRIDE

    def body(c, _):
        off = meta_ref[base + c]
        sz = meta_ref[base + c + 1] - off   # slot BP_CB = next tile's 0

        def mk(j):
            def br():
                if j == 0:
                    return
                dma = pltpu.make_async_copy(
                    planes_ref.at[p, c, pl.ds(0, j)],
                    out_ref.at[pl.ds(off, j)],
                    sems.at[p, c])
                if action == 'start':
                    dma.start()
                else:
                    dma.wait()
            return br

        jax.lax.switch(sz, [mk(j) for j in range(33)])
        return 0

    jax.lax.fori_loop(0, BP_CB, body, 0)


# Double-buffered condense (deferred DMA waits), MGARD_TPU_DB_CONDENSE=1.
# Measured NEUTRAL at 512^3 (20.27 vs 20.32 GB/s e2e, streams bit-equal):
# the condense is memory/VPU bound, not wait bound — round 4's
# "dispatch bound" diagnosis overstated the per-chunk DMA cost.  Kept
# opt-in (validated bit-exact on hardware) since it may pay on parts
# with slower DMA issue; default is the simpler single-buffer form,
# which also halves the planes scratch.
_DB_CONDENSE = __import__("os").environ.get(
    "MGARD_TPU_DB_CONDENSE", "0") == "1"


def _enc_condense_steps(meta_ref, planes, out_ref, planes_ref, sems,
                        ntiles: int) -> None:
    """Condense step (shared by all encode kernels).

    Single-buffer form: butterfly, start the tile's DMAs, wait for them
    — the VPU stalls for the full transfer latency every grid step.
    Double-buffered form (default): with two scratch parities, step i
    only waits for the transfers issued at step i-2 (almost always
    already complete behind step i-1's butterfly), and the final step
    drains the last two tiles.  Stream bytes are identical either way.
    """
    i = pl.program_id(0)
    if not _DB_CONDENSE:
        planes_ref[0] = planes
        _enc_dma_loop(meta_ref, planes_ref, out_ref, sems, 'start', i, 0)
        _enc_dma_loop(meta_ref, planes_ref, out_ref, sems, 'wait', i, 0)
        return
    par = jax.lax.rem(i, np.int32(2))   # int32 under jax_enable_x64 too

    # Parity indices must be STATIC: a traced index into the planes
    # scratch / semaphore arrays sends Mosaic down a scalarized path
    # (measured ~80x slower).  Duplicate the step under pl.when instead.
    for P in (0, 1):
        @pl.when(par == P)
        def _step(P=P):
            @pl.when(i >= 2)
            def _wait_prev():
                _enc_dma_loop(meta_ref, planes_ref, out_ref, sems,
                              'wait', i - 2, P)

            planes_ref[P] = planes
            _enc_dma_loop(meta_ref, planes_ref, out_ref, sems,
                          'start', i, P)

            @pl.when(i == ntiles - 1)
            def _drain():
                if ntiles >= 2:
                    _enc_dma_loop(meta_ref, planes_ref, out_ref, sems,
                                  'wait', i - 1, 1 - P)
                _enc_dma_loop(meta_ref, planes_ref, out_ref, sems,
                              'wait', i, P)


def _enc_scratch(R: int):
    return [
        pltpu.VMEM((2, BP_CB, 32, R, 128), jnp.uint32),
        pltpu.SemaphoreType.DMA((2, BP_CB)),
    ]


def _mk_bp_enc_condense_kernel(ntiles: int):
    def kernel(meta_ref, q_ref, out_ref, planes_ref, sems):
        z = q_ref[:]                               # (CB, 32, R, 128) uint32
        rows = _butterfly_rows([z[:, i] for i in range(32)])
        _enc_condense_steps(meta_ref, jnp.stack(rows, axis=1), out_ref,
                            planes_ref, sems, ntiles)
    return kernel


def bp_encode_condense(zc: jax.Array, offsets: jax.Array,
                       tile_rows: jax.Array, cap_rows: int) -> jax.Array:
    """Fused transpose+condense encode.

    ``zc``: (nchunks, 32, BP_W) uint32 zigzag values with nchunks a
    multiple of BP_CB; ``offsets``: (nchunks,) int32 stream plane-row
    offsets; ``tile_rows``: (nchunks // BP_CB,) int32 total rows per
    tile.  Returns the condensed (cap_rows, 8, 128) uint32 word buffer
    (tail garbage past the total row count).
    """
    nc = zc.shape[0]
    R = _bp_r(zc.shape[2])
    assert nc % BP_CB == 0
    ntiles = nc // BP_CB
    grid = (ntiles,)
    zc4 = zc.reshape(nc, 32, R, 128)
    # total stream rows = last tile's base + its row count
    total = offsets[(ntiles - 1) * BP_CB] + tile_rows[-1]
    meta = _pack_meta(offsets, ntiles, total)
    return pl.pallas_call(
        _mk_bp_enc_condense_kernel(ntiles),
        grid=grid,
        in_specs=[
            _META_SPEC,
            pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((cap_rows, R, 128), jnp.uint32),
        scratch_shapes=_enc_scratch(R),
    )(meta, zc4)


# ---------------------------------------------------------------------------
# Segmented-stream additions (PYRAMID_SEG layout): quantize+zigzag fused
# into the codec, condense DMA-writes into one shared buffer per level
# ---------------------------------------------------------------------------

def _bp_quant_kernel(invq_ref, x_ref, zc_ref, zmax_ref, flag_ref):
    """scale -> round-half-away -> zigzag -> per-chunk max + status.

    ``x``: (CB, 32, R, 128) float32 coefficients; ``invq``: scalar
    inverse quantum (1.0 when the caller pre-scaled).  Status code per
    chunk: 2 = non-finite value (NaN/Inf input), 1 = |q| past the int32
    ceiling (tolerance too tight), matching compressor._raise_status.
    """
    raw = x_ref[:]
    bad = jnp.logical_not(jnp.isfinite(raw))   # non-finite INPUT (code 2)
    x = raw * invq_ref[0, 0]
    a = jnp.abs(x) + 0.5
    over = a >= np.float32(2.0 ** 31)          # incl. f32-inf overflow
    t = jnp.trunc(a)
    q = jnp.where(x < 0, -t, t).astype(jnp.int32)
    z = (jax.lax.shift_left(q, np.int32(1))
         ^ jax.lax.shift_right_arithmetic(q, np.int32(31))
         ).astype(jnp.uint32)
    zc_ref[:] = z
    # Mosaic has no unsigned reductions: flip the sign bit so signed
    # int32 order equals unsigned order, reduce, flip back.
    zs = pltpu.bitcast(z ^ np.uint32(0x80000000), jnp.int32)
    zl = jnp.max(zs, axis=(1, 2))                    # (CB, 128)
    zm = jnp.max(zl, axis=-1, keepdims=True)         # (CB, 1)
    zmu = pltpu.bitcast(zm, jnp.uint32) ^ np.uint32(0x80000000)
    # per-tile (1, 8, 128) metadata blocks (sublane-8 tiling): rows
    # 0..CB-1 carry the chunk maxima / status codes
    pad = jnp.zeros((8 - BP_CB, 128), jnp.uint32)
    zmax_ref[:] = jnp.concatenate(
        [jnp.broadcast_to(zmu, (BP_CB, 128)), pad], axis=0)[None]
    code = jnp.maximum(
        2 * jnp.max(jnp.max(bad.astype(jnp.int32), axis=(1, 2)),
                    axis=-1, keepdims=True),
        jnp.max(jnp.max(over.astype(jnp.int32), axis=(1, 2)),
                axis=-1, keepdims=True))
    flag_ref[:] = jnp.concatenate(
        [jnp.broadcast_to(code, (BP_CB, 128)),
         pad.astype(jnp.int32)], axis=0)[None]


def bp_quant_zigzag(xc: jax.Array, inv_q) -> tuple:
    """(nchunks, 32, W) float32 -> (zigzag chunks uint32 (same view),
    per-chunk max uint32 (nchunks,), per-chunk status int32 (nchunks,))."""
    nc = xc.shape[0]
    W = xc.shape[2]
    R = _bp_r(W)
    assert nc % BP_CB == 0
    x4 = xc.reshape(nc, 32, R, 128)
    invq = jnp.asarray(inv_q, jnp.float32).reshape(1, 1)
    zc, zmax, flag = pl.pallas_call(
        _bp_quant_kernel,
        grid=(nc // BP_CB,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nc, 32, R, 128), jnp.uint32),
            jax.ShapeDtypeStruct((nc // BP_CB, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((nc // BP_CB, 8, 128), jnp.int32),
        ),
    )(invq, x4)
    return (zc.reshape(nc, 32, W),
            zmax[:, :BP_CB, 0].reshape(nc),
            flag[:, :BP_CB, 0].reshape(nc))


def _mk_bp_condense_into_kernel(ntiles: int):
    def kernel(meta_ref, q_ref, _buf_ref, out_ref, planes_ref, sems):
        z = q_ref[:]                               # (CB, 32, R, 128) uint32
        rows = _butterfly_rows([z[:, i] for i in range(32)])
        _enc_condense_steps(meta_ref, jnp.stack(rows, axis=1), out_ref,
                            planes_ref, sems, ntiles)
    return kernel


# ---------------------------------------------------------------------------
# Fully-fused encode: quantize + zigzag + transpose + condense in ONE
# kernel.  The two-kernel split (bp_quant_zigzag materializing the
# (n, 32, BP_W) uint32 zigzag chunks, then bp_encode_condense re-reading
# them) moves an extra 2x the input size through HBM; here the float
# coefficients are read once and only the stream rows leave the chip.
# The per-chunk exponents still need a global cumsum before offsets are
# known, so a cheap max-only pass (bp_quant_max) runs first — it reads
# the floats once and writes per-chunk scalars.
# ---------------------------------------------------------------------------

def _quant_zigzag_block(x, invq):
    """(CB, 32, BP_R, 128) f32 -> uint32 zigzag, matching _bp_quant_kernel
    bit-for-bit (scale, round half away from zero, zigzag)."""
    xs = x * invq
    a = jnp.abs(xs) + 0.5
    t = jnp.trunc(a)
    q = jnp.where(xs < 0, -t, t).astype(jnp.int32)
    return (jax.lax.shift_left(q, np.int32(1))
            ^ jax.lax.shift_right_arithmetic(q, np.int32(31))
            ).astype(jnp.uint32)


def _mk_bp_quant_condense_kernel(ntiles: int):
    def kernel(invq_ref, meta_ref, x_ref, out_ref, planes_ref, sems):
        z = _quant_zigzag_block(x_ref[:], invq_ref[0, 0])
        rows = _butterfly_rows([z[:, i] for i in range(32)])
        _enc_condense_steps(meta_ref, jnp.stack(rows, axis=1), out_ref,
                            planes_ref, sems, ntiles)
    return kernel


def _mk_bp_quant_condense_into_kernel(ntiles: int):
    def kernel(invq_ref, meta_ref, x_ref, _buf_ref, out_ref,
               planes_ref, sems):
        z = _quant_zigzag_block(x_ref[:], invq_ref[0, 0])
        rows = _butterfly_rows([z[:, i] for i in range(32)])
        _enc_condense_steps(meta_ref, jnp.stack(rows, axis=1), out_ref,
                            planes_ref, sems, ntiles)
    return kernel


def bp_quant_condense(xc: jax.Array, inv_q, offsets: jax.Array,
                      total_rows: jax.Array, buf=None,
                      cap_rows: int = 0) -> jax.Array:
    """Fused quantize+zigzag+transpose+condense of one float32 segment.

    ``xc``: (nchunks, 32, W) float32 (nchunks % BP_CB == 0);
    ``offsets``: (nchunks,) int32 GLOBAL stream plane-row offsets;
    ``total_rows``: scalar int32 — one past this segment's last row.
    With ``buf`` None allocates a fresh (cap_rows, W // 128, 128) stream
    buffer (first segment); otherwise writes into ``buf`` via aliasing.
    """
    nc = xc.shape[0]
    R = _bp_r(xc.shape[2])
    assert nc % BP_CB == 0
    ntiles = nc // BP_CB
    x4 = xc.reshape(nc, 32, R, 128)
    meta = _pack_meta(offsets, ntiles, total_rows)
    invq = jnp.asarray(inv_q, jnp.float32).reshape(1, 1)
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    x_spec = pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    if buf is None:
        return pl.pallas_call(
            _mk_bp_quant_condense_kernel(ntiles),
            grid=(ntiles,),
            in_specs=[smem1, _META_SPEC, x_spec],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((cap_rows, R, 128), jnp.uint32),
            scratch_shapes=_enc_scratch(R),
        )(invq, meta, x4)
    return pl.pallas_call(
        _mk_bp_quant_condense_into_kernel(ntiles),
        grid=(ntiles,),
        in_specs=[smem1, _META_SPEC, x_spec,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(buf.shape, jnp.uint32),
        scratch_shapes=_enc_scratch(R),
        input_output_aliases={3: 0},
    )(invq, meta, x4, buf)


def _bp_quant_max_kernel(invq_ref, x_ref, zmax_ref, flag_ref):
    """Max-only half of the fused encode: per-chunk zigzag max + status,
    identical arithmetic to _quant_zigzag_block."""
    raw = x_ref[:]
    bad = jnp.logical_not(jnp.isfinite(raw))
    x = raw * invq_ref[0, 0]
    a = jnp.abs(x) + 0.5
    over = a >= np.float32(2.0 ** 31)
    z = _quant_zigzag_block(raw, invq_ref[0, 0])
    zs = pltpu.bitcast(z ^ np.uint32(0x80000000), jnp.int32)
    zl = jnp.max(zs, axis=(1, 2))
    zm = jnp.max(zl, axis=-1, keepdims=True)
    zmu = pltpu.bitcast(zm, jnp.uint32) ^ np.uint32(0x80000000)
    pad = jnp.zeros((8 - BP_CB, 128), jnp.uint32)
    zmax_ref[:] = jnp.concatenate(
        [jnp.broadcast_to(zmu, (BP_CB, 128)), pad], axis=0)[None]
    code = jnp.maximum(
        2 * jnp.max(jnp.max(bad.astype(jnp.int32), axis=(1, 2)),
                    axis=-1, keepdims=True),
        jnp.max(jnp.max(over.astype(jnp.int32), axis=(1, 2)),
                axis=-1, keepdims=True))
    flag_ref[:] = jnp.concatenate(
        [jnp.broadcast_to(code, (BP_CB, 128)),
         pad.astype(jnp.int32)], axis=0)[None]


def bp_quant_max(xc: jax.Array, inv_q) -> tuple:
    """(nchunks, 32, W) float32 -> (per-chunk zigzag max uint32
    (nchunks,), per-chunk status int32 (nchunks,)) without materializing
    the zigzag chunks."""
    nc = xc.shape[0]
    R = _bp_r(xc.shape[2])
    assert nc % BP_CB == 0
    x4 = xc.reshape(nc, 32, R, 128)
    invq = jnp.asarray(inv_q, jnp.float32).reshape(1, 1)
    zmax, flag = pl.pallas_call(
        _bp_quant_max_kernel,
        grid=(nc // BP_CB,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nc // BP_CB, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((nc // BP_CB, 8, 128), jnp.int32),
        ),
    )(invq, x4)
    return zmax[:, :BP_CB, 0].reshape(nc), flag[:, :BP_CB, 0].reshape(nc)


def bp_condense_into(zc: jax.Array, offsets: jax.Array,
                     total_rows: jax.Array, buf: jax.Array) -> jax.Array:
    """Condense one segment's chunks into a SHARED stream buffer.

    ``zc``: (nchunks, 32, W) uint32 zigzag chunks (nchunks % BP_CB
    == 0); ``offsets``: (nchunks,) int32 GLOBAL plane-row offsets;
    ``total_rows``: scalar int32 — the stream row offset one past this
    segment's last chunk; ``buf``: (cap_rows, W // 128, 128) uint32
    stream buffer, ALIASED to the output (chained across segments with
    no copies — the reference serializes per-subdomain streams into one
    buffer the same way, Compressor.hpp Serialize)."""
    nc = zc.shape[0]
    R = _bp_r(zc.shape[2])
    assert nc % BP_CB == 0
    ntiles = nc // BP_CB
    zc4 = zc.reshape(nc, 32, R, 128)
    meta = _pack_meta(offsets, ntiles, total_rows)
    return pl.pallas_call(
        _mk_bp_condense_into_kernel(ntiles),
        grid=(ntiles,),
        in_specs=[
            _META_SPEC,
            pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(buf.shape, jnp.uint32),
        scratch_shapes=_enc_scratch(R),
        input_output_aliases={2: 0},
    )(meta, zc4, buf)


def _bp_dec_condense_f32_kernel(q_ref, meta_ref, e_ref, words_ref, out_ref,
                                planes_ref, sems):
    _dec_dma_loop(meta_ref, planes_ref, words_ref, sems, 'start')
    _dec_dma_loop(meta_ref, planes_ref, words_ref, sems, 'wait')
    e = e_ref[:]                                   # (CB, R, 128) int32
    b_idx = jax.lax.broadcasted_iota(jnp.int32, planes_ref.shape, 1)
    planes = jnp.where(b_idx < e[:, None], planes_ref[:], np.uint32(0))
    rows = _butterfly_rows([planes[:, i] for i in range(32)])
    z = jnp.stack(rows, axis=1).astype(jnp.int32)
    v = jax.lax.shift_right_logical(z, np.int32(1)) ^ -(z & 1)
    out_ref[:] = v.astype(jnp.float32) * q_ref[0, 0]


def bp_decode_condense_f32(words2d: jax.Array, offsets: jax.Array,
                           e: jax.Array, quantum) -> jax.Array:
    """Like :func:`bp_decode_condense` but fuses the dequantize multiply
    (uniform scalar quantum) into the kernel, returning float32."""
    nc = offsets.shape[0]
    W = words2d.shape[1]
    R = _bp_r(W)
    assert nc % BP_CB == 0
    ntiles = nc // BP_CB
    cap_rows = words2d.shape[0]
    words4 = words2d.reshape(cap_rows, R, 128)
    e_b = jnp.broadcast_to(e[:, None, None], (nc, R, 128)).astype(jnp.int32)
    total = offsets[(ntiles - 1) * BP_CB] \
        + jnp.sum(e[(ntiles - 1) * BP_CB:]).astype(jnp.int32)
    meta = _pack_meta(offsets, ntiles, total)
    q = jnp.asarray(quantum, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        _bp_dec_condense_f32_kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            _META_SPEC,
            pl.BlockSpec((BP_CB, R, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, 32, R, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BP_CB, 32, R, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((BP_CB,)),
        ],
    )(q, meta, e_b, words4)
    return out.reshape(nc, 32, W)


def _dec_dma_loop(meta_ref, planes_ref, words_ref, sems,
                  action: str) -> None:
    """EXACT-size read per chunk: chunk c's row count is the next
    offset minus its own (offsets are the cumsum of the exponents, so
    consecutive diffs are e_c; meta slot BP_CB carries the next tile's
    first offset).  Rows past e_c keep stale scratch and are masked by
    the caller's ``b_idx < e`` select — the fixed 32-row form read ~2x
    the stream (avg e ~12 at 512^3, measured 4.9 -> target ~3.8 ms for
    the decode codec stage)."""
    base = pl.program_id(0) * _META_STRIDE

    def body(c, _):
        off = meta_ref[base + c]
        sz = meta_ref[base + c + 1] - off

        def mk(j):
            def br():
                if j == 0:
                    return
                dma = pltpu.make_async_copy(
                    words_ref.at[pl.ds(off, j)],
                    planes_ref.at[c, pl.ds(0, j)],
                    sems.at[c])
                if action == 'start':
                    dma.start()
                else:
                    dma.wait()
            return br

        jax.lax.switch(sz, [mk(j) for j in range(33)])
        return 0

    jax.lax.fori_loop(0, BP_CB, body, 0)


def _bp_dec_condense_kernel(meta_ref, e_ref, words_ref, out_ref,
                            planes_ref, sems):
    _dec_dma_loop(meta_ref, planes_ref, words_ref, sems, 'start')
    _dec_dma_loop(meta_ref, planes_ref, words_ref, sems, 'wait')
    e = e_ref[:]                                   # (CB, R, 128) int32
    b_idx = jax.lax.broadcasted_iota(jnp.int32, planes_ref.shape, 1)
    planes = jnp.where(b_idx < e[:, None], planes_ref[:], np.uint32(0))
    rows = _butterfly_rows([planes[:, i] for i in range(32)])
    z = jnp.stack(rows, axis=1).astype(jnp.int32)
    out_ref[:] = jax.lax.shift_right_logical(z, np.int32(1)) ^ -(z & 1)


def bp_decode_condense(words2d: jax.Array, offsets: jax.Array,
                       e: jax.Array) -> jax.Array:
    """Inverse of :func:`bp_encode_condense`.

    ``words2d``: (cap_rows, W) uint32 condensed stream (capacity from
    bitplane.max_words); ``e``: (nchunks,) int32 per-chunk exponents.
    Returns (nchunks, 32, W) int32 values (zigzag already undone).
    """
    nc = offsets.shape[0]
    W = words2d.shape[1]
    R = _bp_r(W)
    assert nc % BP_CB == 0
    ntiles = nc // BP_CB
    cap_rows = words2d.shape[0]
    words4 = words2d.reshape(cap_rows, R, 128)
    e_b = jnp.broadcast_to(e[:, None, None], (nc, R, 128)).astype(jnp.int32)
    grid = (ntiles,)
    total = offsets[(ntiles - 1) * BP_CB] \
        + jnp.sum(e[(ntiles - 1) * BP_CB:]).astype(jnp.int32)
    meta = _pack_meta(offsets, ntiles, total)
    out = pl.pallas_call(
        _bp_dec_condense_kernel,
        grid=grid,
        in_specs=[
            _META_SPEC,
            pl.BlockSpec((BP_CB, R, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BP_CB, 32, R, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, 32, R, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BP_CB, 32, R, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((BP_CB,)),
        ],
    )(meta, e_b, words4)
    return out.reshape(nc, 32, W)


def _bp_decode_kernel(planes_ref, sign_ref, out_ref):
    planes = planes_ref[:]                         # (CB, 32, 128) u32
    rows = _butterfly_rows([planes[:, i, :] for i in range(32)])
    sign = sign_ref[:]                             # (CB, 128)
    outs = []
    for i in range(32):
        neg = (sign >> np.uint32(i)) & np.uint32(1)
        v = rows[i].astype(jnp.int32)
        outs.append(jnp.where(neg == np.uint32(1), -v, v))
    out_ref[:] = jnp.stack(outs, axis=1)


def bp_decode_core(planes: jax.Array, sign: jax.Array) -> jax.Array:
    """Inverse of :func:`bp_encode_core`: -> (nchunks, 32, 128) int32."""
    nc = planes.shape[0]
    ncp = -(-nc // BP_CB) * BP_CB
    if ncp != nc:
        planes = jnp.concatenate(
            [planes, jnp.zeros((ncp - nc, 32, 128), planes.dtype)])
        sign = jnp.concatenate(
            [sign, jnp.zeros((ncp - nc, 128), sign.dtype)])
    grid = (ncp // BP_CB,)
    out = pl.pallas_call(
        _bp_decode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BP_CB, 32, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP_CB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP_CB, 32, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncp, 32, 128), jnp.int32),
    )(planes, sign)
    return out[:nc]
