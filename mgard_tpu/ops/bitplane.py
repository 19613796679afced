"""TPU-native lossless codec for quantized coefficients.

Grouped bitplane coding — the role Huffman+deflate plays in the reference
(include/compressors.hpp, src/compressors.cpp:316-512), re-designed for the
TPU's execution model:

  * values are processed in groups of 32; each group is bit-transposed so
    that bitplane ``b`` of the 32 magnitudes becomes one ``uint32`` word
    (same primitive as the reference MDR GroupedBPEncoder,
    include/mgard-x/MDR-X/BitplaneEncoder/GroupedBPEncoderGPU.hpp:44-120);
  * the transpose is the classic 32x32 butterfly (5 masked shift/xor
    rounds), vectorized across groups with the *group* axis minor — all
    arrays are (32, G) or flat 1-D, never (G, 32): a u32 array with a
    32-wide minor axis pads 4x on TPU tiles;
  * variable-length output is concatenated **tile-aligned** (128-word
    units) so the condense step is a gather of 512-byte rows driven by a
    cumsum over chunks — no bit shifting, no serial scan, no atomics.

Two layouts share the machinery:

  ``encode``/``decode`` (chunked, the default): a chunk is 128 groups
  (4096 values), zigzag-mapped so the sign lives in the LSB.  A chunk
  with max zigzag bit-length ``e`` emits ``e`` rows of 128 words
  (bitplanes LSB-first) — a contiguous prefix of its transposed planes,
  which the fused Pallas condense writes with one exact-size DMA per
  chunk; an all-zero chunk emits nothing.  Perfectly aligned, very
  fast; exponent granularity is per-chunk.

  ``encode_pergroup``/``decode_pergroup``: per-32-value exponents and
  word-granular condense — better ratio, more index math; used where
  ratio matters more than throughput.

Everything is static-shaped and jittable: encoders write into a
fixed-capacity buffer and return the true word count as a scalar (the
reference's ``OutputTooLargeFailure`` pattern for variable output).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _use_pallas() -> bool:
    """Fused codec-core kernel on TPU (the XLA butterfly materializes every
    round's intermediates in HBM — ~45 GB of traffic at 512^3)."""
    flag = os.environ.get("MGARD_TPU_PALLAS_CODEC")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() == "tpu"

__all__ = [
    "encode", "decode", "encode_pergroup", "decode_pergroup",
    "encode_segments", "decode_segments", "max_words_segments",
    "GROUP", "CHUNK_GROUPS", "max_words", "encoded_nbytes",
    "transpose32",
]

GROUP = 32          # values per group == bits per word
# groups per chunk == words per emitted plane row.  Seeded from the
# autotune table / env before import (utils/autotune.py); the stream
# layout depends on it, so containers record it in their header and
# decode verifies the match.  Default 4096 from the round-4 hardware
# sweep at 512^3 f32 (utils/autotune.py sweep_knobs; BASELINE.md):
# 1024 -> 18.8, 2048 -> 19.6, 4096 -> 20.5 GB/s e2e at a 0.6% ratio
# cost (fewer, larger per-chunk DMAs on the dispatch-bound condense).
CHUNK_GROUPS = int(__import__("os").environ.get(
    "MGARD_TPU_CHUNK_GROUPS", "4096"))
#                     Sized so (a) the fused kernels, which are
#                     DMA-dispatch-bound (~0.3 us per chunk), issue few,
#                     large transfers, and (b) one bitplane of one chunk
#                     is a whole number of (8, 128) int32 TPU tiles, so
#                     the word buffer is (rows, G/128, 8, 128)-shaped and
#                     per-chunk DMAs slice only the UNTILED outer dim —
#                     arbitrary stream offsets, no alignment constraints
#                     for Mosaic to prove.  In the FINE physical-order layout every
#                     chunk mixes levels anyway, so the coarser exponent
#                     granularity costs almost nothing.
CHUNK_TILE = int(__import__("os").environ.get("MGARD_TPU_BP_CB", "4"))
#                     chunks per Pallas grid step (== pallas_kernels.BP_CB);
#                     chunk counts are padded to this so the fused condense
#                     kernels see whole tiles and the capacity buffer has
#                     one tile of DMA headroom


def num_chunks(n: int, C: int = 0) -> int:
    return -(-(-(-n // GROUP)) // (C or CHUNK_GROUPS))


def num_chunks_tiled(n: int, C: int = 0) -> int:
    """Chunk count padded to whole Pallas condense tiles (chunked codec
    only; the pergroup codec keeps the unrounded count)."""
    return -(-num_chunks(n, C) // CHUNK_TILE) * CHUNK_TILE


def max_words(n: int, C: int = 0) -> int:
    """Capacity of the word buffer for ``n`` values (worst case 33/32,
    sized for the tiled chunk count — a superset of the pergroup cap)."""
    return num_chunks_tiled(n, C) * (C or CHUNK_GROUPS) * (GROUP + 1)


def encoded_nbytes(exponents, count):
    """Total payload bytes given encoder outputs."""
    return int(np.asarray(exponents).size) + 4 * int(count)


# ---------------------------------------------------------------------------
# 32x32 bit-matrix transpose, vectorized over the minor axis
# ---------------------------------------------------------------------------

_MASKS = [np.uint32(0x0000FFFF), np.uint32(0x00FF00FF),
          np.uint32(0x0F0F0F0F), np.uint32(0x33333333),
          np.uint32(0x55555555)]
_SHIFTS = [16, 8, 4, 2, 1]


def transpose32(x: jax.Array) -> jax.Array:
    """Transpose a batch of 32x32 bit matrices.

    ``x``: (32, G) uint32.  Row i, lane g holds word ``x[i, g]``.  Viewing
    bit j of row i as matrix element (i, j) of group g, returns the
    (32, G) array with elements (j, i).  Involution: applying twice gives
    the input back.  5 masked shift/xor rounds (Hacker's-Delight style),
    each a few full-array VPU ops — no per-bit reduction.
    """
    return _butterfly(x, axis=0)


def _butterfly(x: jax.Array, axis: int) -> jax.Array:
    """5-round butterfly bit-transpose along a length-32 ``axis``.

    Rows are sliced out once, all five rounds run as pure elementwise ops
    on the 32 row values (row i pairs with row i^sh), and the result is
    stacked once at the end.  No rolls, no reshapes, no gathers — the
    whole thing is a fusable elementwise dataflow over (batch, W) slabs.
    """
    assert x.shape[axis] == GROUP
    idx = [slice(None)] * x.ndim
    rows = []
    for i in range(GROUP):
        idx[axis] = i
        rows.append(x[tuple(idx)])
    for mask, sh in zip(_MASKS, _SHIFTS):
        for i in range(GROUP):
            if i & sh:
                continue
            a, b = rows[i], rows[i | sh]
            t = ((a >> np.uint32(sh)) ^ b) & mask
            rows[i] = a ^ (t << np.uint32(sh))
            rows[i | sh] = b ^ t
    return jnp.stack(rows, axis=axis)


def transpose32_mid(x: jax.Array) -> jax.Array:
    """Butterfly bit-transpose along axis 1 of a (C, 32, W) uint32 array:
    bit i of out[c, b, w] = bit b of x[c, i, w]."""
    return _butterfly(x, axis=1)


def _bit_length32(x: jax.Array) -> jax.Array:
    """Integer bit length of uint32 values (0 -> 0), exact."""
    e = jnp.zeros(x.shape, dtype=jnp.int32)
    v = x
    for shift in (16, 8, 4, 2, 1):
        big = v >= (np.uint32(1) << np.uint32(shift))
        e = e + jnp.where(big, shift, 0).astype(jnp.int32)
        v = jnp.where(big, v >> np.uint32(shift), v)
    return jnp.where(x == 0, 0, e + 1)


def _to_rows(q: jax.Array):
    """int32 (n,) -> sign row (G,), magnitude planes (32, G) LSB-first,
    group count G."""
    n = q.shape[0]
    nchunks = num_chunks(n)
    ngroups = nchunks * CHUNK_GROUPS  # pad groups to whole chunks
    pad = ngroups * GROUP - n
    if pad:
        q = jnp.concatenate([q, jnp.zeros(pad, dtype=q.dtype)])
    m = jnp.abs(q).astype(jnp.uint32)
    neg = (q < 0).astype(jnp.uint32)
    # lane-transposed view: vals[i, g] = value 32*g + i
    mt = m.reshape(ngroups, GROUP).T       # (32, G)
    st = neg.reshape(ngroups, GROUP).T
    planes = transpose32(mt)               # planes[b, g] = bits b of group g
    # sign word per group: bit i = sign of value i — row 0..31 of st hold
    # one bit each; pack with the same butterfly by transposing a matrix
    # whose row 0 is the sign bits: cheaper: sum shifted rows.
    sign = jnp.zeros(st.shape[1], dtype=jnp.uint32)
    for i in range(GROUP):
        sign = sign | (st[i] << np.uint32(i))
    return sign, planes, ngroups


def _from_rows(sign: jax.Array, planes: jax.Array, n: int) -> jax.Array:
    """Inverse of :func:`_to_rows`."""
    mt = transpose32(planes)               # (32, G) magnitudes, row i = val i
    vals = mt.astype(jnp.int32)
    out = []
    for i in range(GROUP):
        neg = (sign >> np.uint32(i)) & np.uint32(1)
        out.append(jnp.where(neg == 1, -vals[i], vals[i]))
    return jnp.stack(out, axis=0).T.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Chunked codec (default): per-chunk exponents, 128-word aligned rows
# ---------------------------------------------------------------------------

# The wide (f64 / 64-bitplane) codec keeps its own chunk width: it is
# a pure-XLA path (no Pallas condense, so no DMA-dispatch pressure from
# narrower chunks), and a wide chunk costs `e * width` words even when
# the domain is far smaller than one chunk — at the f32-tuned 4096
# groups a 33^3 f64 array pays 4x padding.  2048 preserves the
# pre-sweep wide-stream geometry byte for byte.
WIDE_CHUNK_GROUPS = int(__import__("os").environ.get(
    "MGARD_TPU_WIDE_CHUNK_GROUPS", "2048"))


def num_chunks64(n: int, C: int = 0) -> int:
    return -(-(-(-n // GROUP)) // (C or WIDE_CHUNK_GROUPS))


def num_chunks64_tiled(n: int, C: int = 0) -> int:
    return -(-num_chunks64(n, C) // CHUNK_TILE) * CHUNK_TILE


def max_words64(n: int, C: int = 0) -> int:
    """Word-buffer capacity for the wide (64-bit) codec."""
    return num_chunks64_tiled(n, C) * (C or WIDE_CHUNK_GROUPS) \
        * (2 * GROUP + 1)


def _bit_length64(x: jax.Array) -> jax.Array:
    """Integer bit length of uint64 values (0 -> 0), exact."""
    e = jnp.zeros(x.shape, dtype=jnp.int32)
    v = x
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        e = e + jnp.where(big, shift, 0).astype(jnp.int32)
        v = jnp.where(big, v >> np.uint64(shift), v)
    return jnp.where(x == 0, 0, e + 1)


def encode64(q: jax.Array, C: int = 0):
    """Wide-dynamic-range chunked codec: int64 values, up to 64 bitplanes
    per chunk (the graceful path past the int32 ceiling — reference CPU
    quantizes to int64, include/quantize.tpp + src/mgard.proto:96-113;
    MGARD-X survives large magnitudes via its outlier channel,
    LinearQuantization.hpp:213-240).

    Same stream geometry as :func:`encode` (chunk c owns rows
    [offsets[c], offsets[c] + e_c), LSB-first), but ``e_c`` may reach
    64: planes 0..31 come from the low uint32 digit's butterfly, planes
    32..63 from the high digit's.  Requires jax_enable_x64.

    Returns ``(chunk_exponents uint8, words uint32 (cap,), count)``.
    """
    n = q.shape[0]
    C = C or WIDE_CHUNK_GROUPS
    vals_per_chunk = GROUP * C
    nchunks = num_chunks64_tiled(n, C)
    pad = nchunks * vals_per_chunk - n
    if pad:
        q = jnp.concatenate([q, jnp.zeros(pad, dtype=q.dtype)])
    z = ((q << jnp.int64(1)) ^ (q >> jnp.int64(63))).astype(jnp.uint64)
    zc = z.reshape(nchunks, GROUP, C)
    zlo = (zc & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    zhi = (zc >> jnp.uint64(32)).astype(jnp.uint32)
    e = _bit_length64(jnp.max(zc, axis=(1, 2)))
    ends = jnp.cumsum(e)
    offsets = (ends - e).astype(jnp.int32)
    cap_rows = nchunks * (2 * GROUP + 1)

    planes = jnp.concatenate(
        [transpose32_mid(zlo), transpose32_mid(zhi)], axis=1)  # (nc, 64, C)
    marks = jnp.zeros(cap_rows + 1, dtype=jnp.int32).at[offsets].add(
        1, indices_are_sorted=True)
    cid = jnp.clip(jnp.cumsum(marks[:-1]) - 1, 0, nchunks - 1)
    j = jnp.arange(cap_rows, dtype=jnp.int32)
    plane_idx = jnp.clip(j - offsets[cid], 0, 2 * GROUP - 1)
    rows = jnp.take(planes.reshape(nchunks * 2 * GROUP, C),
                    cid * 2 * GROUP + plane_idx, axis=0)
    return (e.astype(jnp.uint8), rows.reshape(-1),
            (ends[-1] * C).astype(jnp.int32))


def decode64(exponents: jax.Array, words: jax.Array, n: int,
             C: int = 0) -> jax.Array:
    """Inverse of :func:`encode64`; returns int64 of length ``n``."""
    nchunks = exponents.shape[0]
    C = C or WIDE_CHUNK_GROUPS
    e = exponents.astype(jnp.int32)
    ends = jnp.cumsum(e)
    offsets = (ends - e).astype(jnp.int32)
    rows = words.reshape(-1, C)
    cap_rows = rows.shape[0]

    b = jnp.arange(2 * GROUP, dtype=jnp.int32)[None, :]
    idx = offsets[:, None] + b
    valid = b < e[:, None]
    idx_c = jnp.clip(idx, 0, cap_rows - 1)
    planes = jnp.where(valid[:, :, None],
                       jnp.take(rows, idx_c, axis=0), np.uint32(0))
    zlo = transpose32_mid(planes[:, :GROUP])
    zhi = transpose32_mid(planes[:, GROUP:])
    z = zlo.astype(jnp.uint64) | (zhi.astype(jnp.uint64) << jnp.uint64(32))
    zi = z.astype(jnp.int64)
    out = jax.lax.shift_right_logical(zi, jnp.int64(1)) ^ -(zi & jnp.int64(1))
    return out.reshape(-1)[:n]


def _zigzag(q: jax.Array) -> jax.Array:
    """int32 -> uint32 zigzag: 0,-1,1,-2,2,... -> 0,1,2,3,4,... — folds the
    sign into the LSB so a chunk's stream is a pure prefix of its
    transposed bitplanes (no separate sign row; the reference Huffman
    side-steps this with a signed dictionary, compressors.cpp:316)."""
    return ((q << 1) ^ (q >> 31)).astype(jnp.uint32)


def _unzigzag(z: jax.Array) -> jax.Array:
    zi = z.astype(jnp.int32)
    return jax.lax.shift_right_logical(zi, np.int32(1)) ^ -(zi & 1)


def _chunk_exponents(zc: jax.Array) -> jax.Array:
    """Per-chunk exponent: bit length of the max zigzag value."""
    return _bit_length32(jnp.max(zc, axis=(1, 2)))


def encode(q: jax.Array, C: int = 0):
    """Encode an int32 vector.

    Returns ``(chunk_exponents uint8 (nchunks,), words uint32 (cap,),
    count int32 scalar)``; only ``words[:count]`` is meaningful.

    Internal layout: the vector is viewed as (chunks, 32, 128); the
    "group" g of chunk c holds the 32 values ``q[c*4096 + 128*i + g]``
    (strided within the 4096-value chunk window).  This keeps every array
    in the pipeline at a 128-wide minor axis — no physical transposes, no
    TPU tile padding — and exponent granularity is per-chunk anyway.

    Stream layout: chunk c with exponent e > 0 owns rows
    [offsets[c], offsets[c]+e): the zigzag bitplanes LSB-first (plane b
    at slot b).  An all-zero chunk emits nothing.

    ``C`` (chunk width in groups; 0 = the process default) is a WIRE
    parameter: containers record it in their header and decode passes
    the recorded value back, so any process decodes any container
    (reference contract: include/format.hpp:90 populate_defaults).
    """
    n = q.shape[0]
    C = C or CHUNK_GROUPS
    vals_per_chunk = GROUP * C
    nchunks = num_chunks_tiled(n, C)
    pad = nchunks * vals_per_chunk - n
    if pad:
        q = jnp.concatenate([q, jnp.zeros(pad, dtype=q.dtype)])
    zc = _zigzag(q.reshape(nchunks, GROUP, C))
    cap_rows = nchunks * (GROUP + 1)

    e = _chunk_exponents(zc)
    counts = e                                        # rows per chunk
    ends = jnp.cumsum(counts)
    offsets = (ends - counts).astype(jnp.int32)
    total_rows = ends[-1]

    if _use_pallas() and C % 128 == 0:
        from .pallas_kernels import BP_CB, bp_encode_condense
        assert BP_CB == CHUNK_TILE
        tile_rows = (ends[CHUNK_TILE - 1::CHUNK_TILE]
                     - offsets[::CHUNK_TILE]).astype(jnp.int32)
        rows = bp_encode_condense(zc, offsets, tile_rows, cap_rows)
        return (e.astype(jnp.uint8), rows.reshape(-1),
                (total_rows * C).astype(jnp.int32))

    # XLA fallback (CPU tests): transpose, then condense with row gathers.
    planes_c = transpose32_mid(zc)                   # (nc, 32, C) LSB-first
    # Output row j of chunk `cid` at slot k is plane k (LSB first).  The
    # tail beyond total_rows is garbage — every consumer reads only
    # words[:count] / offset-addressed rows.
    marks = jnp.zeros(cap_rows + 1, dtype=jnp.int32).at[offsets].add(
        1, indices_are_sorted=True)
    cid = jnp.clip(jnp.cumsum(marks[:-1]) - 1, 0, nchunks - 1)
    j = jnp.arange(cap_rows, dtype=jnp.int32)
    plane_idx = jnp.clip(j - offsets[cid], 0, GROUP - 1)
    rows = jnp.take(planes_c.reshape(nchunks * GROUP, C),
                    cid * GROUP + plane_idx, axis=0)             # (cap, C)
    return (e.astype(jnp.uint8), rows.reshape(-1),
            (total_rows * C).astype(jnp.int32))


def decode(exponents: jax.Array, words: jax.Array, n: int,
           C: int = 0) -> jax.Array:
    """Decode back to an int32 vector of length ``n``.

    ``exponents``: (nchunks,) uint8; ``words``: uint32 buffer holding the
    condensed stream, zero-padded to ``max_words(n, C)`` capacity; ``C``
    the chunk width the stream was ENCODED with (0 = process default)."""
    nchunks = exponents.shape[0]
    C = C or CHUNK_GROUPS
    e = exponents.astype(jnp.int32)
    ends = jnp.cumsum(e)
    offsets = (ends - e).astype(jnp.int32)
    rows = words.reshape(-1, C)
    cap_rows = rows.shape[0]

    if _use_pallas() and nchunks % CHUNK_TILE == 0 and C % 128 == 0 \
            and cap_rows >= nchunks * (GROUP + 1):
        from .pallas_kernels import BP_CB, bp_decode_condense
        assert BP_CB == CHUNK_TILE
        out = bp_decode_condense(rows, offsets, e)
        return out.reshape(-1)[:n]

    # plane with LSB-index b of chunk c sits at offsets[c] + b
    b = jnp.arange(GROUP, dtype=jnp.int32)[None, :]
    idx = offsets[:, None] + b                                  # (nc, 32)
    valid = b < e[:, None]
    idx_c = jnp.clip(idx, 0, cap_rows - 1)
    planes_c = jnp.where(valid[:, :, None],
                         jnp.take(rows, idx_c, axis=0), np.uint32(0))

    z = transpose32_mid(planes_c)                    # (nc, 32, C) zigzag
    return _unzigzag(z).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Segmented codec (PYRAMID_SEG layout): each segment (pyramid level)
# padded to whole chunks; quantize+zigzag fused into the codec; one
# shared stream buffer written via aliased condense calls — no 1-D
# concatenation of the coefficient stream anywhere (the XLA concat of
# odd-offset level flats cost 6.7 ms of the 512^3 encode).
# ---------------------------------------------------------------------------

def max_words_segments(sizes, C: int = 0) -> int:
    """Stream-buffer word capacity for segmented encode of ``sizes``."""
    return sum(num_chunks_tiled(int(n), C) for n in sizes) \
        * (C or CHUNK_GROUPS) * (GROUP + 1)


def _condense_xla(zc: jax.Array, offsets: jax.Array,
                  cap_rows: int) -> jax.Array:
    """XLA row-gather condense (CPU fallback): (nchunks, 32, C) zigzag
    planes -> (cap_rows, C) stream rows (tail garbage)."""
    nchunks = zc.shape[0]
    C = zc.shape[2]
    planes_c = transpose32_mid(zc)
    marks = jnp.zeros(cap_rows + 1, dtype=jnp.int32).at[offsets].add(
        1, indices_are_sorted=True)
    cid = jnp.clip(jnp.cumsum(marks[:-1]) - 1, 0, nchunks - 1)
    j = jnp.arange(cap_rows, dtype=jnp.int32)
    plane_idx = jnp.clip(j - offsets[cid], 0, GROUP - 1)
    return jnp.take(planes_c.reshape(nchunks * GROUP, C),
                    cid * GROUP + plane_idx, axis=0)


def _decode_chunks_xla(rows: jax.Array, offsets: jax.Array,
                       e: jax.Array) -> jax.Array:
    """XLA fallback: gather each chunk's plane rows and un-transpose.
    Returns (nchunks, 32, C) int32 (zigzag undone)."""
    cap_rows = rows.shape[0]
    b = jnp.arange(GROUP, dtype=jnp.int32)[None, :]
    idx = offsets[:, None] + b
    valid = b < e[:, None]
    idx_c = jnp.clip(idx, 0, cap_rows - 1)
    planes_c = jnp.where(valid[:, :, None],
                         jnp.take(rows, idx_c, axis=0), np.uint32(0))
    z = transpose32_mid(planes_c)
    return _unzigzag(z)


def _seg_chunked(seg: jax.Array, nc: int, C: int) -> jax.Array:
    """Flatten a segment and pad to ``nc`` whole chunks."""
    f = seg.reshape(-1)
    pad = nc * GROUP * C - f.shape[0]
    if pad:
        f = jnp.concatenate([f, jnp.zeros(pad, f.dtype)])
    return f.reshape(nc, GROUP, C)


def encode_segments(segs, inv_q, C: int = 0):
    """Fused quantize+encode of a list of float32 segments.

    Each segment is scaled by the scalar ``inv_q`` (pass 1.0 if already
    scaled), rounded half-away-from-zero, zigzag-mapped and bitplane-
    condensed into ONE stream whose chunks are segment-aligned (each
    segment padded to whole chunks — the zero tail emits no rows).

    Returns ``(exponents uint8 (total_chunks,), words uint32 (cap,),
    count int32, status int32)`` with status codes matching
    compressor._raise_status (1 overflow, 2 non-finite).
    """
    C = C or CHUNK_GROUPS
    ncs = [num_chunks_tiled(int(np.prod(s.shape)), C) for s in segs]
    bounds = np.concatenate([[0], np.cumsum(ncs)]).astype(int)
    total_chunks = int(bounds[-1])
    cap_rows = total_chunks * (GROUP + 1)

    if _use_pallas() and C % 128 == 0:
        from .pallas_kernels import bp_quant_condense, bp_quant_max
        # Pass 1: per-chunk zigzag maxima + statuses only (floats read
        # once, scalars out).  Pass 2: fused quantize+zigzag+transpose+
        # condense per segment into one shared stream buffer — the
        # intermediate (n, 32, W) uint32 zigzag array of the old
        # two-kernel split (2x the input size of extra HBM traffic)
        # never exists.
        xchs, zmaxs, flags = [], [], []
        for seg, nc in zip(segs, ncs):
            xch = _seg_chunked(seg, nc, C)
            zm, fl = bp_quant_max(xch, inv_q)
            xchs.append(xch)
            zmaxs.append(zm)
            flags.append(fl)
        e = _bit_length32(jnp.concatenate(zmaxs))
        ends = jnp.cumsum(e)
        offsets = (ends - e).astype(jnp.int32)
        total_rows = ends[-1].astype(jnp.int32)
        buf = None
        for k, xch in enumerate(xchs):
            a, b = int(bounds[k]), int(bounds[k + 1])
            off_k = jax.lax.slice_in_dim(offsets, a, b)
            seg_end = (offsets[b] if b < total_chunks else total_rows)
            buf = bp_quant_condense(xch, inv_q, off_k, seg_end, buf=buf,
                                    cap_rows=cap_rows)
        status = jnp.max(jnp.concatenate(flags))
        return (e.astype(jnp.uint8), buf.reshape(-1),
                (total_rows * C).astype(jnp.int32), status)

    # XLA fallback (CPU tests)
    zcs, codes = [], []
    for seg, nc in zip(segs, ncs):
        raw = seg.reshape(-1)
        bad = jnp.logical_not(jnp.all(jnp.isfinite(raw))).astype(jnp.int32)
        x = raw * jnp.asarray(inv_q, seg.dtype)
        a = jnp.abs(x) + 0.5
        over = jnp.logical_not(
            jnp.max(a) < np.float64(2 ** 31)).astype(jnp.int32)
        codes.append(jnp.maximum(2 * bad, over))
        q = jnp.trunc(jnp.copysign(a, x)).astype(jnp.int32)
        zcs.append(_zigzag(_seg_chunked(q, nc, C)))
    zc = jnp.concatenate(zcs, axis=0)
    e = _chunk_exponents(zc)
    ends = jnp.cumsum(e)
    offsets = (ends - e).astype(jnp.int32)
    rows = _condense_xla(zc, offsets, cap_rows)
    status = jnp.max(jnp.stack(codes))
    return (e.astype(jnp.uint8), rows.reshape(-1),
            (ends[-1] * C).astype(jnp.int32), status)


def decode_segments(exponents: jax.Array, words: jax.Array, sizes,
                    quantum=None, C: int = 0):
    """Inverse of :func:`encode_segments`.

    ``sizes``: static per-segment value counts.  With ``quantum`` (a
    traced scalar) the dequantize multiply is fused into the decode and
    float32 segments are returned; otherwise int32.
    """
    C = C or CHUNK_GROUPS
    ncs = [num_chunks_tiled(int(n), C) for n in sizes]
    bounds = np.concatenate([[0], np.cumsum(ncs)]).astype(int)
    e = exponents.astype(jnp.int32)
    ends = jnp.cumsum(e)
    offsets = (ends - e).astype(jnp.int32)
    rows = words.reshape(-1, C)
    use_pallas = _use_pallas() and C % 128 == 0
    outs = []
    for k, n in enumerate(sizes):
        a, b = int(bounds[k]), int(bounds[k + 1])
        off_k = jax.lax.slice_in_dim(offsets, a, b)
        e_k = jax.lax.slice_in_dim(e, a, b)
        if use_pallas:
            from .pallas_kernels import (bp_decode_condense,
                                         bp_decode_condense_f32)
            if quantum is not None:
                seg = bp_decode_condense_f32(rows, off_k, e_k, quantum)
            else:
                seg = bp_decode_condense(rows, off_k, e_k)
        else:
            seg = _decode_chunks_xla(rows, off_k, e_k)
            if quantum is not None:
                seg = seg.astype(jnp.float32) * jnp.asarray(
                    quantum, jnp.float32)
        outs.append(seg.reshape(-1)[:int(n)])
    return outs


# ---------------------------------------------------------------------------
# Per-group codec: finer exponent granularity, word-granular condense
# ---------------------------------------------------------------------------

def encode_pergroup(q: jax.Array):
    """Per-32-value-group variant (better ratio, heavier index math).

    Returns ``(group_exponents uint8 (G,), words uint32 (cap,), count)``.
    """
    n = q.shape[0]
    sign, planes, ngroups = _to_rows(q)

    bit_idx = jnp.arange(1, GROUP + 1, dtype=jnp.int32)[:, None]
    e = jnp.max(jnp.where(planes != 0, bit_idx, 0), axis=0)     # (G,)

    counts = jnp.where(e > 0, e + 1, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    # flat padded layout: group g occupies slots [g*33, g*33+33):
    # slot 0 = sign, slot k = plane e_g - k (MSB first)
    cap = ngroups * (GROUP + 1)
    marks = jnp.zeros(cap + 1, dtype=jnp.int32).at[offsets].add(
        1, indices_are_sorted=True)
    gid = jnp.clip(jnp.cumsum(marks[:-1]) - 1, 0, ngroups - 1)
    j = jnp.arange(cap, dtype=jnp.int32)
    slot = jnp.clip(j - offsets[gid], 0, GROUP)
    # value at (gid, slot): slot 0 -> sign[gid]; else planes[e-slot, gid]
    plane_idx = jnp.clip(e[gid] - slot, 0, GROUP - 1)
    flat_idx = plane_idx * ngroups + gid
    from_planes = jnp.take(planes.reshape(-1), flat_idx)
    vals = jnp.where(slot == 0, jnp.take(sign, gid), from_planes)
    vals = jnp.where(j < total, vals, np.uint32(0))
    return e.astype(jnp.uint8), vals, total.astype(jnp.int32)


def decode_pergroup(exponents: jax.Array, words: jax.Array,
                    n: int) -> jax.Array:
    ngroups = exponents.shape[0]
    e = exponents.astype(jnp.int32)
    counts = jnp.where(e > 0, e + 1, 0)
    offsets = jnp.cumsum(counts) - counts
    cap_words = words.shape[0]

    sign = jnp.where(e > 0, jnp.take(
        words, jnp.clip(offsets, 0, cap_words - 1)), np.uint32(0))

    b = jnp.arange(GROUP, dtype=jnp.int32)[:, None]             # (32, 1)
    idx = offsets[None, :] + e[None, :] - b                     # (32, G)
    valid = b < e[None, :]
    planes = jnp.where(valid, jnp.take(
        words, jnp.clip(idx, 0, cap_words - 1)), np.uint32(0))
    return _from_rows(sign, planes, n)
