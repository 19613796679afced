"""MDR: progressive (multiprecision) refactoring and reconstruction.

TPU-native counterpart of MDR / MDR-X (include/mgard-x/MDR-X/, doc/MDR-X.md):
the multigrid coefficients of each level are exponent-aligned to fixed
point and sliced into *bitplanes*; the refactored artifact stores per-level
per-bitplane streams plus error metadata, so a reader can fetch just
enough bitplanes to meet a requested tolerance — and later fetch *more* to
refine, reusing what it already has.

Component mapping (reference -> here):
  Decomposer       (MDR/Decomposer/MGARD.hpp:11)   -> ops.transform.decompose
  Interleaver      (MDR/Interleaver/*)             -> region-blocked level layout
  BitplaneEncoder  (GroupedBPEncoderGPU.hpp:44)    -> plane-major bit-transpose
    NegaBinaryBPEncoder (MDR/BitplaneEncoder/NegaBinaryBPEncoder.hpp)
                                                   -> encoding="negabinary"
  ErrorCollector   (MDR/ErrorCollector/*)          -> per-plane sq/max residuals
  ErrorEstimator   (MDR/ErrorEstimator/{Max,Squared}ErrorEstimator.hpp)
                                                   -> mdr_request s=inf / finite-s
  LevelCompressor  (MDR/LosslessCompressor/DefaultLevelCompressor.hpp)
                                                   -> per-stream zstd (default on)
  SizeInterpreter  (GreedyBasedSizeInterpreter)    -> greedy rate/benefit picker
  Refactor/Reconstructor (ComposedRefactor.hpp)    -> MDRefactor/MDReconstruct

All per-level heavy math is jitted with static shapes; orchestration and the
(byte-sized) metadata live on host.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hierarchy import Hierarchy
from ..ops import transform
from ..ops.bitplane import GROUP, transpose32_mid

_MDR_W = 128  # lane width of the chunked bit-transpose layout

# stream-level lossless (reference DefaultLevelCompressor = zstd per stream)
LOSSLESS_NONE = 0
LOSSLESS_ZSTD = 1

# bitplane encodings
ENC_SIGN_MAGNITUDE = 0   # sign stream + magnitude planes (GroupedBPEncoder)
ENC_NEGABINARY = 1       # negabinary planes, no sign stream

_NEG_MASK32 = np.uint32(0xAAAAAAAA)


def _mdr_layout(n: int):
    """(lane width, nchunks, padded ngroups) for a level of n values.
    Small levels use a narrow single chunk so 4-coefficient levels don't
    pay 128-word streams."""
    ngroups0 = max(1, -(-n // GROUP))
    w = _MDR_W if ngroups0 >= _MDR_W else ngroups0
    nchunks = -(-ngroups0 // w)
    return w, nchunks, nchunks * w

NUM_BITPLANES = 30  # magnitude planes (fits uint32 with headroom)


# ---------------------------------------------------------------------------
# Metadata
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LevelMetadata:
    n: int                      # number of coefficients in this level
    exponent: int               # |coeff| < 2^exponent
    sq_errors: np.ndarray       # (B+1,) vol-weighted residual sq-sum after b
    max_errors: np.ndarray      # (B+1,) residual max after b planes
    stream_sizes: np.ndarray    # (B+1,) stored byte size of [sign, planes...]


@dataclasses.dataclass
class MDRMetadata:
    """Refactored-dataset metadata (reference MDRMetadata,
    RuntimeX/DataStructures/MDRMetadata.hpp)."""
    shape: Tuple[int, ...]
    dtype: np.dtype
    num_bitplanes: int
    levels: List[LevelMetadata]
    lossless: int = LOSSLESS_ZSTD
    encoding: int = ENC_SIGN_MAGNITUDE

    def pack(self) -> bytes:
        out = bytearray()
        out += struct.pack("<BB", 2, len(self.shape))
        out += struct.pack(f"<{len(self.shape)}Q", *self.shape)
        out += struct.pack("<BB", 0 if self.dtype == np.float32 else 1,
                           self.num_bitplanes)
        out += struct.pack("<BB", self.lossless, self.encoding)
        out += struct.pack("<B", len(self.levels))
        for lm in self.levels:
            out += struct.pack("<Qi", lm.n, lm.exponent)
            out += lm.sq_errors.astype("<f8").tobytes()
            out += lm.max_errors.astype("<f8").tobytes()
            out += lm.stream_sizes.astype("<u4").tobytes()
        return bytes(out)

    @classmethod
    def unpack(cls, buf: bytes) -> "MDRMetadata":
        off = 0
        ver, ndim = struct.unpack_from("<BB", buf, off); off += 2
        shape = struct.unpack_from(f"<{ndim}Q", buf, off); off += 8 * ndim
        dt, B = struct.unpack_from("<BB", buf, off); off += 2
        lossless, encoding = LOSSLESS_NONE, ENC_SIGN_MAGNITUDE
        if ver >= 2:
            lossless, encoding = struct.unpack_from("<BB", buf, off); off += 2
        (nlev,) = struct.unpack_from("<B", buf, off); off += 1
        levels = []
        for _ in range(nlev):
            n, e = struct.unpack_from("<Qi", buf, off); off += 12
            sq = np.frombuffer(buf, "<f8", B + 1, off); off += 8 * (B + 1)
            mx = np.frombuffer(buf, "<f8", B + 1, off); off += 8 * (B + 1)
            if ver >= 2:
                sz = np.frombuffer(buf, "<u4", B + 1, off); off += 4 * (B + 1)
            else:
                sz = np.zeros(B + 1, np.uint32)
            levels.append(LevelMetadata(n, e, np.array(sq), np.array(mx),
                                        np.array(sz)))
        return cls(tuple(shape), np.dtype(np.float32 if dt == 0
                                          else np.float64), B, levels,
                   lossless=lossless, encoding=encoding)


# ---------------------------------------------------------------------------
# Per-level bitplane encode/decode kernels
# ---------------------------------------------------------------------------

def _level_sizes(hier: Hierarchy) -> List[int]:
    sizes = [0] * (hier.L + 1)
    for (l, r, bs, pos) in transform.block_specs(hier):
        sizes[l] += int(np.prod(bs))
    return sizes


def _level_flat(hier: Hierarchy, pyramid) -> List[jax.Array]:
    """Interleave each level's coefficients into one 1-D vector
    (region-blocked order — the 'BlockedInterleaver' role)."""
    blocks = transform.pyramid_to_blocks(hier, pyramid)
    specs = transform.block_specs(hier)
    per_level: Dict[int, list] = {l: [] for l in range(hier.L + 1)}
    for (l, r, bs, pos), b in zip(specs, blocks):
        per_level[l].append(b.reshape(-1))
    return [jnp.concatenate(per_level[l]) for l in range(hier.L + 1)]


def _level_unflat(hier: Hierarchy, flats: Sequence[jax.Array]):
    specs = transform.block_specs(hier)
    offs = [0] * (hier.L + 1)
    blocks = []
    for (l, r, bs, pos) in specs:
        size = int(np.prod(bs))
        blocks.append(jax.lax.slice_in_dim(
            flats[l], offs[l], offs[l] + size).reshape(bs))
        offs[l] += size
    return transform.blocks_to_pyramid(hier, blocks)


def _level_max_volume(hier: Hierarchy, l: int) -> float:
    """Upper bound on the per-node volume weight of level ``l``: the
    SquaredErrorCollector sums are scaled by this so the s-norm estimator
    (reference SNormErrorEstimator, MDR/ErrorEstimator/
    SquaredErrorEstimator.hpp:43-58 — s_table[l] = 2^{2sl + d(L-l)} on the
    dyadic unit cube) generalizes to nonuniform grids."""
    vol = 1.0
    for d in range(hier.ndim):
        if hier.shape[d] > 1:
            vol *= float(np.max(hier.dims[d][l].volumes))
    return vol


def _neg2bin(u: jax.Array) -> jax.Array:
    """Negabinary word -> signed int32 (reference negabinary2binary,
    MDR/RefactorUtils.hpp)."""
    return ((u ^ _NEG_MASK32) - _NEG_MASK32).astype(jnp.int32)


def _bin2neg(x: jax.Array) -> jax.Array:
    """Signed int32 -> negabinary uint32 (reference binary2negabinary)."""
    return (x.astype(jnp.uint32) + _NEG_MASK32) ^ _NEG_MASK32


def encode_level(flat: jax.Array, B: int, encoding: int = ENC_SIGN_MAGNITUDE):
    """Exponent-align one level's coefficients and slice into bitplanes.

    Returns (exponent i32 scalar, sign_words (G,), planes (B, G) —
    MSB first, sq_err (B+1,), max_err (B+1,)).  ``sq_err`` is the raw
    (unweighted) squared residual sum — callers apply volume weights.
    With ``encoding=ENC_NEGABINARY`` the sign stream is all-zero filler
    (negabinary needs none) and planes hold negabinary bits with the
    reference's 2-bit headroom (NegaBinaryBPEncoder.hpp:27 ``exp += 2``).
    """
    n = flat.shape[0]
    W, nchunks, ngroups = _mdr_layout(n)
    pad = ngroups * GROUP - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, dtype=flat.dtype)])
    amax = jnp.max(jnp.abs(flat))
    # e = smallest integer with |v| < 2^e (reference exponent alignment)
    e = jnp.ceil(jnp.log2(jnp.maximum(amax, jnp.finfo(flat.dtype).tiny))
                 ).astype(jnp.int32)
    e = jnp.where(amax == 0, jnp.int32(-1000), e)
    # guard the all-zero level: any finite scale maps 0 -> 0
    e_scale = jnp.where(amax == 0, jnp.int32(B), e)

    if encoding == ENC_NEGABINARY:
        scale = jnp.exp2((B - (e_scale + 2)).astype(flat.dtype))
        fp = jnp.clip(flat * scale, -(2.0 ** 31 - 1), 2.0 ** 31 - 1)
        signed = jnp.trunc(fp).astype(jnp.int32)
        m = _bin2neg(signed)                       # (G*32,) negabinary words
        mc = m.reshape(nchunks, GROUP, W)
        planes_c = transpose32_mid(mc)
        sign_words = jnp.zeros(ngroups, dtype=jnp.uint32)
        inv_scale = 1.0 / scale
        sq_err, max_err = [], []
        for b in range(B + 1):
            mask = np.uint32(((1 << (B - b)) - 1) if b < B else 0)
            kept = m & ~mask
            resid = jnp.abs((signed - _neg2bin(kept)).astype(flat.dtype)) \
                * inv_scale
            sq_err.append(jnp.sum(resid * resid))
            max_err.append(jnp.max(resid))
    else:
        scale = jnp.exp2((B - e_scale).astype(flat.dtype))
        m = jnp.minimum(jnp.floor(jnp.abs(flat) * scale),
                        2.0 ** B - 1).astype(jnp.uint32)
        neg = (flat < 0).astype(jnp.uint32)

        # chunked (nc, 32, 128) layout: keeps the minor axis 128-wide
        # through the butterfly (no TPU tile padding); group (c,g) holds
        # the strided values flat[c*4096 + 128*i + g].
        mc = m.reshape(nchunks, GROUP, W)
        sc = neg.reshape(nchunks, GROUP, W)
        planes_c = transpose32_mid(mc)           # (nc, 32, W) LSB-first
        sign_c = jnp.zeros((nchunks, W), dtype=jnp.uint32)
        for i in range(GROUP):
            sign_c = sign_c | (sc[:, i, :] << np.uint32(i))
        sign_words = sign_c.reshape(-1)          # (G,)
        inv_scale = 1.0 / scale
        sq_err, max_err = [], []
        for b in range(B + 1):
            mask = np.uint32((1 << (B - b)) - 1)
            resid = (m & mask).astype(flat.dtype) * inv_scale
            sq_err.append(jnp.sum(resid * resid))
            max_err.append(jnp.max(resid))

    # keep B planes, MSB first: plane b (0=MSB) is bit index B-1-b
    planes = planes_c[:, np.arange(B - 1, -1, -1), :] \
        .transpose(1, 0, 2).reshape(B, ngroups)
    return (e, sign_words, planes,
            jnp.stack(sq_err), jnp.stack(max_err))


def decode_level(sign_words: jax.Array, planes: jax.Array, e: jax.Array,
                 B: int, b_kept: int, n: int, dtype,
                 encoding: int = ENC_SIGN_MAGNITUDE):
    """Reconstruct one level from its first ``b_kept`` bitplanes."""
    W, nchunks, ngroups = _mdr_layout(n)
    zero = jnp.zeros((nchunks, 1, W), dtype=jnp.uint32)
    rows = []
    for bit in range(GROUP):
        # bitplane with LSB index `bit` is stored plane B-1-bit (MSB first)
        k = B - 1 - bit
        if 0 <= k < b_kept:
            rows.append(planes[k].reshape(nchunks, 1, W))
        else:
            rows.append(zero)
    full = jnp.concatenate(rows, axis=1)          # (nc, 32, 128)
    mt = transpose32_mid(full)                    # (nc, 32, 128) magnitudes
    if encoding == ENC_NEGABINARY:
        scale = jnp.exp2((B - (e + 2)).astype(jnp.float64)).astype(dtype)
        vals = _neg2bin(mt).astype(dtype) / scale
        return vals.reshape(-1)[:n]
    scale = jnp.exp2((B - e).astype(jnp.float64)).astype(dtype)
    m = mt.astype(dtype)
    if 0 < b_kept < B:
        # midpoint correction for the dropped planes of nonzero values
        half = 2.0 ** (B - b_kept - 1)
        m = m + jnp.where(mt > 0, half, 0.0).astype(dtype)
    vals = m / scale
    sign_c = sign_words.reshape(nchunks, W)
    out = []
    for i in range(GROUP):
        negbit = (sign_c >> np.uint32(i)) & np.uint32(1)
        out.append(jnp.where(negbit == 1, -vals[:, i, :], vals[:, i, :]))
    return jnp.stack(out, axis=1).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Error estimators (reference MDR/ErrorEstimator/)
# ---------------------------------------------------------------------------

def _max_error_amp(ndim_effective: int, encoding: int) -> float:
    """L-infinity amplification of a per-coefficient error through
    recomposition (reference MaxErrorEstimatorOB,
    MDR/ErrorEstimator/MaxErrorEstimator.hpp:12-29).  The reference's
    extra 4x covers negabinary's slower per-plane decay; the binary
    sign-magnitude path keeps the analytic constant."""
    d = ndim_effective
    if d == 1:
        c = 1.0 + math.sqrt(3.0) / 2.0
    elif d == 2:
        c = 1.0 + 9.0 / 4.0
    elif d == 3:
        c = 1.0 + 21.0 * math.sqrt(3.0) / 8.0
    else:
        c = 1.0 + 3.0 ** d  # conservative fallback for d > 3
    if encoding == ENC_NEGABINARY:
        c *= 4.0
    return c


def estimate_error(md: MDRMetadata, counts: Sequence[int],
                   s: float = math.inf) -> float:
    """Error estimate for a retrieval plan ``counts`` (planes per level).

    s = inf: c(d) * sum_l max_err_l  (MaxErrorEstimatorOB).
    finite s: sqrt(sum_l 2^{2sl} * vol_l * sq_err_l)  (SNormErrorEstimator,
    MDR/ErrorEstimator/SquaredErrorEstimator.hpp:43-58; sq_errors are
    stored pre-scaled by the level volume bound)."""
    d = sum(1 for x in md.shape if x > 1)
    if math.isinf(s):
        amp = _max_error_amp(d, md.encoding)
        return amp * sum(lm.max_errors[c]
                         for lm, c in zip(md.levels, counts))
    tot = sum((2.0 ** (2.0 * s * l)) * lm.sq_errors[c]
              for l, (lm, c) in enumerate(zip(md.levels, counts)))
    return math.sqrt(tot)


# ---------------------------------------------------------------------------
# Refactor / Request / Reconstruct
# ---------------------------------------------------------------------------

class MDRefactorResult:
    def __init__(self, metadata: MDRMetadata,
                 streams: List[List[bytes]]):
        self.metadata = metadata
        # streams[l][0] = sign stream; streams[l][1+b] = bitplane b (MSB first)
        self.streams = streams


def _stream_pack(data: bytes, lossless: int) -> bytes:
    """Per-stream lossless with a 1-byte flag: 0 = raw, 1 = zstd.  Tiny
    or incompressible streams stay raw (the reference
    AdaptiveLevelCompressor's role, MDR/LosslessCompressor/
    AdaptiveLevelCompressor.hpp)."""
    if lossless == LOSSLESS_ZSTD:
        import zstandard
        packed = zstandard.ZstdCompressor(level=3).compress(data)
        if len(packed) < len(data):
            return b"\x01" + packed
        return b"\x00" + data
    return data


def _stream_unpack(data: bytes, lossless: int, raw_size: int) -> bytes:
    if lossless == LOSSLESS_ZSTD:
        if data[:1] == b"\x01":
            import zstandard
            return zstandard.ZstdDecompressor().decompress(
                data[1:], max_output_size=raw_size)
        return data[1:]
    return data


@functools.lru_cache(maxsize=64)
def _cached_hierarchy(shape) -> Hierarchy:
    """Hierarchies are cached per shape so per-block reconstruct calls
    reuse tables and jit caches keyed on instance identity (round-2
    review weak #10: MDRDataset.reconstruct rebuilt one per call)."""
    return Hierarchy(shape)


@functools.lru_cache(maxsize=64)
def _refactor_kernel(hier: Hierarchy, B: int, encoding: int):
    """Jitted decompose+bitplane-encode, cached per (hierarchy, planes,
    encoding) — defining the jit inside mdr_refactor recompiled on every
    call (round-2 review weak #10)."""

    @jax.jit
    def kernel(v):
        pyr = transform.decompose(hier, v)
        flats = _level_flat(hier, pyr)
        return [encode_level(f, B, encoding) for f in flats]

    return kernel


def mdr_refactor(hier: Hierarchy, v, B: int = NUM_BITPLANES,
                 lossless: int = LOSSLESS_ZSTD,
                 encoding: int = ENC_SIGN_MAGNITUDE) -> MDRefactorResult:
    """Decompose and bitplane-refactor (reference MDRefactor, mdr_x.hpp:19).

    Each stored stream is zstd-compressed by default (reference
    DefaultLevelCompressor, MDR/LosslessCompressor/
    DefaultLevelCompressor.hpp:13-28); metadata records compressed sizes
    so the size interpreter prices planes by actual bytes."""
    v = jnp.asarray(v)
    dtype = np.dtype(v.dtype)

    outs = _refactor_kernel(hier, B, encoding)(v)
    sizes = _level_sizes(hier)
    levels_md = []
    streams: List[List[bytes]] = []
    for l, (e, sign_words, planes, sq, mx) in enumerate(outs):
        s = [_stream_pack(
            np.asarray(sign_words).astype("<u4").tobytes(), lossless)]
        planes_np = np.asarray(planes)
        for b in range(B):
            s.append(_stream_pack(
                planes_np[b].astype("<u4").tobytes(), lossless))
        streams.append(s)
        vol = _level_max_volume(hier, l)
        levels_md.append(LevelMetadata(
            n=sizes[l], exponent=int(e),
            sq_errors=np.asarray(sq, dtype=np.float64) * vol,
            max_errors=np.asarray(mx, dtype=np.float64),
            stream_sizes=np.array([len(x) for x in s], dtype=np.uint32)))
    md = MDRMetadata(shape=hier.shape, dtype=dtype, num_bitplanes=B,
                     levels=levels_md, lossless=lossless, encoding=encoding)
    return MDRefactorResult(md, streams)


def mdr_request(md: MDRMetadata, tol: float, s: float = math.inf,
                strategy: str = "greedy") -> List[int]:
    """Pick per-level bitplane counts for a target tolerance (reference
    SizeInterpreter family).

    ``strategy`` mirrors the reference's interpreter variants:

    * ``"greedy"`` (default) — the next plane of the level with the
      largest *remaining* error per byte
      (GreedyBasedSizeInterpreter.hpp:23);
    * ``"inorder"`` — levels coarsest-first, each level fetched to
      exhaustion before the next (BasicSizeInterpreter.hpp:11
      InorderSizeInterpreter);
    * ``"roundrobin"`` — one plane per level cyclically
      (BasicSizeInterpreter.hpp:53 RoundRobinSizeInterpreter).

    All strategies stop at the same error target, so they are
    interchangeable in correctness; greedy minimizes retrieved bytes.
    Plane costs come from the stored (compressed) stream sizes, so the
    greedy plan optimizes actual retrieved bytes."""
    L = len(md.levels) - 1
    counts = [0] * (L + 1)
    B = md.num_bitplanes

    def plane_cost(l: int, b: int) -> float:
        sz = md.levels[l].stream_sizes
        if sz[1 + b] > 0:
            return float(sz[1 + b])
        return 4.0 * (-(-md.levels[l].n // GROUP))

    if strategy == "inorder":
        l = 0
        while estimate_error(md, counts, s) > tol:
            while l <= L and counts[l] >= B:
                l += 1
            if l > L:
                break
            counts[l] += 1
        return counts
    if strategy == "roundrobin":
        l = 0
        while estimate_error(md, counts, s) > tol:
            if all(c >= B for c in counts):
                break
            while counts[l] >= B:
                l = (l + 1) % (L + 1)
            counts[l] += 1
            l = (l + 1) % (L + 1)
        return counts
    if strategy != "greedy":
        raise ValueError(f"unknown size-interpreter strategy {strategy!r}")

    # Greedy: repeatedly fetch the next plane of the level with the largest
    # *remaining* error per byte.  Ranking by remaining error (not by the
    # next plane's local gain) cannot starve a level whose max element
    # happens to have a 0 bit in the next plane.
    while estimate_error(md, counts, s) > tol:
        best = None
        for l in range(L + 1):
            b = counts[l]
            if b >= B:
                continue
            if math.isinf(s):
                remaining = md.levels[l].max_errors[b]
            else:
                remaining = (2.0 ** (2.0 * s * l)) * md.levels[l].sq_errors[b]
            rate = remaining / plane_cost(l, b)
            if best is None or rate > best[0]:
                best = (rate, l)
        if best is None:
            break  # everything fetched; can't do better
        counts[best[1]] += 1
    return counts


class MDReconstructor:
    """Progressive reconstructor with state reuse (reference
    ReconstructorCache / ComposedReconstructor.hpp:21)."""

    def __init__(self, hier: Hierarchy, md: MDRMetadata):
        self.hier = hier
        self.md = md
        self.fetched: List[List[Optional[bytes]]] = [
            [None] * (md.num_bitplanes + 1) for _ in md.levels]
        self.counts = [0] * len(md.levels)
        self._jit_cache: Dict[Tuple, object] = {}

    def add_streams(self, level: int, streams: Dict[int, bytes]):
        """Feed newly retrieved streams; index 0 = signs, 1+b = plane b.
        Streams arrive as stored (possibly zstd-compressed) bytes."""
        for idx, data in streams.items():
            self.fetched[level][idx] = data

    def reconstruct(self, counts: Optional[List[int]] = None,
                    target_level: Optional[int] = None) -> np.ndarray:
        """Reconstruct from the fetched planes.

        ``target_level`` < hier.L yields the adaptive-resolution output:
        the dense level-``target_level`` grid (reference
        MDRHighLevel.hpp:241-254 adaptive resolution)."""
        hier, md = self.hier, self.md
        if counts is not None:
            self.counts = list(counts)
        B = md.num_bitplanes
        counts = self.counts
        lmax = hier.L if target_level is None else int(target_level)

        signs, planes_in, exps = [], [], []
        for l, lm in enumerate(md.levels):
            ngroups = _mdr_layout(lm.n)[2]
            sign = self.fetched[l][0]
            b_kept = counts[l]
            if sign is not None:
                raw = _stream_unpack(sign, md.lossless, 4 * ngroups)
                sign_w = np.frombuffer(raw, "<u4")
            else:
                sign_w = np.zeros(ngroups, np.uint32)
            planes = np.zeros((max(b_kept, 1), ngroups), np.uint32)
            for b in range(b_kept):
                data = self.fetched[l][1 + b]
                if data is None:
                    raise ValueError(
                        f"bitplane {b} of level {l} not retrieved")
                raw = _stream_unpack(data, md.lossless, 4 * ngroups)
                planes[b] = np.frombuffer(raw, "<u4")
            signs.append(jnp.asarray(sign_w))
            planes_in.append(jnp.asarray(planes))
            exps.append(jnp.asarray(lm.exponent, dtype=jnp.int32))

        key = (tuple(counts), lmax)
        if key not in self._jit_cache:
            sizes = [lm.n for lm in md.levels]

            def full(signs, planes_in, exps):
                flats = [
                    decode_level(sg, pl, e, B, counts[l], sizes[l],
                                 md.dtype, md.encoding)
                    for l, (sg, pl, e) in enumerate(
                        zip(signs, planes_in, exps))
                ]
                pyr = _level_unflat(hier, flats)
                return transform.recompose_to_level(hier, pyr, lmax)

            self._jit_cache[key] = jax.jit(full)
        return np.asarray(self._jit_cache[key](signs, planes_in, exps))


def mdr_reconstruct(hier: Hierarchy, result: MDRefactorResult,
                    tol: float, s: float = math.inf,
                    target_level: Optional[int] = None) -> np.ndarray:
    """One-shot convenience: request + feed + reconstruct."""
    counts = mdr_request(result.metadata, tol, s)
    rec = MDReconstructor(hier, result.metadata)
    for l, c in enumerate(counts):
        streams = {0: result.streams[l][0]}
        for b in range(c):
            streams[1 + b] = result.streams[l][1 + b]
        rec.add_streams(l, streams)
    return rec.reconstruct(counts, target_level=target_level)


# ---------------------------------------------------------------------------
# Domain-decomposed MDR (reference MDRHighLevel,
# include/mgard-x/MDRHighLevel/MDRHighLevel.hpp:29-270)
# ---------------------------------------------------------------------------

class MDRDataset:
    """Refactored dataset split into independent domain blocks.

    Each block carries its own metadata and streams; requests pick
    per-block bitplane counts for a shared target tolerance (L-infinity
    errors take the max over blocks, so each block gets the full budget;
    finite-s budgets split as tol/sqrt(nblocks), the reference
    ErrorToleranceCalculator rule)."""

    def __init__(self, shape, dd_dim: int, edges, results):
        self.shape = tuple(shape)
        self.dd_dim = dd_dim
        self.edges = list(edges)
        self.results = results  # List[MDRefactorResult]

    def _block_tol(self, tol: float, s: float) -> float:
        if math.isinf(s) or len(self.results) <= 1:
            return tol
        return tol / math.sqrt(len(self.results))

    def request(self, tol: float, s: float = math.inf):
        bt = self._block_tol(tol, s)
        return [mdr_request(r.metadata, bt, s) for r in self.results]

    def reconstruct(self, tol: float, s: float = math.inf) -> np.ndarray:
        bt = self._block_tol(tol, s)
        outs = []
        for r in self.results:
            hier = _cached_hierarchy(tuple(r.metadata.shape))
            outs.append(mdr_reconstruct(hier, r, bt, s))
        return np.concatenate(outs, axis=self.dd_dim)

    def retrieved_bytes(self, tol: float, s: float = math.inf) -> int:
        total = 0
        for r, counts in zip(self.results, self.request(tol, s)):
            for l, c in enumerate(counts):
                total += len(r.streams[l][0])
                total += sum(len(r.streams[l][1 + b]) for b in range(c))
        return total


def mdr_refactor_dd(data, max_block_bytes: int = 2 << 30,
                    B: int = NUM_BITPLANES,
                    lossless: int = LOSSLESS_ZSTD,
                    encoding: int = ENC_SIGN_MAGNITUDE) -> MDRDataset:
    """Refactor with domain decomposition along the largest dim."""
    arr = np.asarray(data)
    nbytes = arr.nbytes
    dd_dim = int(np.argmax(arr.shape))
    nblocks = max(1, int(-(-nbytes // max_block_bytes)))
    edges = np.linspace(0, arr.shape[dd_dim], nblocks + 1).astype(int)
    results = []
    for i in range(nblocks):
        sl = [slice(None)] * arr.ndim
        sl[dd_dim] = slice(edges[i], edges[i + 1])
        block = np.ascontiguousarray(arr[tuple(sl)])
        hier = Hierarchy(block.shape)
        results.append(mdr_refactor(hier, block, B=B, lossless=lossless,
                                    encoding=encoding))
    return MDRDataset(arr.shape, dd_dim, edges, results)
