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
  ErrorCollector   (MDR/ErrorCollector/*)          -> per-plane sq/max residuals
  SizeInterpreter  (GreedyBasedSizeInterpreter)    -> greedy rate/benefit picker
  Refactor/Reconstructor (ComposedRefactor.hpp)    -> MDRefactor/MDReconstruct

All per-level heavy math is jitted with static shapes; orchestration and the
(byte-sized) metadata live on host.
"""

from __future__ import annotations

import dataclasses
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
    sq_errors: np.ndarray       # (B+1,) residual squared-sum after b planes
    max_errors: np.ndarray      # (B+1,) residual max after b planes


@dataclasses.dataclass
class MDRMetadata:
    """Refactored-dataset metadata (reference MDRMetadata,
    RuntimeX/DataStructures/MDRMetadata.hpp)."""
    shape: Tuple[int, ...]
    dtype: np.dtype
    num_bitplanes: int
    levels: List[LevelMetadata]

    def pack(self) -> bytes:
        out = bytearray()
        out += struct.pack("<BB", 1, len(self.shape))
        out += struct.pack(f"<{len(self.shape)}Q", *self.shape)
        out += struct.pack("<BB", 0 if self.dtype == np.float32 else 1,
                           self.num_bitplanes)
        out += struct.pack("<B", len(self.levels))
        for lm in self.levels:
            out += struct.pack("<Qi", lm.n, lm.exponent)
            out += lm.sq_errors.astype("<f8").tobytes()
            out += lm.max_errors.astype("<f8").tobytes()
        return bytes(out)

    @classmethod
    def unpack(cls, buf: bytes) -> "MDRMetadata":
        off = 0
        _, ndim = struct.unpack_from("<BB", buf, off); off += 2
        shape = struct.unpack_from(f"<{ndim}Q", buf, off); off += 8 * ndim
        dt, B = struct.unpack_from("<BB", buf, off); off += 2
        (nlev,) = struct.unpack_from("<B", buf, off); off += 1
        levels = []
        for _ in range(nlev):
            n, e = struct.unpack_from("<Qi", buf, off); off += 12
            sq = np.frombuffer(buf, "<f8", B + 1, off); off += 8 * (B + 1)
            mx = np.frombuffer(buf, "<f8", B + 1, off); off += 8 * (B + 1)
            levels.append(LevelMetadata(n, e, np.array(sq), np.array(mx)))
        return cls(tuple(shape), np.dtype(np.float32 if dt == 0
                                          else np.float64), B, levels)


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


def encode_level(flat: jax.Array, B: int):
    """Exponent-align one level's coefficients and slice into bitplanes.

    Returns (exponent f32 scalar, sign_words (G,), planes (B, G) —
    MSB first, sq_err (B+1,), max_err (B+1,)).
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
    scale = jnp.exp2((B - e_scale).astype(flat.dtype))
    m = jnp.minimum(jnp.floor(jnp.abs(flat) * scale),
                    2.0 ** B - 1).astype(jnp.uint32)
    neg = (flat < 0).astype(jnp.uint32)

    # chunked (nc, 32, 128) layout: keeps the minor axis 128-wide through
    # the butterfly (no TPU tile padding); group (c,g) holds the strided
    # values flat[c*4096 + 128*i + g].
    mc = m.reshape(nchunks, GROUP, W)
    sc = neg.reshape(nchunks, GROUP, W)
    planes_c = transpose32_mid(mc)           # (nc, 32, W) LSB-first
    sign_c = jnp.zeros((nchunks, W), dtype=jnp.uint32)
    for i in range(GROUP):
        sign_c = sign_c | (sc[:, i, :] << np.uint32(i))
    sign_words = sign_c.reshape(-1)          # (G,)
    # keep B planes, MSB first: plane b (0=MSB) is bit index B-1-b
    planes = planes_c[:, np.arange(B - 1, -1, -1), :] \
        .transpose(1, 0, 2).reshape(B, ngroups)

    inv_scale = 1.0 / scale
    sq_err = []
    max_err = []
    for b in range(B + 1):
        mask = np.uint32((1 << (B - b)) - 1)
        resid = (m & mask).astype(flat.dtype) * inv_scale
        sq_err.append(jnp.sum(resid * resid))
        max_err.append(jnp.max(resid))
    return (e, sign_words, planes,
            jnp.stack(sq_err), jnp.stack(max_err))


def decode_level(sign_words: jax.Array, planes: jax.Array, e: jax.Array,
                 B: int, b_kept: int, n: int, dtype):
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
# Refactor / Request / Reconstruct
# ---------------------------------------------------------------------------

class MDRefactorResult:
    def __init__(self, metadata: MDRMetadata,
                 streams: List[List[bytes]]):
        self.metadata = metadata
        # streams[l][0] = sign stream; streams[l][1+b] = bitplane b (MSB first)
        self.streams = streams


def mdr_refactor(hier: Hierarchy, v, B: int = NUM_BITPLANES
                 ) -> MDRefactorResult:
    """Decompose and bitplane-refactor (reference MDRefactor, mdr_x.hpp:19)."""
    v = jnp.asarray(v)
    dtype = np.dtype(v.dtype)

    @jax.jit
    def kernel(v):
        pyr = transform.decompose(hier, v)
        flats = _level_flat(hier, pyr)
        return [encode_level(f, B) for f in flats]

    outs = kernel(v)
    sizes = _level_sizes(hier)
    levels_md = []
    streams: List[List[bytes]] = []
    for l, (e, sign_words, planes, sq, mx) in enumerate(outs):
        levels_md.append(LevelMetadata(
            n=sizes[l], exponent=int(e),
            sq_errors=np.asarray(sq), max_errors=np.asarray(mx)))
        s = [np.asarray(sign_words).astype("<u4").tobytes()]
        planes_np = np.asarray(planes)
        for b in range(B):
            s.append(planes_np[b].astype("<u4").tobytes())
        streams.append(s)
    md = MDRMetadata(shape=hier.shape, dtype=dtype, num_bitplanes=B,
                     levels=levels_md)
    return MDRefactorResult(md, streams)


def mdr_request(md: MDRMetadata, tol: float, s: float = math.inf
                ) -> List[int]:
    """Pick per-level bitplane counts for a target tolerance (reference
    SizeInterpreter; greedy like GreedyBasedSizeInterpreter.hpp:23).

    For L-inf (s=inf) the level errors add:  err <= sum_l max_err_l.
    For s=0 (L2-ish) we use sqrt(sum_l sq_err_l) on coefficients as the
    controllable proxy.
    """
    L = len(md.levels) - 1
    counts = [0] * (L + 1)
    B = md.num_bitplanes
    # Interpolation amplification: a per-coefficient error eps on any level
    # can grow by (1 + 3^d) in the reconstructed function (the same factor
    # the L-inf quantum divides by, TensorMultilevelCoefficientQuantizer
    # .tpp:13-26).
    d = sum(1 for x in md.shape if x > 1)
    amp = 1.0 + 3.0 ** d

    def total_err(counts):
        if math.isinf(s):
            return amp * sum(md.levels[l].max_errors[counts[l]]
                             for l in range(L + 1))
        return math.sqrt(sum(md.levels[l].sq_errors[counts[l]]
                             for l in range(L + 1)))

    # Greedy: repeatedly fetch the next plane of the level with the largest
    # *remaining* error per byte.  Ranking by remaining error (not by the
    # next plane's local gain) cannot starve a level whose max element
    # happens to have a 0 bit in the next plane.
    while total_err(counts) > tol:
        best = None
        for l in range(L + 1):
            b = counts[l]
            if b >= B:
                continue
            remaining = (md.levels[l].max_errors[b] if math.isinf(s)
                         else md.levels[l].sq_errors[b])
            cost = 4 * (-(-md.levels[l].n // GROUP))
            rate = remaining / cost
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
        self._jit_cache: Dict[Tuple[int, ...], object] = {}

    def add_streams(self, level: int, streams: Dict[int, bytes]):
        """Feed newly retrieved streams; index 0 = signs, 1+b = plane b."""
        for idx, data in streams.items():
            self.fetched[level][idx] = data

    def reconstruct(self, counts: Optional[List[int]] = None) -> np.ndarray:
        hier, md = self.hier, self.md
        if counts is not None:
            self.counts = list(counts)
        B = md.num_bitplanes
        counts = self.counts

        signs, planes_in, exps = [], [], []
        for l, lm in enumerate(md.levels):
            ngroups = _mdr_layout(lm.n)[2]
            sign = self.fetched[l][0]
            b_kept = counts[l]
            sign_w = (np.frombuffer(sign, "<u4") if sign is not None
                      else np.zeros(ngroups, np.uint32))
            planes = np.zeros((max(b_kept, 1), ngroups), np.uint32)
            for b in range(b_kept):
                data = self.fetched[l][1 + b]
                if data is None:
                    raise ValueError(
                        f"bitplane {b} of level {l} not retrieved")
                planes[b] = np.frombuffer(data, "<u4")
            signs.append(jnp.asarray(sign_w))
            planes_in.append(jnp.asarray(planes))
            exps.append(jnp.asarray(lm.exponent, dtype=jnp.int32))

        key = tuple(counts)
        if key not in self._jit_cache:
            sizes = [lm.n for lm in md.levels]

            def full(signs, planes_in, exps):
                flats = [
                    decode_level(sg, pl, e, B, counts[l], sizes[l], md.dtype)
                    for l, (sg, pl, e) in enumerate(
                        zip(signs, planes_in, exps))
                ]
                pyr = _level_unflat(hier, flats)
                return transform.recompose(hier, pyr)

            self._jit_cache[key] = jax.jit(full)
        return np.asarray(self._jit_cache[key](signs, planes_in, exps))


def mdr_reconstruct(hier: Hierarchy, result: MDRefactorResult,
                    tol: float, s: float = math.inf) -> np.ndarray:
    """One-shot convenience: request + feed + reconstruct."""
    counts = mdr_request(result.metadata, tol, s)
    rec = MDReconstructor(hier, result.metadata)
    for l, c in enumerate(counts):
        streams = {0: result.streams[l][0]}
        for b in range(c):
            streams[1 + b] = result.streams[l][1 + b]
        rec.add_streams(l, streams)
    return rec.reconstruct(counts)


# ---------------------------------------------------------------------------
# Domain-decomposed MDR (reference MDRHighLevel,
# include/mgard-x/MDRHighLevel/MDRHighLevel.hpp:29-270)
# ---------------------------------------------------------------------------

class MDRDataset:
    """Refactored dataset split into independent domain blocks.

    Each block carries its own metadata and streams; requests pick
    per-block bitplane counts for a shared target tolerance (L-infinity
    errors take the max over blocks, so each block gets the full budget).
    """

    def __init__(self, shape, dd_dim: int, edges, results):
        self.shape = tuple(shape)
        self.dd_dim = dd_dim
        self.edges = list(edges)
        self.results = results  # List[MDRefactorResult]

    def request(self, tol: float, s: float = math.inf):
        return [mdr_request(r.metadata, tol, s) for r in self.results]

    def reconstruct(self, tol: float, s: float = math.inf) -> np.ndarray:
        outs = []
        for r in self.results:
            hier = Hierarchy(r.metadata.shape)
            outs.append(mdr_reconstruct(hier, r, tol, s))
        return np.concatenate(outs, axis=self.dd_dim)

    def retrieved_bytes(self, tol: float, s: float = math.inf) -> int:
        total = 0
        for r, counts in zip(self.results, self.request(tol, s)):
            for l, c in enumerate(counts):
                total += len(r.streams[l][0])
                total += sum(len(r.streams[l][1 + b]) for b in range(c))
        return total


def mdr_refactor_dd(data, max_block_bytes: int = 2 << 30,
                    B: int = NUM_BITPLANES) -> MDRDataset:
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
        results.append(mdr_refactor(hier, block, B=B))
    return MDRDataset(arr.shape, dd_dim, edges, results)
