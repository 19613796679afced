"""The low-level compressor pipeline: one device, one (sub)domain.

Counterpart of ``mgard_x::Compressor``
(include/mgard-x/CompressionLowLevel/Compressor.hpp:132-292):

    CalculateNorm -> Decompose -> Quantize -> LosslessCompress -> Serialize

All device work is two jitted functions (`encode_kernel`, `decode_kernel`)
with static shapes; host code only moves the variable-length tails and
assembles the container bytes.  Compressor instances are cached per
(shape, dtype, coords, s, lossless) like the reference's CompressorCache
(include/mgard-x/CompressionLowLevel/CompressorCache.hpp:45-141).
"""

from __future__ import annotations

import functools
import math
import struct
import zlib
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, Decomposition, ErrorMode, Layout, Lossless
from ..hierarchy import Hierarchy
from ..io import format as fmt
from ..ops import bitplane, transform
from ..ops.quantize import dequantize_blocks, quantize_blocks


def _raise_status(status: int) -> None:
    """Map device-side failure flags to typed errors (the reference's
    compress_status_type, RuntimeX/DataTypes.h Types.h:56-63)."""
    if status == 1:
        raise OverflowError(
            "quantized coefficients exceed the int32 range — the "
            "tolerance is too small for this data's dynamic range")
    if status == 2:
        raise ValueError("input contains NaN or Inf values")


def _block_sizes(hier: Hierarchy) -> List[int]:
    return [int(np.prod(bs)) for (_, _, bs, _) in transform.block_specs(hier)]


class Compressor:
    """Error-bounded compressor for one fixed (shape, dtype, grid)."""

    def __init__(self, hier: Hierarchy, dtype, s: float = math.inf,
                 config: Optional[Config] = None, chunk_groups: int = 0):
        self.hier = hier
        self.dtype = np.dtype(dtype)
        self.s = float(s)
        self.config = config or Config()
        # Codec chunk width (groups per chunk) — a WIRE parameter: the
        # container header records it and decompress() builds a
        # compressor with the recorded width, so any process decodes any
        # container regardless of its own tuned default (reference
        # contract: include/format.hpp:90 populate_defaults,
        # include/compress_internal.hpp:28-60).  0 = process default.
        self.chunk_groups = int(chunk_groups) \
            or int(self.config.chunk_groups) or (
                bitplane.WIDE_CHUNK_GROUPS
                if self.dtype == np.dtype(np.float64)
                else bitplane.CHUNK_GROUPS)
        if self.dtype == np.dtype(np.float64):
            import jax as _jax
            if not _jax.config.jax_enable_x64:
                raise ValueError(
                    "float64 compression uses int64 quantization and the "
                    "64-bitplane codec; enable jax_enable_x64 first "
                    "(jax.config.update('jax_enable_x64', True))")
        # Adaptive default: per-chunk exponents need scale to pay off (a
        # chunk is 4096 values); small domains get per-group granularity.
        lossless = self.config.lossless
        if self.config.adapt_lossless and hier.ndof() < (1 << 22) \
                and self.dtype != np.dtype(np.float64):
            if lossless == Lossless.BITPLANE:
                lossless = Lossless.BITPLANE_GROUP
            elif lossless == Lossless.BITPLANE_ZSTD:
                lossless = Lossless.BITPLANE_GROUP_ZSTD
            elif lossless == Lossless.BITPLANE_LZ4:
                lossless = Lossless.BITPLANE_GROUP_LZ4
        if self.dtype == np.dtype(np.float64):
            # f64 rides the wide (64-bitplane) chunked codec
            # (bitplane.encode64) — per-chunk exponents only.
            if lossless == Lossless.BITPLANE_GROUP:
                lossless = Lossless.BITPLANE
            elif lossless == Lossless.BITPLANE_GROUP_ZSTD:
                lossless = Lossless.BITPLANE_ZSTD
            elif lossless == Lossless.BITPLANE_GROUP_LZ4:
                lossless = Lossless.BITPLANE_LZ4
        self.lossless = lossless
        # Hybrid decomposition: block-local levels on a packed coarse
        # hierarchy (reference HybridHierarchyCompressor.h:31-86).
        self._hybrid_k = 0
        self._hybrid_hc = None
        self._nstream = hier.ndof()
        if self.config.decomposition == Decomposition.MULTIDIM \
                and self.config.layout in (Layout.PYRAMID,
                                           Layout.PYRAMID_SEG):
            self._nstream = sum(
                int(np.prod(hier.shapes[l])) for l in range(hier.L + 1))
        # Segmented pyramid codec (PYRAMID_SEG): per-level chunk-aligned
        # streams with quantize+zigzag fused into the codec kernels.
        # Applies only to the chunked bitplane losslesses on f32 MULTIDIM
        # data; everything else keeps the identical-bytes PYRAMID stream
        # (the header's layout byte plus these same fields lets decode
        # make the same determination).
        self._seg_capable = (
            self.config.decomposition == Decomposition.MULTIDIM
            and self.config.layout == Layout.PYRAMID_SEG
            and self.dtype == np.dtype(np.float32))
        self._segmented = self._seg_capable and lossless.chunked
        self._seg_sizes = tuple(
            int(np.prod(hier.shapes[l])) for l in range(hier.L + 1))
        if self.config.decomposition == Decomposition.HYBRID:
            from ..ops import transform_hybrid as th
            self._hybrid_k = max(1, int(self.config.num_local_levels))
            coords = hier.coordinates
            lc = th.hybrid_coords(hier.shape, self._hybrid_k, coords)
            # The packed block-coarse grid is non-uniformly spaced even on
            # uniform input ({0,2,4,6,7} of each block), so the global
            # hierarchy always carries explicit coordinates — the s-norm
            # volume quanta and interpolation ratios then come out right.
            self._hybrid_hc = Hierarchy(
                th.coarse_shape(hier.shape, self._hybrid_k),
                coordinates=lc[-1])
            self._hybrid_ops = (None if hier.uniform else
                                th.hybrid_operators(hier.shape,
                                                    self._hybrid_k, coords))
            self._hybrid_vols = th.hybrid_volume_weights(
                hier.shape, self._hybrid_k, coords)
            self._nstream = th.hybrid_stream_size(hier.shape, self._hybrid_k)
        grouped = lossless.grouped
        self._encode = jax.jit(functools.partial(self._encode_impl,
                                                 grouped=grouped))
        self._decode = self._decode_fn(grouped, self._segmented)
        # Host-side lossless paths (reference-compatible Huffman, raw):
        # the device kernel stops at the quantized stream.
        self._encode_raw = jax.jit(self._quantized_flat)
        self._decode_raw = jax.jit(self._flat_to_array)
        self._norm = jax.jit(self._norm_impl)

    # ------------------------------------------------------------------
    # jitted kernels
    # ------------------------------------------------------------------
    def _hybrid_quantum(self, tol):
        """L-inf quantum with the total (local + global) level count in
        the amplification denominator (reference formula,
        TensorMultilevelCoefficientQuantizer.tpp:13-25)."""
        d = self.hier.effective_ndim
        L_total = self._hybrid_hc.L + self._hybrid_k
        return (2.0 * jnp.asarray(tol)) / ((L_total + 1) * (1 + 3.0 ** d))

    def _hybrid_scale(self, pyr, details, tol, inverse: bool):
        """(De)scale the hybrid stream's quanta.

        L-inf: one scalar quantum with the total (local + global) level
        count.  Finite s: the standard levelwise volume quanta on the
        coarse hierarchy (its ndof corrected to the full stream's), and
        rank-1 volume quanta on each local detail slab at total level
        index Lc + k - i (reference
        HybridHierarchyLinearQuantization.hpp role).
        """
        from ..ops.quantize import scale_pyramid
        hc = self._hybrid_hc
        k = self._hybrid_k
        if math.isinf(self.s):
            q = self._hybrid_quantum(tol)
            f = (q if inverse else 1.0 / q).astype(self.dtype)
            return [p * f for p in pyr], [d * f for d in details]
        n_total = float(self._nstream)
        tol_eff = jnp.asarray(tol) * math.sqrt(hc.ndof() / n_total)
        if inverse:
            from ..ops.quantize import dequantize_pyramid
            pyr = dequantize_pyramid(hc, pyr, self.s, tol_eff, self.dtype)
        else:
            pyr = scale_pyramid(hc, pyr, self.s, tol_eff)
        out_details = []
        for i, d in enumerate(details):
            l_i = hc.L + k - i
            base = (2.0 ** (self.s * l_i)) * math.sqrt(n_total) \
                / (2.0 * jnp.asarray(tol))
            scaled = d
            factor = base.astype(d.dtype)
            if inverse:
                scaled = scaled / factor
            else:
                scaled = scaled * factor
            for dim, w in enumerate(self._hybrid_vols[i]):
                shp = [1] * d.ndim
                shp[dim] = len(w)
                wj = jnp.asarray(w, dtype=d.dtype).reshape(shp)
                scaled = scaled / wj if inverse else scaled * wj
            out_details.append(scaled)
        return pyr, out_details

    def _quantized_flat(self, v: jax.Array, tol: jax.Array):
        """Decompose + quantize -> (flat int32 stream, overflow flag)."""
        hier = self.hier
        if self.config.decomposition == Decomposition.HYBRID:
            from ..ops import transform_hybrid as th
            pyr, details = th.decompose_hybrid(self._hybrid_hc, v,
                                               self._hybrid_k,
                                               ops=self._hybrid_ops)
            pyr, details = self._hybrid_scale(pyr, details, tol,
                                              inverse=False)
            scaledf = th.flatten_hybrid(self._hybrid_hc, pyr, details)
        elif self.config.decomposition == Decomposition.SINGLEDIM:
            from ..ops import transform_singledim as sd
            coarse, slabs = sd.decompose_sd(hier, v)
            coarse, slabs = sd.scale_slabs(hier, coarse, slabs, self.s, tol)
            scaledf = sd.flatten_slabs(hier, coarse, slabs)
        elif self.config.layout in (Layout.PYRAMID, Layout.PYRAMID_SEG):
            from ..ops.quantize import scale_pyramid
            pyr = transform.decompose(hier, v)
            spyr = scale_pyramid(hier, pyr, self.s, tol)
            scaledf = jnp.concatenate([p.reshape(-1) for p in spyr])
        elif self.config.layout == Layout.FINE:
            from ..ops.quantize import scale_pyramid
            pyr = transform.decompose(hier, v)
            spyr = scale_pyramid(hier, pyr, self.s, tol)
            scaledf = transform.pyramid_to_fine(hier, spyr).reshape(-1)
        else:
            from ..ops.quantize import scale_blocks
            pyr = transform.decompose(hier, v)
            blocks = transform.pyramid_to_blocks(hier, pyr)
            sblocks = scale_blocks(hier, blocks, self.s, tol)
            scaledf = jnp.concatenate([q.reshape(-1) for q in sblocks])
        # Failure-status guards on the FLOAT stream (after the int cast
        # overflow saturates or NaN-poisons silently).  Status codes map
        # to the reference's compress_status_type
        # (RuntimeX/DataTypes.h Types.h:56-63): 1 = quantized magnitude
        # past the integer ceiling (tolerance too tight for the dynamic
        # range; LinearQuantizer.tpp:20-26 throws), 2 = non-finite input.
        #
        # Graceful dynamic range (round-4 VERDICT item 4): float64 data
        # quantizes to int64 on device (the reference CPU path's width,
        # include/quantize.tpp, src/mgard.proto:96-113) and rides the
        # 64-bitplane codec — the ceiling moves from 2^31 to 2^62.
        # Requires jax_enable_x64 for the f64 path (tests set it).
        from ..ops.quantize import round_quantize
        wide = scaledf.dtype == jnp.float64
        flat = round_quantize(scaledf,
                              jnp.int64 if wide else jnp.int32)
        limit = np.float64(2**62) if wide else np.float64(2**31 - 1)
        amax = jnp.max(jnp.abs(scaledf))
        overflow = jnp.logical_not(amax < limit
                                   ).astype(jnp.int32)  # catches NaN too
        nonfinite = jnp.logical_not(jnp.all(jnp.isfinite(v))
                                    ).astype(jnp.int32) * 2
        return flat, jnp.maximum(overflow, nonfinite)

    def _flat_to_array(self, flat: jax.Array, tol: jax.Array) -> jax.Array:
        """Dequantize + recompose a flat int32 stream (inverse of
        :meth:`_quantized_flat`)."""
        hier = self.hier
        if self.config.decomposition == Decomposition.HYBRID:
            from ..ops import transform_hybrid as th
            pyr, details = th.unflatten_hybrid(
                self._hybrid_hc, flat.astype(self.dtype), hier.shape,
                self._hybrid_k)
            pyr, details = self._hybrid_scale(pyr, details, tol,
                                              inverse=True)
            return th.recompose_hybrid(self._hybrid_hc, pyr, details,
                                       hier.shape, ops=self._hybrid_ops)
        if self.config.decomposition == Decomposition.SINGLEDIM:
            from ..ops import transform_singledim as sd
            coarse, slabs = sd.unflatten_slabs(hier, flat)
            coarse, slabs = sd.unscale_slabs(hier, coarse, slabs, self.s,
                                             tol, self.dtype)
            return sd.recompose_sd(hier, coarse, slabs)
        if self.config.layout in (Layout.PYRAMID, Layout.PYRAMID_SEG):
            from ..ops.quantize import dequantize_pyramid
            qpyr = []
            off = 0
            for l in range(hier.L + 1):
                size = int(np.prod(hier.shapes[l]))
                qpyr.append(jax.lax.slice_in_dim(
                    flat, off, off + size).reshape(hier.shapes[l]))
                off += size
            pyr = dequantize_pyramid(hier, qpyr, self.s, tol, self.dtype)
            return transform.recompose(hier, pyr)
        if self.config.layout == Layout.FINE:
            from ..ops.quantize import dequantize_pyramid
            fine = flat.reshape(hier.shape)
            qpyr = transform.fine_to_pyramid(hier, fine)
            pyr = dequantize_pyramid(hier, qpyr, self.s, tol, self.dtype)
            return transform.recompose(hier, pyr)
        sizes = _block_sizes(hier)
        specs = transform.block_specs(hier)
        qblocks = []
        off = 0
        for size, (_, _, bs, _) in zip(sizes, specs):
            qblocks.append(jax.lax.slice_in_dim(
                flat, off, off + size).reshape(bs))
            off += size
        blocks = dequantize_blocks(hier, qblocks, self.s, tol, self.dtype)
        pyr = transform.blocks_to_pyramid(hier, blocks)
        return transform.recompose(hier, pyr)

    def _encode_impl(self, v: jax.Array, tol: jax.Array, grouped: bool):
        if self._segmented and not grouped:
            from ..ops.quantize import scale_pyramid, supremum_quantum
            pyr = transform.decompose(self.hier, v)
            if math.isinf(self.s):
                inv_q = (1.0 / supremum_quantum(self.hier, tol)
                         ).astype(jnp.float32)
                segs = pyr
            else:
                segs = scale_pyramid(self.hier, pyr, self.s, tol)
                inv_q = jnp.float32(1.0)
            return bitplane.encode_segments(segs, inv_q,
                                            C=self.chunk_groups)
        flat, overflow = self._quantized_flat(v, tol)
        if flat.dtype == jnp.int64:
            exponents, words, count = bitplane.encode64(
                flat, C=self.chunk_groups)
            return exponents, words, count, overflow
        if grouped:
            exponents, words, count = bitplane.encode_pergroup(flat)
        else:
            exponents, words, count = bitplane.encode(
                flat, C=self.chunk_groups)
        return exponents, words, count, overflow

    def device_encode_fn(self):
        """The pure (unjitted) device encode pipeline ``(v, tol) ->
        (exponents, words, count, status)`` for composition under
        shard_map/vmap (parallel/sharded.py)."""
        grouped = self.lossless.grouped
        return functools.partial(self._encode_impl, grouped=grouped)

    def device_decode_fn(self):
        """The pure (unjitted) device decode pipeline ``(exponents,
        words, tol) -> array``."""
        grouped = self.lossless.grouped
        return self._decode_impl_fn(grouped, self._segmented)

    @functools.lru_cache(maxsize=4)
    def _decode_fn(self, grouped: bool, segmented: bool = False):
        return jax.jit(self._decode_impl_fn(grouped, segmented))

    @functools.lru_cache(maxsize=4)
    def _decode_impl_fn(self, grouped: bool, segmented: bool = False):
        hier = self.hier

        def impl(exponents: jax.Array, words: jax.Array, tol: jax.Array):
            if segmented:
                from ..ops.quantize import (dequantize_pyramid,
                                            supremum_quantum)
                if math.isinf(self.s):
                    q = supremum_quantum(hier, tol).astype(jnp.float32)
                    segs = bitplane.decode_segments(
                        exponents, words, self._seg_sizes, quantum=q,
                        C=self.chunk_groups)
                    pyr = [s.reshape(hier.shapes[l])
                           for l, s in enumerate(segs)]
                else:
                    segs = bitplane.decode_segments(
                        exponents, words, self._seg_sizes,
                        C=self.chunk_groups)
                    qpyr = [s.reshape(hier.shapes[l])
                            for l, s in enumerate(segs)]
                    pyr = dequantize_pyramid(hier, qpyr, self.s, tol,
                                             self.dtype)
                return transform.recompose(hier, pyr)
            if self._wide():
                flat = bitplane.decode64(exponents, words, self._nstream,
                                         C=self.chunk_groups)
            elif grouped:
                flat = bitplane.decode_pergroup(exponents, words,
                                                self._nstream)
            else:
                flat = bitplane.decode(exponents, words, self._nstream,
                                       C=self.chunk_groups)
            return self._flat_to_array(flat, tol)
        return impl

    def _wide(self) -> bool:
        """True when this compressor's device streams are 64-bit (all
        float64 data; __init__ enforces jax_enable_x64 for f64)."""
        return self.dtype == np.dtype(np.float64)

    def _norm_impl(self, v: jax.Array):
        """Norm used for REL -> ABS conversion (reference NormCalculator,
        include/mgard-x/CompressionLowLevel/NormCalculator.hpp:12-60):
        abs-max for L-infinity control, L2 norm otherwise."""
        if math.isinf(self.s):
            return jnp.max(jnp.abs(v))
        return jnp.sqrt(jnp.sum(v.astype(jnp.float64) ** 2)).astype(v.dtype)

    # ------------------------------------------------------------------
    # host-facing API
    # ------------------------------------------------------------------
    def encode_async(self, v, abs_tol: float):
        """Dispatch the device encode without waiting; returns an opaque
        handle for :meth:`finalize_sections`.

        JAX's async dispatch makes this the pipelining primitive for the
        multiblock path (reference GPUPipelines.hpp:93 three-queue
        rotation): the caller launches block i+1's device work, then
        reads back block i — host readback/assembly of one block
        overlaps device compute of the next.
        """
        v = jnp.asarray(v, dtype=self.dtype)
        if tuple(v.shape) != self.hier.shape:
            raise ValueError(
                f"expected shape {self.hier.shape}, got {v.shape}")
        if self.lossless in (Lossless.HUFFMAN_ZLIB, Lossless.HUFFMAN_ZSTD,
                             Lossless.NONE):
            return ("raw", self._encode_raw(v, abs_tol))
        return ("bp", self._encode(v, abs_tol))

    def finalize_sections(self, handle) -> List[bytes]:
        """Read back an :meth:`encode_async` handle and build the
        container sections (host side: readback, optional zstd)."""
        kind, out = handle
        if kind == "raw":
            flat, overflow = out
            flat_np = np.asarray(flat)
            _raise_status(int(overflow))
            return [self._host_lossless_encode(flat_np)]
        return self.sections_from_outputs(*out)

    def sections_from_outputs(self, exponents, words, count,
                              overflow) -> List[bytes]:
        """Build container sections from the device encode outputs.

        Shared by the single-device path and the sharded/multi-chip path
        (parallel/sharded.py) so every producer emits identical bytes."""
        count = int(count)
        _raise_status(int(overflow))
        from ..utils import debug
        debug.check(0 <= count <= int(words.shape[0]),
                    f"encode word count {count} exceeds capacity "
                    f"{int(words.shape[0])}")
        exp_np = np.asarray(exponents)
        words_np = np.asarray(words)[:count]

        # Trailing all-zero chunks/groups carry no stream rows; drop
        # their exponent bytes (the decoder zero-fills back to the
        # static count) — with 32k-value chunks the padding would
        # otherwise dominate small containers.
        nz = np.nonzero(exp_np)[0]
        exp_np = exp_np[:int(nz[-1]) + 1] if len(nz) else exp_np[:0]
        exp_bytes = exp_np.tobytes()
        word_bytes = words_np.astype("<u4").tobytes()
        stage = self.lossless.second_stage
        if stage == "zstd":
            import zstandard
            cctx = zstandard.ZstdCompressor(level=self.config.zstd_level)
            exp_bytes = cctx.compress(exp_bytes)
            word_bytes = cctx.compress(word_bytes)
        elif stage == "lz4":
            from ..io.lz4_native import lz4_compress
            exp_bytes = lz4_compress(exp_bytes)
            word_bytes = lz4_compress(word_bytes)
        return [exp_bytes, word_bytes]

    def compress(self, v, tolerance: float,
                 mode: ErrorMode = ErrorMode.ABS) -> bytes:
        v = jnp.asarray(v, dtype=self.dtype)
        norm = 1.0
        abs_tol = float(tolerance)
        if mode == ErrorMode.REL:
            norm = float(self._norm(v))
            abs_tol = float(tolerance) * norm

        from ..utils.log import Timer
        lossless = self.lossless
        with Timer("compress (device)", v.nbytes):
            sections = self.finalize_sections(self.encode_async(v, abs_tol))

        header = fmt.Header(
            chunk_groups=self.chunk_groups,
            dtype=self.dtype, shape=self.hier.shape,
            uniform=self.hier.uniform,
            coordinates=None if self.hier.uniform else self.hier.coordinates,
            error_mode=int(mode), s=self.s, tolerance=abs_tol, norm=norm,
            lossless=int(lossless), n_levels=self.hier.L,
            section_sizes=(),
            decomposition=(1 + self._hybrid_k if self._hybrid_k
                           else int(self.config.decomposition)),
            layout=int(self.config.layout))
        return fmt.write_container(header, sections)

    # ------------------------------------------------------------------
    # host-side lossless paths (reference-compatible Huffman / raw)
    # ------------------------------------------------------------------
    def _host_lossless_encode(self, flat_np: np.ndarray) -> bytes:
        """Encode the quantized int32 stream with the selected host codec.

        HUFFMAN_ZLIB / HUFFMAN_ZSTD mirror the reference CPU back end
        (compress_memory_huffman, src/compressors.cpp:421-512): custom
        Huffman over the stream, then zlib/zstd of {tree, bits, misses}
        with a 3-size preamble.  NONE stores raw little-endian ints at
        the narrowest width that holds the stream — the reference's
        per-header quantized dtype selection (src/mgard.proto:96-113),
        carried here as a leading section byte so every block of a
        multiblock container picks its own width.
        """
        if self.lossless == Lossless.NONE:
            amax = int(np.abs(flat_np).max()) if flat_np.size else 0
            if amax <= 127:
                code, dt = 2, "<i1"
            elif amax <= 32767:
                code, dt = 1, "<i2"
            elif amax <= 2**31 - 1:
                code, dt = 0, "<i4"
            else:
                code, dt = 3, "<i8"   # reference int64 width,
                #                       src/mgard.proto:96-113
            return bytes([code]) + flat_np.astype(dt).tobytes()
        from ..io.huffman_native import huffman_encode
        tree, hit, hit_bits, miss = huffman_encode(
            flat_np.astype(np.int64))
        inner = tree + hit + miss
        if self.lossless == Lossless.HUFFMAN_ZSTD:
            import zstandard
            packed = zstandard.ZstdCompressor(
                level=self.config.zstd_level).compress(inner)
        else:
            packed = zlib.compress(inner, 6)
        return struct.pack("<QQQ", len(tree), hit_bits, len(miss)) + packed

    def _host_lossless_decode(self, payload: bytes,
                              lossless: Lossless) -> np.ndarray:
        ndof = self._nstream
        int_dt = np.int64 if self._wide() else np.int32
        if lossless == Lossless.NONE:
            dt = {0: "<i4", 1: "<i2", 2: "<i1", 3: "<i8"}[payload[0]]
            return np.frombuffer(payload, dtype=dt,
                                 offset=1).astype(int_dt)
        tree_size, hit_bits, miss_size = struct.unpack_from("<QQQ",
                                                            payload, 0)
        inner_size = tree_size + hit_bits // 8 + 4 + miss_size
        if lossless == Lossless.HUFFMAN_ZSTD:
            import zstandard
            inner = zstandard.ZstdDecompressor().decompress(
                payload[24:], max_output_size=inner_size)
        else:
            inner = zlib.decompress(payload[24:])
        from ..io.huffman_native import huffman_decode
        tree = inner[:tree_size]
        hit = inner[tree_size:tree_size + hit_bits // 8 + 4]
        miss = inner[tree_size + hit_bits // 8 + 4:]
        q = huffman_decode(tree, hit, hit_bits, miss, ndof)
        return q.astype(int_dt)

    def decompress(self, buf: bytes) -> np.ndarray:
        header, sections = fmt.read_container(buf)
        return self.decompress_parsed(header, sections)

    def decompress_parsed(self, header: fmt.Header,
                          sections: List[bytes]) -> np.ndarray:
        out = np.asarray(self.decode_async(header, sections))
        from ..utils import debug
        if debug.enabled():
            debug.check(bool(np.isfinite(out).all()),
                        "decoded output contains non-finite values")
        return out

    def decode_async(self, header: fmt.Header, sections: List[bytes]):
        """Dispatch the device decode without forcing the result to the
        host (the multiblock pipeline reads back block i while the
        device already runs block i+1)."""
        if tuple(header.shape) != self.hier.shape:
            raise ValueError("container shape mismatch")
        if header.lossless in (int(Lossless.HUFFMAN_ZLIB),
                               int(Lossless.HUFFMAN_ZSTD),
                               int(Lossless.NONE)):
            flat_np = self._host_lossless_decode(
                sections[0], Lossless(header.lossless))
            return self._decode_raw(jnp.asarray(flat_np), header.tolerance)
        exp_bytes, word_bytes = sections[0], sections[1]
        ndof = self._nstream
        hls = Lossless(header.lossless)
        grouped = hls.grouped
        segmented = self._seg_capable and hls.chunked
        C = self.chunk_groups
        if segmented:
            n_exp = sum(bitplane.num_chunks_tiled(sz, C)
                        for sz in self._seg_sizes)
            cap = bitplane.max_words_segments(self._seg_sizes, C)
        elif grouped:
            # per-group exponent arrays are padded to whole chunks
            n_exp = bitplane.num_chunks(ndof, C) * C
            cap = bitplane.max_words(ndof, C)
        elif self._wide():
            n_exp = bitplane.num_chunks64_tiled(ndof, C)
            cap = bitplane.max_words64(ndof, C)
        else:
            n_exp = bitplane.num_chunks_tiled(ndof, C)
            cap = bitplane.max_words(ndof, C)
        stage = hls.second_stage
        if stage == "zstd":
            import zstandard
            dctx = zstandard.ZstdDecompressor()
            exp_bytes = dctx.decompress(exp_bytes, max_output_size=n_exp)
            word_bytes = dctx.decompress(word_bytes, max_output_size=4 * cap)
        elif stage == "lz4":
            from ..io.lz4_native import lz4_decompress
            exp_bytes = lz4_decompress(exp_bytes, max_output_size=n_exp)
            word_bytes = lz4_decompress(word_bytes,
                                        max_output_size=4 * cap)
        exponents = np.zeros(n_exp, dtype=np.uint8)
        stored_exp = np.frombuffer(exp_bytes, dtype=np.uint8)
        exponents[:len(stored_exp)] = stored_exp
        words = np.frombuffer(word_bytes, dtype="<u4")
        words_full = np.zeros(cap, dtype=np.uint32)
        words_full[:len(words)] = words
        return self._decode_fn(grouped, segmented)(
            jnp.asarray(exponents), jnp.asarray(words_full),
            header.tolerance)


@functools.lru_cache(maxsize=32)
def _cached_compressor(shape: Tuple[int, ...], dtype_str: str, s: float,
                       coords_key, config_key,
                       chunk_groups: int = 0) -> Compressor:
    coords = None if coords_key is None else [
        np.asarray(c) for c in coords_key]
    hier = Hierarchy(shape, coordinates=coords)
    (lossless, zstd_level, decomposition, layout, num_local, adapt,
     cfg_cg) = config_key
    cfg = Config(lossless=Lossless(lossless), zstd_level=zstd_level,
                 decomposition=Decomposition(decomposition),
                 layout=Layout(layout), num_local_levels=num_local,
                 adapt_lossless=adapt, chunk_groups=cfg_cg)
    return Compressor(hier, np.dtype(dtype_str), s=s, config=cfg,
                      chunk_groups=chunk_groups)


def get_compressor(shape, dtype, s: float = math.inf, coordinates=None,
                   config: Optional[Config] = None,
                   chunk_groups: int = 0) -> Compressor:
    """Cached compressor lookup (reference HierarchyCache/CompressorCache).

    ``chunk_groups``: codec chunk width override (0 = process default) —
    per-width compiled decoders live side by side in the cache, so one
    process decodes containers written under any tuning."""
    cfg = config or Config()
    coords_key = None
    if coordinates is not None:
        coords_key = tuple(tuple(float(x) for x in c) for c in coordinates)
    return _cached_compressor(
        tuple(int(x) for x in shape), np.dtype(dtype).str, float(s),
        coords_key,
        (int(cfg.lossless), cfg.zstd_level, int(cfg.decomposition),
         int(cfg.layout), int(cfg.num_local_levels), cfg.adapt_lossless,
         int(cfg.chunk_groups)),
        int(chunk_groups))
