"""Multi-chip data-parallel compression over a JAX device mesh.

The reference scales by domain decomposition: independent blocks per
GPU/rank, MPI only at the application layer (SURVEY.md section 2,
"Parallelism strategies"; doc/MGARD-X.md:285-288).  The TPU-native
equivalent is ``shard_map`` over a mesh axis: each device owns one (or
more) domain blocks and runs the full encode/decode pipeline locally;
the only collectives are

  * a ``pmax``/``psum`` for the REL-mode global norm, and
  * gathering the (tiny) per-block compressed sizes.

Round 4 (VERDICT item 3): the sharded path is no longer a fork — it
composes the SAME device pipeline as the single-chip compressor
(``Compressor.device_encode_fn``/``device_decode_fn``: PYRAMID_SEG
fused Pallas codec, grouped bitplane, hybrid/singledim decompositions,
nonuniform-coordinate operator tables) and emits per-block sections
through the same ``sections_from_outputs`` (zstd stage included), so
the container it writes is byte-compatible with the single-device
multi-block path and decodable by the public ``decompress``.

Heterogeneous blocks (Variable edges, per-block coordinate tables) do
not fit one SPMD program; those route through the multi-device MPMD
dispatch in ``api._compress_multiblock`` (device-cycled ``device_put``
+ per-shape compiled pipelines) rather than this class.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, ErrorMode, Lossless
from ..ops import bitplane
from ..models.compressor import get_compressor

__all__ = ["ShardedCompressor"]


class ShardedCompressor:
    """Data-parallel compressor: blocks stacked on a leading axis, sharded
    over a mesh axis, each block running the full single-chip pipeline.

    The global array must be reshaped host-side (or via
    ``DomainDecomposer``) into ``(num_blocks, *block_shape)`` with
    ``num_blocks`` a multiple of the mesh axis size.
    """

    def __init__(self, mesh: Mesh, axis: str, block_shape: Tuple[int, ...],
                 dtype, s: float = math.inf,
                 config: Optional[Config] = None,
                 coordinates=None):
        self.mesh = mesh
        self.axis = axis
        self.config = config or Config()
        # The SAME cached compressor the single-chip path would use for
        # one block — its jitted single-device kernels stay usable and
        # its pure pipeline composes under shard_map here.
        self.comp = get_compressor(block_shape, dtype, s=s,
                                   coordinates=coordinates,
                                   config=self.config)
        self.hier = self.comp.hier
        self.dtype = self.comp.dtype
        self.s = float(s)
        self.lossless = self.comp.lossless

        enc = self.comp.device_encode_fn()
        dec = self.comp.device_decode_fn()
        s_ = self.s
        nd = len(block_shape)
        spec_in = P(axis, *([None] * nd))
        self._spec_in = spec_in

        host_codec = self.lossless in (Lossless.HUFFMAN_ZLIB,
                                       Lossless.HUFFMAN_ZSTD,
                                       Lossless.NONE)
        self._host_codec = host_codec

        # check_vma=False: the fused Pallas codec kernels run inside the
        # per-device body, and pallas_call outputs carry no varying-mesh
        # annotation for shard_map's vma checker to consume.
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_in, P()),
            out_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
            check_vma=False,
        )
        def _enc(vb, tol):
            if vb.shape[0] == 1:
                e, w, c, st = enc(vb[0], tol[0])
                return (e[None], w[None], c.reshape(1), st.reshape(1))
            e, w, c, st = jax.lax.map(lambda v: enc(v, tol[0]), vb)
            return e, w, c, st

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P()),
            out_specs=spec_in, check_vma=False,
        )
        def _dec(e, w, tol):
            if e.shape[0] == 1:
                return dec(e[0], w[0], tol[0])[None]
            return jax.lax.map(lambda ew: dec(ew[0], ew[1], tol[0]),
                               (e, w))

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(spec_in,), out_specs=P())
        def _norm(vb):
            if math.isinf(s_):
                return jax.lax.pmax(jnp.max(jnp.abs(vb)), axis)
            sq = jnp.sum(vb.astype(jnp.float64) ** 2)
            return jnp.sqrt(jax.lax.psum(sq, axis)).astype(vb.dtype)

        self._encode = jax.jit(_enc)
        self._decode = jax.jit(_dec)
        self._norm = jax.jit(_norm)

        if host_codec:
            @functools.partial(
                jax.shard_map, mesh=mesh,
                in_specs=(spec_in, P()),
                out_specs=(P(axis, None), P(axis)),
            )
            def _enc_raw(vb, tol):
                flat, st = jax.lax.map(
                    lambda v: self.comp._quantized_flat(v, tol[0]), vb)
                return flat, st

            self._encode_raw = jax.jit(_enc_raw)

    # ------------------------------------------------------------------
    def _tol_dtype(self):
        return (jnp.float64 if self.dtype == np.dtype(np.float64)
                else jnp.float32)

    def shard_blocks(self, blocks_array):
        """Place a (num_blocks, *block) array sharded over the mesh axis."""
        sharding = NamedSharding(
            self.mesh, P(self.axis, *([None] * len(self.hier.shape))))
        return jax.device_put(jnp.asarray(blocks_array, dtype=self.dtype),
                              sharding)

    def encode(self, blocks_array, tolerance: float,
               mode: ErrorMode = ErrorMode.ABS):
        """Returns ``(exponents (B, G), words (B, cap), counts (B,),
        statuses (B,), abs block tolerance)``."""
        v = self.shard_blocks(blocks_array)
        abs_tol = float(tolerance)
        if mode == ErrorMode.REL:
            abs_tol *= float(self._norm(v))
        nblocks = v.shape[0]
        from .domain import local_abs_tol
        block_tol = local_abs_tol(abs_tol, self.s, nblocks)
        tol_arr = jnp.asarray([block_tol], dtype=self._tol_dtype())
        e, w, c, st = self._encode(v, tol_arr)
        return e, w, c, st, block_tol

    def decode(self, exponents, words, block_tol: float):
        tol_arr = jnp.asarray([block_tol], dtype=self._tol_dtype())
        return self._decode(exponents, words, tol_arr)

    # ------------------------------------------------------------------
    # Container-producing high-level path (reference general_compress
    # over subdomains, CompressionHighLevel.hpp:79-136): the sharded
    # encode runs on the mesh; the host performs the ragged gather of
    # per-block streams through the SAME sections_from_outputs as the
    # single-device compressor (zstd included) and assembles the same
    # multi-block container the public ``decompress`` reads.
    # ------------------------------------------------------------------
    @classmethod
    def for_global(cls, mesh: Mesh, axis: str, global_shape, dtype,
                   s: float = math.inf, config: Optional[Config] = None,
                   nblocks: Optional[int] = None, coordinates=None):
        """Build a compressor for a global array split into equal slabs
        along its largest dim — one (or more) per mesh device.

        Nonuniform coordinates are supported when every slab sees the
        same spacing pattern along the split dim (the operator tables
        depend only on spacings); otherwise use the MPMD multiblock path
        (``mgard_tpu.compress`` with ``config.dd_sizes``).
        """
        global_shape = tuple(int(x) for x in global_shape)
        n_dev = mesh.devices.size
        nblocks = nblocks or n_dev
        dd_dim = int(np.argmax(global_shape))
        if global_shape[dd_dim] % nblocks:
            raise ValueError(
                f"dim {dd_dim} of {global_shape} not divisible into "
                f"{nblocks} equal slabs")
        block_shape = list(global_shape)
        block_shape[dd_dim] = global_shape[dd_dim] // nblocks
        bcoords = None
        if coordinates is not None:
            bcoords = [np.asarray(c, dtype=np.float64)
                       for c in coordinates]
            cs = bcoords[dd_dim]
            n_b = block_shape[dd_dim]
            h0 = np.diff(cs[:n_b])
            for b in range(1, nblocks):
                hb = np.diff(cs[b * n_b:(b + 1) * n_b])
                if not np.allclose(h0, hb, rtol=1e-12, atol=0.0):
                    raise ValueError(
                        "slabs see different spacing patterns along the "
                        "split dim; use mgard_tpu.compress with "
                        "config.dd_sizes (MPMD multiblock) instead")
            bcoords[dd_dim] = cs[:n_b]
        sc = cls(mesh, axis, tuple(block_shape), dtype, s=s, config=config,
                 coordinates=bcoords)
        sc.global_shape = global_shape
        sc.global_coordinates = coordinates
        sc.dd_dim = dd_dim
        sc.nblocks = nblocks
        return sc

    def compress(self, data, tolerance: float,
                 mode: ErrorMode = ErrorMode.ABS) -> bytes:
        """Compress a global array into a self-describing multi-block
        container decodable by ``mgard_tpu.decompress``."""
        from ..io import format as fmt

        arr = np.asarray(data, dtype=self.dtype)
        if not hasattr(self, "global_shape"):
            raise ValueError("use ShardedCompressor.for_global(...) for "
                             "the container-producing path")
        if tuple(arr.shape) != self.global_shape:
            raise ValueError(f"expected {self.global_shape}, got {arr.shape}")
        blocks = np.stack(np.split(arr, self.nblocks, axis=self.dd_dim))

        abs_tol = float(tolerance)
        norm = 1.0
        v = self.shard_blocks(blocks)
        if mode == ErrorMode.REL:
            norm = float(self._norm(v))
            abs_tol *= norm
        from .domain import local_abs_tol
        block_tol = local_abs_tol(abs_tol, self.s, self.nblocks)
        tol_arr = jnp.asarray([block_tol], dtype=self._tol_dtype())

        sections: List[bytes] = []
        if self._host_codec:
            flat, st = self._encode_raw(v, tol_arr)
            for b in range(self.nblocks):
                from ..models.compressor import _raise_status
                _raise_status(int(st[b]))
                sections.append(self.comp._host_lossless_encode(
                    np.asarray(flat[b])))
        else:
            e, w, c, st = self._encode(v, tol_arr)
            for b in range(self.nblocks):
                sections.extend(self.comp.sections_from_outputs(
                    e[b], w[b], c[b], st[b]))

        coords = getattr(self, "global_coordinates", None)
        from ..config import Decomposition
        cfg = self.config
        dec_wire = (1 + max(1, int(cfg.num_local_levels))
                    if cfg.decomposition == Decomposition.HYBRID
                    else int(cfg.decomposition))
        header = fmt.Header(
            chunk_groups=self.comp.chunk_groups,
            dtype=self.dtype, shape=self.global_shape,
            uniform=coords is None,
            coordinates=None if coords is None else [
                np.asarray(c) for c in coords],
            error_mode=int(mode), s=self.s,
            tolerance=block_tol, norm=norm,
            lossless=int(self.lossless), n_levels=self.hier.L,
            section_sizes=(),
            dd_dim=self.dd_dim, dd_nblocks=self.nblocks,
            decomposition=dec_wire, layout=int(cfg.layout))
        return fmt.write_container(header, sections)

    def roundtrip_step(self):
        """One fully-jitted encode+decode+error step over the mesh (used by
        the multi-chip dry run and as the scaling-bench inner loop)."""
        enc, dec = self._encode, self._decode

        @jax.jit
        def step(v, tol):
            e, w, c, st = enc(v, tol)
            out = dec(e, w, tol)
            err = jnp.max(jnp.abs(out - v))
            return err, jnp.sum(c)

        return step
