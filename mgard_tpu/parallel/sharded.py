"""Multi-chip data-parallel compression over a JAX device mesh.

The reference scales by domain decomposition: independent blocks per
GPU/rank, MPI only at the application layer (SURVEY.md section 2,
"Parallelism strategies"; doc/MGARD-X.md:285-288).  The TPU-native
equivalent is ``shard_map`` over a mesh axis: each device owns one (or
more) domain blocks and runs the full encode/decode pipeline locally;
the only collectives are

  * a ``pmax``/``psum`` for the REL-mode global norm, and
  * gathering the (tiny) per-block compressed sizes.

Compressed payloads stay device-local until the host assembles the
container, so nothing rides the interconnect except scalars.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, ErrorMode
from ..hierarchy import Hierarchy
from ..ops import bitplane, transform
from ..ops.quantize import dequantize_blocks, quantize_blocks

__all__ = ["ShardedCompressor"]


class ShardedCompressor:
    """Data-parallel compressor: blocks stacked on a leading axis, sharded
    over a mesh axis.

    The global array must be reshaped host-side (or via
    ``DomainDecomposer``) into ``(num_blocks, *block_shape)`` with
    ``num_blocks`` a multiple of the mesh axis size.
    """

    def __init__(self, mesh: Mesh, axis: str, block_shape: Tuple[int, ...],
                 dtype, s: float = math.inf,
                 config: Optional[Config] = None):
        self.mesh = mesh
        self.axis = axis
        self.hier = Hierarchy(block_shape)
        self.dtype = np.dtype(dtype)
        self.s = float(s)
        self.config = config or Config()

        hier = self.hier
        s_ = self.s

        def encode_one(v, tol):
            pyr = transform.decompose(hier, v)
            blocks = transform.pyramid_to_blocks(hier, pyr)
            qb = quantize_blocks(hier, blocks, s_, tol)
            flat = jnp.concatenate([q.reshape(-1) for q in qb])
            return bitplane.encode(flat)

        def decode_one(exponents, words, tol):
            flat = bitplane.decode(exponents, words, hier.ndof())
            specs = transform.block_specs(hier)
            qb = []
            off = 0
            for (_, _, bs, _) in specs:
                size = int(np.prod(bs))
                qb.append(jax.lax.slice_in_dim(
                    flat, off, off + size).reshape(bs))
                off += size
            blocks = dequantize_blocks(hier, qb, s_, tol, self.dtype)
            return transform.recompose(
                hier, transform.blocks_to_pyramid(hier, blocks))

        spec_in = P(axis, *([None] * len(block_shape)))

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(spec_in, P()),
            out_specs=(P(axis, None), P(axis, None), P(axis)),
        )
        def _enc(vb, tol):
            e, w, c = jax.vmap(lambda v: encode_one(v, tol[0]))(vb)
            return e, w, c

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P()),
            out_specs=spec_in,
        )
        def _dec(e, w, tol):
            return jax.vmap(lambda ee, ww: decode_one(ee, ww, tol[0]))(e, w)

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

    # ------------------------------------------------------------------
    def shard_blocks(self, blocks_array):
        """Place a (num_blocks, *block) array sharded over the mesh axis."""
        sharding = NamedSharding(
            self.mesh, P(self.axis, *([None] * len(self.hier.shape))))
        return jax.device_put(jnp.asarray(blocks_array, dtype=self.dtype),
                              sharding)

    def encode(self, blocks_array, tolerance: float,
               mode: ErrorMode = ErrorMode.ABS):
        """Returns (exponents (B,G), words (B,cap), counts (B,), abs_tol)."""
        v = self.shard_blocks(blocks_array)
        abs_tol = float(tolerance)
        if mode == ErrorMode.REL:
            abs_tol *= float(self._norm(v))
        nblocks = v.shape[0]
        from .domain import local_abs_tol
        block_tol = local_abs_tol(abs_tol, self.s, nblocks)
        tol_arr = jnp.asarray([block_tol], dtype=jnp.float64)
        e, w, c = self._encode(v, tol_arr)
        return e, w, c, block_tol

    def decode(self, exponents, words, block_tol: float):
        tol_arr = jnp.asarray([block_tol], dtype=jnp.float64)
        return self._decode(exponents, words, tol_arr)

    # ------------------------------------------------------------------
    # Container-producing high-level path (reference general_compress
    # over subdomains, CompressionHighLevel.hpp:79-136): the sharded
    # encode runs on the mesh, the host performs the ragged gather of
    # per-block streams (counts are per-device scalars) and assembles
    # the same multi-block container the public ``decompress`` reads.
    # ------------------------------------------------------------------
    @classmethod
    def for_global(cls, mesh: Mesh, axis: str, global_shape, dtype,
                   s: float = math.inf, config: Optional[Config] = None,
                   nblocks: Optional[int] = None):
        """Build a compressor for a global array split into equal slabs
        along its largest dim — one (or more) per mesh device."""
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
        sc = cls(mesh, axis, tuple(block_shape), dtype, s=s, config=config)
        sc.global_shape = global_shape
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
        # float64 like encode() — a float32 tol here would silently
        # loosen quanta for tight tolerances on float64 data
        tol_arr = jnp.asarray([block_tol], dtype=jnp.float64)
        e, w, c = self._encode(v, tol_arr)
        # Ragged gather: per-block true word counts are scalars; only
        # words[:count] of each block's fixed-capacity buffer is payload.
        counts = np.asarray(c)
        e_np = np.asarray(e)
        sections = []
        for b in range(self.nblocks):
            sections.append(e_np[b].tobytes())
            sections.append(
                np.asarray(w[b])[:int(counts[b])].astype("<u4").tobytes())
        header = fmt.Header(
            dtype=self.dtype, shape=self.global_shape, uniform=True,
            coordinates=None, error_mode=int(mode), s=self.s,
            tolerance=block_tol, norm=norm,
            lossless=0, n_levels=self.hier.L, section_sizes=(),
            dd_dim=self.dd_dim, dd_nblocks=self.nblocks,
            layout=1)
        return fmt.write_container(header, sections)

    def roundtrip_step(self):
        """One fully-jitted encode+decode+error step over the mesh (used by
        the multi-chip dry run and as the scaling-bench inner loop)."""
        enc, dec = self._encode, self._decode

        @jax.jit
        def step(v, tol):
            e, w, c = enc(v, tol)
            out = dec(e, w, tol)
            err = jnp.max(jnp.abs(out - v))
            return err, jnp.sum(c)

        return step
