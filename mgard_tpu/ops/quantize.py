"""Levelwise linear quantization of multilevel coefficients.

Implements the reference quanta exactly
(include/TensorMultilevelCoefficientQuantizer.tpp:12-55):

  * L-infinity (``s = inf``):  quantum = 2*tol / ((L+1) * (1 + 3^d))
    with ``d`` the number of non-flat dims.
  * s-norm:  per-node quantum = 2*tol / (2^{s*l} * sqrt(ndof * vol(node)))
    where ``l`` is the node's date of birth and ``vol`` the product over
    non-flat dims of half the distance between its neighbours *in the
    introducing mesh*.

Rounding is round-half-away-from-zero via ``copysign(0.5 + |x/q|, x)``
truncated (reference LinearQuantizer.tpp:20-26), which the decoder inverts
with a plain multiply.

The per-node volume factor is never materialized at fine-grid size: in the
region-blocked pyramid layout every block's quantum is a rank-1 outer
product of tiny per-dimension weight vectors, so quantization is a couple
of broadcast multiplies per block — ideal for the VPU.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..hierarchy import Hierarchy
from .transform import block_specs

__all__ = [
    "quantize_blocks", "dequantize_blocks", "supremum_quantum",
    "quantize_pyramid", "dequantize_pyramid",
]


def supremum_quantum(hier: Hierarchy, tol) -> jax.Array:
    """The uniform L-infinity quantum (reference supremum_quantum)."""
    d = hier.effective_ndim
    return (2.0 * tol) / ((hier.L + 1) * (1 + 3.0 ** d))


def _block_inv_quantum_volume(hier: Hierarchy, l: int, pos) -> List[np.ndarray]:
    """Per-dim sqrt-volume weight vectors for one block (s-norm mode)."""
    weights = []
    for d in range(hier.ndim):
        if hier.shape[d] == 1:
            weights.append(np.ones(1, dtype=np.float64))
            continue
        vol = hier.dims[d][l].volumes[np.asarray(pos[d])]
        weights.append(np.sqrt(vol))
    return weights


def _broadcast_outer(weights: Sequence[np.ndarray], dtype) -> List[jax.Array]:
    out = []
    nd = len(weights)
    for d, w in enumerate(weights):
        shp = [1] * nd
        shp[d] = len(w)
        out.append(jnp.asarray(w, dtype=dtype).reshape(shp))
    return out


def _level_weight_vectors(hier: Hierarchy, l: int):
    """Full per-dim sqrt-volume vectors over the level-l grid.  Valid for
    every node of the grid; parent positions of a detail array are zero so
    the (wrong-level) weight there multiplies zero harmlessly."""
    out = []
    for d in range(hier.ndim):
        if hier.shape[d] == 1:
            out.append(np.ones(1, dtype=np.float64))
        else:
            out.append(np.sqrt(hier.dims[d][l].volumes))
    return out


def scale_pyramid(hier: Hierarchy, pyramid, s: float, tol):
    """Multiply dense pyramid levels by their inverse quanta WITHOUT
    rounding.  Because the fine-grid assembly is a bit-exact selection
    (transform._embed_old matmul fast path), scaling per level, then
    assembling, then rounding once is identical to quantize-then-assemble
    — and keeps the assembly in float32 where the MXU can run it."""
    tol = jnp.asarray(tol)
    out = []
    for l, blk in enumerate(pyramid):
        dt = blk.dtype
        if math.isinf(s):
            out.append(blk * (1.0 / supremum_quantum(hier, tol).astype(dt)))
        else:
            scale = (2.0 ** (s * l)) * math.sqrt(hier.ndof()) / (2.0 * tol)
            scaled = blk * scale.astype(dt)
            for w in _broadcast_outer(_level_weight_vectors(hier, l), dt):
                scaled = scaled * w
            out.append(scaled)
    return out


def round_quantize(scaled: jax.Array, int_dtype=jnp.int32) -> jax.Array:
    """Round-half-away-from-zero + integer cast (the final quantize step;
    reference LinearQuantizer.tpp:20-26).

    Sign selection via where() rather than copysign(): copysign lowers
    through a signbit bitcast that, for float64, XLA's TPU x64-emulation
    pass cannot rewrite ("not contain X64 element types ... s64
    bitcast-convert") — this form compiles on TPU and produces the same
    integers (negative zero and NaN included)."""
    t = jnp.trunc(0.5 + jnp.abs(scaled))
    return jnp.where(scaled < 0, -t, t).astype(int_dtype)


def quantize_pyramid(hier: Hierarchy, pyramid, s: float, tol,
                     int_dtype=jnp.int32):
    """Quantize dense pyramid levels in place (rank-1 quanta per level).

    Same formulas as :func:`quantize_blocks`, applied to the dense level
    arrays; the result feeds ``transform.pyramid_to_fine`` for the
    physical-order stream layout."""
    tol = jnp.asarray(tol)
    out = []
    for l, blk in enumerate(pyramid):
        dt = blk.dtype
        if math.isinf(s):
            scaled = blk * (1.0 / supremum_quantum(hier, tol).astype(dt))
        else:
            scale = (2.0 ** (s * l)) * math.sqrt(hier.ndof()) / (2.0 * tol)
            scaled = blk * scale.astype(dt)
            for w in _broadcast_outer(_level_weight_vectors(hier, l), dt):
                scaled = scaled * w
        t = jnp.trunc(0.5 + jnp.abs(scaled))   # where() not copysign():
        q = jnp.where(scaled < 0, -t, t)       # see round_quantize
        out.append(q.astype(int_dtype))
    return out


def dequantize_pyramid(hier: Hierarchy, qpyramid, s: float, tol, dtype):
    tol = jnp.asarray(tol)
    out = []
    for l, q in enumerate(qpyramid):
        c = q.astype(dtype)
        if math.isinf(s):
            c = c * supremum_quantum(hier, tol).astype(dtype)
        else:
            scale = (2.0 * tol) / ((2.0 ** (s * l)) * math.sqrt(hier.ndof()))
            c = c * scale.astype(dtype)
            for w in _broadcast_outer(_level_weight_vectors(hier, l),
                                      dtype):
                c = c / w
        out.append(c)
    return out


def scale_blocks(hier: Hierarchy, blocks, s: float, tol):
    """Per-block inverse-quantum scaling WITHOUT rounding (float stage of
    :func:`quantize_blocks`; lets callers run the failure-status checks
    on floats, where overflow is still visible as inf/NaN)."""
    specs = block_specs(hier)
    tol = jnp.asarray(tol)
    out = []
    for (l, r, bshape, pos), blk in zip(specs, blocks):
        dt = blk.dtype
        if math.isinf(s):
            out.append(blk * (1.0 / supremum_quantum(hier, tol).astype(dt)))
        else:
            scale = (2.0 ** (s * l)) * math.sqrt(hier.ndof()) / (2.0 * tol)
            scaled = blk * scale.astype(dt)
            for w in _broadcast_outer(
                    _block_inv_quantum_volume(hier, l, pos), dt):
                scaled = scaled * w
            out.append(scaled)
    return out


def quantize_blocks(hier: Hierarchy, blocks, s: float, tol,
                    int_dtype=jnp.int32):
    """Quantize coefficient blocks (aligned with ``block_specs(hier)``).

    ``s`` is a static Python float (``math.inf`` for L-infinity control);
    ``tol`` may be a traced scalar.
    """
    specs = block_specs(hier)
    tol = jnp.asarray(tol)
    out = []
    for (l, r, bshape, pos), blk in zip(specs, blocks):
        dt = blk.dtype
        if math.isinf(s):
            inv_q = 1.0 / supremum_quantum(hier, tol).astype(dt)
            scaled = blk * inv_q
        else:
            scale = (2.0 ** (s * l)) * math.sqrt(hier.ndof()) / (2.0 * tol)
            scaled = blk * scale.astype(dt)
            for w in _broadcast_outer(
                    _block_inv_quantum_volume(hier, l, pos), dt):
                scaled = scaled * w
        t = jnp.trunc(0.5 + jnp.abs(scaled))   # where() not copysign():
        q = jnp.where(scaled < 0, -t, t)       # see round_quantize
        out.append(q.astype(int_dtype))
    return out


def dequantize_blocks(hier: Hierarchy, qblocks, s: float, tol, dtype):
    """Inverse of :func:`quantize_blocks`."""
    specs = block_specs(hier)
    tol = jnp.asarray(tol)
    out = []
    for (l, r, bshape, pos), q in zip(specs, qblocks):
        c = q.astype(dtype)
        if math.isinf(s):
            c = c * supremum_quantum(hier, tol).astype(dtype)
        else:
            scale = (2.0 * tol) / ((2.0 ** (s * l)) * math.sqrt(hier.ndof()))
            c = c * scale.astype(dtype)
            for w in _broadcast_outer(
                    _block_inv_quantum_volume(hier, l, pos), dtype):
                c = c / w
        out.append(c)
    return out
