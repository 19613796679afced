"""Single-dimension-at-a-time decomposition (reference
``decomposition_type::SingleDim``, include/mgard-x/DataRefactoring/
SingleDimension/DataRefactoring.hpp:24-110).

Per level, dimensions are processed sequentially: splitting along dim d
produces that dim's detail coefficients (1-D interpolation residuals
against the d-coarsened grid) and an L2 correction along d only; the
remaining dims are then processed on the d-coarsened grid.  Compared to
the MultiDim transform this trades some compression for a simpler kernel
sequence; both share the same per-dim operator tables.

Coefficients are organized as (level, dim) slabs, each a dense array:
the "new along d, old along dims < d, full along dims > d" block.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..hierarchy import Hierarchy
from .transform import (_interleave_dim, _level_dims, extract_old, prolong,
                        restrict)
from .tridiag import mass_apply, mass_solve

__all__ = ["decompose_sd", "recompose_sd", "slab_specs",
           "flatten_slabs", "unflatten_slabs"]


def _extract_new(v, lev, axis):
    if lev.coarse_is_stride2:
        return jax.lax.slice_in_dim(v, 1, lev.n, stride=2, axis=axis)
    if lev.front_nc is not None:
        return jax.lax.slice_in_dim(
            v, 1, 2 * lev.front_nc - 1, stride=2, axis=axis)
    return jnp.take(v, jnp.asarray(lev.new_pos), axis=axis)


def decompose_sd(hier: Hierarchy, v: jax.Array):
    """Returns (coarse, slabs) with slabs[l][d] the level-l dim-d detail."""
    A = v
    slabs: List[dict] = [None] * (hier.L + 1)
    for l in range(hier.L, 0, -1):
        per_dim = {}
        for d in _level_dims(hier, l):
            lev = hier.dims[d][l]
            old = extract_old(A, lev, d)
            interp = prolong(old, lev, d)
            detail_dense = A - interp        # zero at old positions
            per_dim[d] = _extract_new(detail_dense, lev, d)
            B = mass_apply(detail_dense, lev.h, d)
            B = restrict(B, lev, d)
            clev = hier.dims[d][l - 1]
            B = mass_solve(B, clev.offdiag, clev.divisors, d)
            A = old + B
        slabs[l] = per_dim
    return A, slabs


def recompose_sd(hier: Hierarchy, coarse: jax.Array, slabs):
    A = coarse
    for l in range(1, hier.L + 1):
        for d in reversed(_level_dims(hier, l)):
            lev = hier.dims[d][l]
            nn = len(lev.new_pos)
            # dense detail: zeros at old positions, slab at new positions
            zero_old_shape = list(A.shape)
            zero_old_shape[d] = lev.coarse_pos.shape[0] \
                if lev.coarse_pos is not None else 1
            detail_dense = _interleave_dim(
                jnp.zeros(zero_old_shape, dtype=A.dtype), slabs[l][d],
                lev, d)
            B = mass_apply(detail_dense, lev.h, d)
            B = restrict(B, lev, d)
            clev = hier.dims[d][l - 1]
            B = mass_solve(B, clev.offdiag, clev.divisors, d)
            old = A - B
            A = prolong(old, lev, d) + detail_dense
    return A


def slab_specs(hier: Hierarchy):
    """Static (level, dim, shape) description of the serialized slabs."""
    specs = [(0, -1, hier.shapes[0])]
    for l in range(1, hier.L + 1):
        shape = list(hier.shapes[l])
        for d in _level_dims(hier, l):
            lev = hier.dims[d][l]
            s = list(shape)
            s[d] = len(lev.new_pos)
            specs.append((l, d, tuple(s)))
            shape[d] = len(lev.coarse_pos)
    return specs


def _slab_volume_vectors(hier: Hierarchy, l: int, d: int):
    """Per-axis sqrt-volume weight vectors for slab (l, d): axis d sits at
    the level-l new nodes, axes processed before d are already coarsened
    (level-l coarse positions), later axes span the full level-l grid
    (reference levelwise volumes, Hierarchy.h:84 _level_volumes)."""
    vecs = []
    for a in range(hier.ndim):
        if hier.shape[a] == 1:
            vecs.append(np.ones(1))
            continue
        lev = hier.dims[a][l]
        vol = lev.volumes
        if a == d:
            vol = vol[np.asarray(lev.new_pos)]
        elif a < d and lev.coarse_pos is not None:
            vol = vol[np.asarray(lev.coarse_pos)]
        vecs.append(np.sqrt(vol))
    return vecs


def scale_slabs(hier: Hierarchy, coarse, slabs, s: float, tol):
    """Inverse-quantum scaling of (coarse, slabs) for finite-s (or L-inf)
    error control — the SingleDim counterpart of quantize.scale_blocks;
    same levelwise formulas
    (TensorMultilevelCoefficientQuantizer.tpp:38-54)."""
    import math as _math

    from .quantize import supremum_quantum

    tol = jnp.asarray(tol)
    if _math.isinf(s):
        inv = 1.0 / supremum_quantum(hier, tol).astype(coarse.dtype)
        return (coarse * inv,
                [None if sl is None else {d: b * inv for d, b in sl.items()}
                 for sl in slabs])
    dt = coarse.dtype
    sq_ndof = _math.sqrt(hier.ndof())

    def w_apply(blk, vecs, scale):
        out = blk * scale.astype(dt)
        for a, w in enumerate(vecs):
            shp = [1] * blk.ndim
            shp[a] = len(w)
            out = out * jnp.asarray(w, dtype=dt).reshape(shp)
        return out

    cvecs = []
    for a in range(hier.ndim):
        if hier.shape[a] == 1:
            cvecs.append(np.ones(1))
        else:
            cvecs.append(np.sqrt(hier.dims[a][0].volumes))
    out_c = w_apply(coarse, cvecs, sq_ndof / (2.0 * tol))
    out_slabs: List[dict] = [None] * (hier.L + 1)
    for l in range(1, hier.L + 1):
        if slabs[l] is None:
            continue
        out_slabs[l] = {}
        scale = (2.0 ** (s * l)) * sq_ndof / (2.0 * tol)
        for d, blk in slabs[l].items():
            out_slabs[l][d] = w_apply(
                blk, _slab_volume_vectors(hier, l, d), scale)
    return out_c, out_slabs


def unscale_slabs(hier: Hierarchy, coarse, slabs, s: float, tol, dtype):
    """Inverse of :func:`scale_slabs` (multiplies by the quantum)."""
    import math as _math

    from .quantize import supremum_quantum

    tol = jnp.asarray(tol)
    if _math.isinf(s):
        q = supremum_quantum(hier, tol).astype(dtype)
        return (coarse.astype(dtype) * q,
                [None if sl is None else
                 {d: b.astype(dtype) * q for d, b in sl.items()}
                 for sl in slabs])
    sq_ndof = _math.sqrt(hier.ndof())

    def w_unapply(blk, vecs, scale):
        out = blk.astype(dtype) * scale.astype(dtype)
        for a, w in enumerate(vecs):
            shp = [1] * blk.ndim
            shp[a] = len(w)
            out = out / jnp.asarray(w, dtype=dtype).reshape(shp)
        return out

    cvecs = []
    for a in range(hier.ndim):
        if hier.shape[a] == 1:
            cvecs.append(np.ones(1))
        else:
            cvecs.append(np.sqrt(hier.dims[a][0].volumes))
    out_c = w_unapply(coarse, cvecs, (2.0 * tol) / sq_ndof)
    out_slabs: List[dict] = [None] * (hier.L + 1)
    for l in range(1, hier.L + 1):
        if slabs[l] is None:
            continue
        out_slabs[l] = {}
        scale = (2.0 * tol) / ((2.0 ** (s * l)) * sq_ndof)
        for d, blk in slabs[l].items():
            out_slabs[l][d] = w_unapply(
                blk, _slab_volume_vectors(hier, l, d), scale)
    return out_c, out_slabs


def flatten_slabs(hier: Hierarchy, coarse, slabs) -> jax.Array:
    parts = [coarse.reshape(-1)]
    for l in range(1, hier.L + 1):
        for d in _level_dims(hier, l):
            parts.append(slabs[l][d].reshape(-1))
    return jnp.concatenate(parts)


def unflatten_slabs(hier: Hierarchy, flat: jax.Array):
    specs = slab_specs(hier)
    coarse = None
    slabs: List[dict] = [None] * (hier.L + 1)
    off = 0
    for (l, d, shape) in specs:
        size = int(np.prod(shape))
        blk = jax.lax.slice_in_dim(flat, off, off + size).reshape(shape)
        off += size
        if l == 0:
            coarse = blk
        else:
            if slabs[l] is None:
                slabs[l] = {}
            slabs[l][d] = blk
    return coarse, slabs
