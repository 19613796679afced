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
