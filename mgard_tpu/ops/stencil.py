"""Shift-stencil forms of the interpolation operators.

The dense-matmul forms in :mod:`mgard_tpu.ops.transform` put the
prolongation / parent-embedding operators on the MXU because XLA's
interior pads and strided slices don't fuse on TPU.  But both operators
are 3-point stencils, and when a level is stride-2 or front-interleaved
(every level of the default "tpu" placement), the parents of a new node
sit at positions +-1 — so multilinear interpolation of the parent grid
is expressible with plain rolls and parity masks, with no deinterleave,
no pads, and no MXU passes:

    B_d(V)[x] = V[x]                                   x_d parental
              = (1-r)*V[x - e_d] + r*V[x + e_d]        x_d new

    P(C)  at every node  =  (B_{D-1} o ... o B_0)(A)          [encode]
    detail = A - P(C)   (exact zeros at all-parent nodes)

    A      = (B_{D-1} o ... o B_0)(embed(C) + detail) + detail [decode]

The encode identity holds because each B_d only ever *reads* values at
positions that are parental in dims d..D-1, which by induction already
carry the correct partial interpolation of the coarse values; rolled-in
wrap-around values are never selected (position 0 is always parental,
and the last position is parental in both stride-2 and front-interleaved
levels).  This is the role of the reference's fused GPK coefficient
kernels (include/mgard-x/DataRefactoring/MultiDimension/Coefficient/
GPKFunctor.h:13), re-derived for the VPU instead of CUDA shared memory.

Bit-compatibility: at a new node the stencil computes literally
``(1-r)*left + r*right`` in the data dtype — the same two products and
sum the dense-matmul row produces at HIGHEST precision — and parental
nodes are exact copies, so the stencil and matmul paths agree bit-for-
bit on every tested grid (see tests/test_transform.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..hierarchy import DimLevel, Hierarchy

__all__ = ["supported", "interp_all", "detail_stencil"]


def supported(hier: Hierarchy, l: int) -> bool:
    """True when every non-flat dim of level ``l`` is stride-2 or
    front-interleaved (parents of new nodes at +-1)."""
    for d in range(hier.ndim):
        if hier.shape[d] == 1:
            continue
        lev = hier.dims[d][l]
        if lev.coarse_pos is None:
            continue
        if not (lev.coarse_is_stride2 or lev.front_nc is not None):
            return False
    return True


def _interp_vectors(hier: Hierarchy, l: int):
    """Per-dim (mask, weight) float32 vectors over the level-l grid:
    mask = 1 at new nodes, weight = interpolation ratio there (host,
    cached on the hierarchy)."""
    cache = getattr(hier, "_stencil_vecs", None)
    if cache is None:
        cache = {}
        hier._stencil_vecs = cache
    if l not in cache:
        vecs = []
        for d in range(hier.ndim):
            if hier.shape[d] == 1:
                vecs.append(None)
                continue
            lev = hier.dims[d][l]
            if lev.coarse_pos is None or lev.new_pos is None \
                    or len(lev.new_pos) == 0:
                vecs.append(None)
                continue
            m = np.zeros(lev.n, dtype=np.float64)
            w = np.zeros(lev.n, dtype=np.float64)
            m[lev.new_pos] = 1.0
            w[lev.new_pos] = lev.new_ratio
            vecs.append((m, w))
        cache[l] = vecs
    return cache[l]


def _interp_dim(V: jax.Array, m: np.ndarray, w: np.ndarray,
                axis: int) -> jax.Array:
    """Apply B_d along ``axis``: lerp new positions from their +-1
    parental neighbours, keep parental positions bit-exactly."""
    dt = V.dtype
    shp = [1] * V.ndim
    shp[axis] = V.shape[axis]
    mj = jnp.asarray(m, dtype=dt).reshape(shp)
    wj = jnp.asarray(w, dtype=dt).reshape(shp)
    left = jnp.roll(V, 1, axis=axis)
    right = jnp.roll(V, -1, axis=axis)
    lerp = (1 - wj) * left + wj * right
    return jnp.where(mj != 0, lerp, V)


def interp_all(hier: Hierarchy, V: jax.Array, l: int) -> jax.Array:
    """(B_{D-1} o ... o B_0)(V): multilinear interpolation of the
    parental sub-grid onto every node of the level-l grid.  Parental
    values pass through untouched."""
    vecs = _interp_vectors(hier, l)
    for d, mv in enumerate(vecs):
        if mv is None:
            continue
        V = _interp_dim(V, mv[0], mv[1], d)
    return V


def detail_stencil(hier: Hierarchy, A: jax.Array, l: int) -> jax.Array:
    """detail = A - P(extract(A)) without materializing the coarse
    array or the prolongation: exact zeros at all-parent nodes."""
    return A - interp_all(hier, A, l)
