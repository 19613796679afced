"""Hybrid decomposition: block-local levels + global levels.

TPU-native counterpart of the reference's Hybrid/InCacheBlock refactoring
(include/mgard-x/CompressionLowLevel/HybridHierarchyCompressor.h:31-86,
DataRefactoring/HybridHierarchyDataRefactor.hpp, InCacheBlock/
IndexTable8x8x8.hpp): the finest level(s) of the multigrid transform are
computed *block-locally* — each 8-node span per dimension decomposes into
5 coarse nodes ({0,2,4,6,7}) and 3 detail coefficients ({1,3,5}) using
interpolation and L2 projection confined to the block — then the standard
global transform runs on the packed coarse residue.

On a GPU the win is shared-memory locality; on TPU the win is *linear*
FLOPs: every per-dim operator becomes one small (8 -> 5) matmul batched
over blocks (a reshape + dot_general), so hybrid levels cost O(n) MXU
work instead of the O(n^2) dense level matrices — the scalable path for
dims beyond transform._MATMUL_MAX_N.

On uniform grids the block operators are shared across blocks (one
(8 -> 5) matrix per dim, like the reference's fixed 8x8x8 index tables,
IndexTable8x8x8.hpp); with explicit coordinates each block gets its own
operators derived from the actual spacings (:func:`hybrid_operators`),
applied as one batched dot_general per dim.  Either way
decompose/recompose remain exact inverses (the decoder applies the same
operators), and the error-bound property tests cover the end-to-end
guarantee.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..hierarchy import Hierarchy
from . import transform

BLOCK = 8
COARSE = 5  # nodes {0, 2, 4, 6, 7} of each 8-node block
_COARSE_POS = np.array([0, 2, 4, 6, 7])
_NEW_POS = np.array([1, 3, 5])

__all__ = [
    "coarse_shape", "padded_shape", "decompose_hybrid", "recompose_hybrid",
    "flatten_hybrid", "unflatten_hybrid", "hybrid_stream_size",
    "hybrid_coords", "hybrid_operators", "hybrid_volume_weights",
]


def _local_mats():
    """(E, P, K): extract (5,8), prolong (8,5), correction (5,8) operators
    for one uniform 8-node block (reference IndexTable8x8x8 role)."""
    h = np.ones(BLOCK - 1)
    E = np.zeros((COARSE, BLOCK))
    E[np.arange(COARSE), _COARSE_POS] = 1.0
    # prolongation: coarse nodes keep values; new node 2j+1 lerps its
    # neighbours 2j, 2j+2 (uniform ratio 1/2)
    P = np.zeros((BLOCK, COARSE))
    P[_COARSE_POS, np.arange(COARSE)] = 1.0
    for k, pos in enumerate(_NEW_POS):
        P[pos, k] = 0.5      # left parent is coarse index k ({0,2,4}->0,1,2)
        P[pos, k + 1] = 0.5
    # correction: M5^{-1} R M8 with uniform mass matrices on the block
    M8 = transform._mass_matrix_np(h)
    R = P.T  # restriction is the prolongation adjoint
    hc = np.array([2.0, 2.0, 2.0, 1.0])  # coarse spacings {0,2,4,6,7}
    M5 = transform._mass_matrix_np(hc)
    K = np.linalg.solve(M5, R @ M8)
    return E, P, K


_E, _P, _K = _local_mats()


def _apply_blocked(M: np.ndarray, B: jax.Array, axis: int,
                   bsz: int) -> jax.Array:
    """Contract each length-``bsz`` block along ``axis`` with M (out, bsz)."""
    shp = B.shape
    nb = shp[axis] // bsz
    B2 = B.reshape(shp[:axis] + (nb, bsz) + shp[axis + 1:])
    Mj = jnp.asarray(M, dtype=B.dtype)
    out = jax.lax.dot_general(
        Mj, B2, dimension_numbers=(((1,), (axis + 1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=B.dtype)
    out = jnp.moveaxis(out, 0, axis + 1)
    return out.reshape(shp[:axis] + (nb * M.shape[0],) + shp[axis + 1:])


def _pad8(n: int) -> int:
    return -(-n // BLOCK) * BLOCK


def _pad_coords(c: np.ndarray, target: int) -> np.ndarray:
    """Extend a coordinate vector to ``target`` entries by continuing the
    last spacing (edge-padded VALUES are synthetic; zero spacings would
    make block mass matrices singular)."""
    if len(c) >= target:
        return c[:target]
    step = c[-1] - c[-2] if len(c) > 1 else 1.0
    extra = c[-1] + step * np.arange(1, target - len(c) + 1)
    return np.concatenate([c, extra])


def hybrid_coords(shape: Sequence[int], levels: int, coordinates):
    """Per-local-level padded coordinate vectors, one list per level
    (finest/input first, ``levels + 1`` entries: the last is the packed
    coarse grid's coordinates, suitable for the global Hierarchy)."""
    coords = [np.asarray(c, dtype=np.float64) for c in coordinates]
    out = []
    cur = list(coords)
    shapes = padded_shape(shape, levels)
    for lvl in range(levels):
        cur = [(_pad_coords(c, t) if t > 1 else c)
               for c, t in zip(cur, shapes[lvl])]
        out.append(cur)
        cur = [(np.concatenate([c.reshape(-1, BLOCK)[:, _COARSE_POS]
                                .reshape(-1)]) if len(c) > 1 else c)
               for c in cur]
    out.append(cur)
    return out


def hybrid_operators(shape: Sequence[int], levels: int, coordinates):
    """Per (local level, dim) batched block operators derived from the
    actual node coordinates (the nonuniform counterpart of the shared
    uniform tables; reference HybridHierarchyDataRefactor assumes its
    fixed tables — here the L2 projection uses the true spacings).

    Returns ``ops[level][dim] = (E, P, K)`` with shapes
    ``(nb, 5, 8) / (nb, 8, 5) / (nb, 5, 8)``, or None for flat dims.
    """
    levels_coords = hybrid_coords(shape, levels, coordinates)
    ops = []
    for lvl in range(levels):
        per_dim = []
        for c in levels_coords[lvl]:
            if len(c) <= 1:
                per_dim.append(None)
                continue
            nb = len(c) // BLOCK
            E = np.zeros((nb, COARSE, BLOCK))
            E[:, np.arange(COARSE), _COARSE_POS] = 1.0
            P = np.zeros((nb, BLOCK, COARSE))
            P[:, _COARSE_POS, np.arange(COARSE)] = 1.0
            K = np.zeros((nb, COARSE, BLOCK))
            xb = c.reshape(nb, BLOCK)
            for b in range(nb):
                x = xb[b]
                for k, pos in enumerate(_NEW_POS):
                    xl, xr = x[pos - 1], x[pos + 1]
                    r = (x[pos] - xl) / (xr - xl)
                    P[b, pos, k] = 1.0 - r
                    P[b, pos, k + 1] = r
                M8 = transform._mass_matrix_np(np.diff(x))
                M5 = transform._mass_matrix_np(np.diff(x[_COARSE_POS]))
                K[b] = np.linalg.solve(M5, P[b].T @ M8)
            per_dim.append((E, P, K))
        ops.append(per_dim)
    return ops


def hybrid_volume_weights(shape: Sequence[int], levels: int, coordinates):
    """Per (local level, dim) sqrt-volume vectors over the padded slab
    grid for s-norm quanta: w[x] = sqrt of half the distance between
    x's neighbours in that level's mesh (the rank-1 scheme of
    ops/quantize.py applied to the local levels)."""
    levels_coords = hybrid_coords(shape, levels, coordinates)
    out = []
    for lvl in range(levels):
        per_dim = []
        for c in levels_coords[lvl]:
            if len(c) <= 1:
                per_dim.append(np.ones(1))
                continue
            vol = np.empty(len(c))
            vol[1:-1] = (c[2:] - c[:-2]) / 2
            vol[0] = (c[1] - c[0]) / 2
            vol[-1] = (c[-1] - c[-2]) / 2
            per_dim.append(np.sqrt(vol))
        out.append(per_dim)
    return out


def _apply_blocked_batched(Ms: np.ndarray, B: jax.Array, axis: int,
                           bsz: int) -> jax.Array:
    """Per-block operator apply: block b along ``axis`` is contracted
    with its own matrix ``Ms[b]`` ((out, bsz) each) via one batched
    dot_general."""
    shp = B.shape
    nb = shp[axis] // bsz
    B2 = B.reshape(shp[:axis] + (nb, bsz) + shp[axis + 1:])
    B3 = jnp.moveaxis(B2, (axis, axis + 1), (0, 1))
    Msj = jnp.asarray(Ms, dtype=B.dtype)
    out = jax.lax.dot_general(
        Msj, B3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=B.dtype)
    out = jnp.moveaxis(out, (0, 1), (axis, axis + 1))
    return out.reshape(shp[:axis] + (nb * Ms.shape[1],) + shp[axis + 1:])


def padded_shape(shape: Sequence[int], levels: int) -> List[Tuple[int, ...]]:
    """Per-local-level padded shapes, finest first (reference
    HybridHierarchyDataRefactor.hpp:40-47 shape walk)."""
    out = []
    cur = list(shape)
    for _ in range(levels):
        cur = [_pad8(n) if n > 1 else 1 for n in cur]
        out.append(tuple(cur))
        cur = [n // BLOCK * COARSE if n > 1 else 1 for n in cur]
    return out


def coarse_shape(shape: Sequence[int], levels: int) -> Tuple[int, ...]:
    cur = list(shape)
    for _ in range(levels):
        cur = [_pad8(n) // BLOCK * COARSE if n > 1 else 1 for n in cur]
    return tuple(cur)


def _edge_pad(v: jax.Array, target: Sequence[int]) -> jax.Array:
    pads = [(0, t - s) for s, t in zip(v.shape, target)]
    if any(p != (0, 0) for p in pads):
        v = jnp.pad(v, pads, mode="edge")
    return v


def _local_decompose_level(v: jax.Array, ops=None):
    """One block-local level over all non-flat dims.

    ``ops``: optional per-dim (E, P, K) batched operator tensors from
    :func:`hybrid_operators` (nonuniform grids); None uses the shared
    uniform tables.  Returns (coarse, detail): detail has the padded
    level shape with exact zeros at block-coarse positions."""
    dims = [d for d in range(v.ndim) if v.shape[d] > 1]
    C = v
    for d in dims:
        C = (_apply_blocked(_E, C, d, BLOCK) if ops is None
             else _apply_blocked_batched(ops[d][0], C, d, BLOCK))
    P = C
    for d in dims:
        P = (_apply_blocked(_P, P, d, COARSE) if ops is None
             else _apply_blocked_batched(ops[d][1], P, d, COARSE))
    detail = v - P
    corr = detail
    for d in dims:
        corr = (_apply_blocked(_K, corr, d, BLOCK) if ops is None
                else _apply_blocked_batched(ops[d][2], corr, d, BLOCK))
    return C + corr, detail


def _local_recompose_level(coarse: jax.Array, detail: jax.Array, ops=None):
    dims = [d for d in range(detail.ndim) if detail.shape[d] > 1]
    corr = detail
    for d in dims:
        corr = (_apply_blocked(_K, corr, d, BLOCK) if ops is None
                else _apply_blocked_batched(ops[d][2], corr, d, BLOCK))
    C = coarse - corr
    P = C
    for d in dims:
        P = (_apply_blocked(_P, P, d, COARSE) if ops is None
             else _apply_blocked_batched(ops[d][1], P, d, COARSE))
    return P + detail


def decompose_hybrid(hier_coarse: Hierarchy, v: jax.Array, levels: int,
                     ops=None):
    """Hybrid decompose: ``levels`` block-local levels, then the standard
    global transform on the packed coarse residue.

    ``hier_coarse`` must be ``Hierarchy(coarse_shape(v.shape, levels))``;
    ``ops`` comes from :func:`hybrid_operators` for nonuniform grids.
    Returns (global_pyramid, details) with ``details`` finest-first."""
    shapes = padded_shape(v.shape, levels)
    details = []
    A = v
    for lvl in range(levels):
        A = _edge_pad(A, shapes[lvl])
        A, detail = _local_decompose_level(
            A, None if ops is None else ops[lvl])
        details.append(detail)
    assert tuple(A.shape) == hier_coarse.shape, (A.shape, hier_coarse.shape)
    return transform.decompose(hier_coarse, A), details


def recompose_hybrid(hier_coarse: Hierarchy, pyramid, details,
                     out_shape: Sequence[int], ops=None) -> jax.Array:
    """Exact inverse of :func:`decompose_hybrid` (sliced to out_shape)."""
    shapes = padded_shape(out_shape, len(details))
    # pre-pad input shape of each local level: the original domain for
    # level 0, the packed coarse of the next-finer level otherwise
    pre = [tuple(out_shape)]
    for lvl in range(1, len(details)):
        pre.append(tuple(n // BLOCK * COARSE if n > 1 else 1
                         for n in shapes[lvl - 1]))
    A = transform.recompose(hier_coarse, pyramid)
    for lvl in range(len(details) - 1, -1, -1):
        A = _local_recompose_level(A, details[lvl],
                                   None if ops is None else ops[lvl])
        A = A[tuple(slice(0, n) for n in pre[lvl])]
    return A


def hybrid_stream_size(shape: Sequence[int], levels: int) -> int:
    """Total values in the serialized hybrid stream."""
    n = int(np.prod(coarse_shape(shape, levels)))
    for s in padded_shape(shape, levels):
        n += int(np.prod(s))
    return n


def flatten_hybrid(hier_coarse: Hierarchy, pyramid, details) -> jax.Array:
    """Serialize: global fine-order stream first, then detail slabs
    finest-first (each a full padded slab; block-coarse positions are
    exact zeros that the entropy stage elides)."""
    fine = transform.pyramid_to_fine(hier_coarse, pyramid).reshape(-1)
    return jnp.concatenate([fine] + [d.reshape(-1) for d in details])


def unflatten_hybrid(hier_coarse: Hierarchy, flat: jax.Array,
                     shape: Sequence[int], levels: int):
    shapes = padded_shape(shape, levels)
    n0 = hier_coarse.ndof()
    fine = jax.lax.slice_in_dim(flat, 0, n0).reshape(hier_coarse.shape)
    pyramid = transform.fine_to_pyramid(hier_coarse, fine)
    details = []
    off = n0
    for s in shapes:
        size = int(np.prod(s))
        details.append(
            jax.lax.slice_in_dim(flat, off, off + size).reshape(s))
        off += size
    return pyramid, details
