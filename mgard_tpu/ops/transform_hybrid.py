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

Like the reference's fixed 8x8x8 index tables, block operators assume
uniform spacing inside a block at every local level; decompose/recompose
remain exact inverses (the decoder applies the same operators), and the
error-bound property tests cover the end-to-end guarantee.
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


def _local_decompose_level(v: jax.Array):
    """One block-local level over all non-flat dims.

    Returns (coarse, detail): detail has the padded level shape with
    exact zeros at block-coarse positions."""
    dims = [d for d in range(v.ndim) if v.shape[d] > 1]
    C = v
    for d in dims:
        C = _apply_blocked(_E, C, d, BLOCK)
    P = C
    for d in dims:
        P = _apply_blocked(_P, P, d, COARSE)
    detail = v - P
    corr = detail
    for d in dims:
        corr = _apply_blocked(_K, corr, d, BLOCK)
    return C + corr, detail


def _local_recompose_level(coarse: jax.Array, detail: jax.Array):
    dims = [d for d in range(detail.ndim) if detail.shape[d] > 1]
    corr = detail
    for d in dims:
        corr = _apply_blocked(_K, corr, d, BLOCK)
    C = coarse - corr
    P = C
    for d in dims:
        P = _apply_blocked(_P, P, d, COARSE)
    return P + detail


def decompose_hybrid(hier_coarse: Hierarchy, v: jax.Array, levels: int):
    """Hybrid decompose: ``levels`` block-local levels, then the standard
    global transform on the packed coarse residue.

    ``hier_coarse`` must be ``Hierarchy(coarse_shape(v.shape, levels))``.
    Returns (global_pyramid, details) with ``details`` finest-first."""
    shapes = padded_shape(v.shape, levels)
    details = []
    A = v
    for lvl in range(levels):
        A = _edge_pad(A, shapes[lvl])
        A, detail = _local_decompose_level(A)
        details.append(detail)
    assert tuple(A.shape) == hier_coarse.shape, (A.shape, hier_coarse.shape)
    return transform.decompose(hier_coarse, A), details


def recompose_hybrid(hier_coarse: Hierarchy, pyramid, details,
                     out_shape: Sequence[int]) -> jax.Array:
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
        A = _local_recompose_level(A, details[lvl])
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
