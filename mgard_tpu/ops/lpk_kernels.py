"""Pallas kernel for the mass-apply + restriction half of the correction.

Reference role: the LPK (LinearProcessingKernel) stage of MGARD-X's
CalcCorrection (include/mgard-x/DataRefactoring/MultiDimension/
Correction/LinearProcessingKernel.h, functor LPKFunctor.h) computes
``R_l (M_l detail)`` one dimension at a time before the IPK tridiagonal
solves.  Here the dim-0 pass — the one whose dense (nc, n) matmul
formulation burns the most MXU time because the array is still at full
fine size — runs as a VPU stencil: the combined ``A = R M`` operator is
a 5-tap banded matrix whose taps sit at ``2j - 2 .. 2j + 2``, so with
the fine array split into even/odd dim-0 planes the whole row is five
fused multiply-adds over contiguous (sublane, lane) slabs.  Lane and
sublane dims keep their dense-matmul forms (ops/transform.py): strided
access along those dims would scalarize, and after the dim-0 pass the
array is already halved.

Supported structure (`rm0_supported`): dim 0 refined with parents at
even positions and either the stride-2 (odd n) layout restricted to
whole 16-row blocks, or the front-interleaved ``n == 2 * front_nc``
layout (every 2^k size — the bench-critical shapes).  The output is
padded to a multiple of 8 rows; garbage rows are finite and later
annihilated by zero columns of the padded M^-1 matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hierarchy import Hierarchy

_B0 = 8      # output rows per grid step (16 input rows)
_B1 = 64     # dim-1 sublanes per grid step


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def rm0_supported(hier: Hierarchy, l: int) -> bool:
    if hier.ndim != 3:
        return False
    if jax.default_backend() != "tpu":
        return False
    lev = hier.dims[0][l]
    if lev.coarse_pos is None or lev.new_pos is None or not len(lev.new_pos):
        return False
    if not (lev.front_nc is not None and lev.n == 2 * lev.front_nc):
        return False
    n0, n1, n2 = (hier.dims[d][l].n for d in range(3))
    return n0 % 16 == 0 and n1 % _B1 == 0 and n2 % 128 == 0


def rm0_tables(hier: Hierarchy, l: int) -> np.ndarray:
    """(pad8(nc0), 128) float32 SMEM weight table.

    Rows j < fc: cols 0..4 hold the 5 taps of ``A = R M`` at columns
    ``2j - 2 .. 2j + 2``.  Row fc (the trailing coarse node of the
    front-interleaved dim): cols 0..3 hold its taps at columns
    ``n-4 .. n-1``.  Pad rows are zero.
    """
    cache = getattr(hier, "_rm0_tab", None)
    if cache is None:
        cache = {}
        hier._rm0_tab = cache
    if l not in cache:
        from .transform import _mass_matrix_np, _restriction_matrix_np
        lev = hier.dims[0][l]
        A = _restriction_matrix_np(lev) @ _mass_matrix_np(lev.h)
        nc, n = A.shape
        fc = lev.front_nc
        assert n == 2 * fc and nc == fc + 1
        meta = np.zeros((_pad8(nc), 128), dtype=np.float32)
        for j in range(fc):
            for k in range(-2, 3):
                col = 2 * j + k
                if 0 <= col < n:
                    meta[j, k + 2] = A[j, col]
        meta[fc, 0:4] = A[nc - 1, n - 4:]
        # the structural zero pattern must hold or the stencil is wrong
        chk = np.zeros_like(A)
        for j in range(fc):
            for k in range(-2, 3):
                col = 2 * j + k
                if 0 <= col < n:
                    chk[j, col] = A[j, col]
        chk[nc - 1, n - 4:] = A[nc - 1, n - 4:]
        assert np.array_equal(chk, A), "RM operator is not 5-banded"
        cache[l] = meta
    return cache[l]


def _rm0_kernel(meta_ref, prev_ref, main_ref, nxt_ref, out_ref, *,
                nblocks: int):
    i = pl.program_id(0)
    outs = []
    for r in range(_B0):
        e_j = main_ref[2 * r]
        o_j = main_ref[2 * r + 1]
        e_jm1 = main_ref[2 * r - 2] if r >= 1 else prev_ref[0]
        o_jm1 = main_ref[2 * r - 1] if r >= 1 else prev_ref[1]
        e_jp1 = main_ref[2 * r + 2] if r < _B0 - 1 else nxt_ref[0]
        acc = meta_ref[r, 0] * e_jm1
        acc += meta_ref[r, 1] * o_jm1
        acc += meta_ref[r, 2] * e_j
        acc += meta_ref[r, 3] * o_j
        acc += meta_ref[r, 4] * e_jp1
        outs.append(acc)
    v = jnp.stack(outs, axis=0)
    out_ref[:] = v

    # Trailing coarse row (front-interleaved even-n dims): row 0 of the
    # last block reads the final four fine rows of the clamped main
    # block (taps at columns n-4..n-1).
    @pl.when(i == nblocks - 1)
    def _():
        tail = (meta_ref[0, 0] * main_ref[12]
                + meta_ref[0, 1] * main_ref[13]
                + meta_ref[0, 2] * main_ref[14]
                + meta_ref[0, 3] * main_ref[15])
        out_ref[0] = tail


def rm_dim0(hier: Hierarchy, B: jax.Array, l: int,
            interpret: bool = False) -> jax.Array:
    """Apply ``R_l M_l`` along dim 0 of a dense level-l array.

    Returns (pad8(nc0), n1, n2); rows past nc0 are finite garbage.
    """
    n0, n1, n2 = B.shape
    lev = hier.dims[0][l]
    fc = lev.front_nc
    nc0 = fc + 1
    nc0p = _pad8(nc0)
    meta = rm0_tables(hier, l)
    nblocks = nc0p // _B0
    in_blocks = n0 // 16          # main input blocks of 16 rows
    grid = (nblocks, n1 // _B1)

    def main_idx(i, j, _m=in_blocks - 1):
        return (jnp.minimum(i, _m), j, 0)

    def prev_idx(i, j):
        # rows 16i-2, 16i-1 as a (2, ...) block at block index 8i-1
        return (jnp.maximum(8 * i - 1, 0), j, 0)

    def nxt_idx(i, j, _m=n0 // 2 - 1):
        # row 16i+16 as the first row of a (2, ...) block
        return (jnp.minimum(8 * i + 8, _m), j, 0)

    def meta_idx(i, j):
        # last block's weights live in its own row range; the tail row
        # (row fc) is row 0 of the final block
        return (i, 0)

    kern = functools.partial(_rm0_kernel, nblocks=nblocks)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B0, 128), meta_idx, memory_space=pltpu.SMEM),
            pl.BlockSpec((2, _B1, n2), prev_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((16, _B1, n2), main_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _B1, n2), nxt_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc0p, n1, n2), B.dtype),
        interpret=interpret,
    )(jnp.asarray(meta), B, B, B)


def minv_dense_np(lev) -> np.ndarray:
    """Dense inverse of the level's 1-D mass matrix (host, f64)."""
    from .transform import _thomas_np
    return _thomas_np(lev, np.eye(lev.n))


def correction_matrices_fast(hier: Hierarchy, l: int):
    """Matrices completing :func:`rm_dim0` into the full correction:
    ``[Minv0_pad (nc0, pad8(nc0)), K1 (nc1, n1), K2 (nc2, n2)]``."""
    cache = getattr(hier, "_corr_fast_mats", None)
    if cache is None:
        cache = {}
        hier._corr_fast_mats = cache
    if l not in cache:
        from .transform import _correction_matrices
        K = _correction_matrices(hier, l)
        levc0 = hier.dims[0][l - 1]
        nc0 = levc0.n
        Minv = minv_dense_np(levc0)
        Minv_pad = np.zeros((nc0, _pad8(nc0)), dtype=np.float64)
        Minv_pad[:, :nc0] = Minv
        cache[l] = [np.ascontiguousarray(Minv_pad), K[1], K[2]]
    return cache[l]
