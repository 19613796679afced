"""Batched tridiagonal (mass-matrix) apply and solve along one axis.

The 1-D mass matrix on a grid with spacings ``h`` is symmetric tridiagonal:

    diag    = [h0/3, (h0+h1)/3, ..., (h_{n-3}+h_{n-2})/3, h_{n-2}/3]
    offdiag = h/6

(reference ``ConstituentMassMatrix``, include/TensorMassMatrix.tpp:14-90).
The inverse applies the Thomas algorithm with divisors precomputed per level
(reference ``ConstituentMassMatrixInverse``, TensorMassMatrix.tpp:123-290).

The solve is sequential along the solve axis but embarrassingly parallel
across all other axes, so we express it as a ``lax.scan`` over the solve
axis with full planes as the element type; XLA keeps the batched work on
the VPU.  A fused Pallas kernel (lines resident in VMEM, single HBM
round-trip) is the planned fast path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mass_apply", "mass_solve"]

# Opt-in fused Pallas kernel for the solve (see ops/pallas_kernels.py);
# the lax.scan path remains the portable default.


def _to_axis0(v, axis):
    return jnp.moveaxis(v, axis, 0)


def mass_apply(v: jax.Array, h: np.ndarray, axis: int) -> jax.Array:
    """Apply the 1-D mass matrix along ``axis`` of ``v``.

    ``h``: (n-1,) spacings of this level's grid in that dimension.
    """
    n = v.shape[axis]
    if n < 2:
        raise ValueError("mass_apply requires >= 2 nodes along axis")
    dt = v.dtype
    h = jnp.asarray(h, dtype=dt)
    shp = [1] * v.ndim
    shp[axis] = n - 1
    hb = h.reshape(shp)

    lo = jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)   # v[..., :-1, ...]
    hi = jax.lax.slice_in_dim(v, 1, n, axis=axis)       # v[..., 1:, ...]
    # Contribution of each interval [x_j, x_{j+1}] to its two endpoints:
    #   left  += h/3 * v_left + h/6 * v_right
    #   right += h/6 * v_left + h/3 * v_right
    third = hb / 3
    sixth = hb / 6
    left = third * lo + sixth * hi     # goes to node j
    right = sixth * lo + third * hi    # goes to node j+1
    pad_cfg_left = [(0, 0, 0)] * v.ndim
    pad_cfg_left[axis] = (0, 1, 0)
    pad_cfg_right = [(0, 0, 0)] * v.ndim
    pad_cfg_right[axis] = (1, 0, 0)
    zero = jnp.zeros((), dtype=dt)
    return jax.lax.pad(left, zero, pad_cfg_left) + jax.lax.pad(
        right, zero, pad_cfg_right)


def mass_solve(b: jax.Array, offdiag: np.ndarray, divisors: np.ndarray,
               axis: int) -> jax.Array:
    """Solve ``M x = b`` along ``axis``; Thomas algorithm with precomputed
    divisors (the pre-eliminated diagonal).

    ``offdiag``: (n-1,) sub/super-diagonal ``h/6`` of this level's mass
    matrix.  ``divisors``: (n,) from :class:`mgard_tpu.hierarchy.DimLevel`.
    """
    n = b.shape[axis]
    if n < 2:
        raise ValueError("mass_solve requires >= 2 nodes along axis")
    dt = b.dtype
    off = jnp.asarray(np.asarray(offdiag), dtype=dt)
    div = jnp.asarray(np.asarray(divisors), dtype=dt)

    bm = _to_axis0(b, axis)

    # Forward sweep: d'_i = d_i - (off[i-1]/div[i-1]) * d'_{i-1}
    w = off / div[:-1]  # (n-1,)

    def fwd(carry, inp):
        d_i, w_i = inp
        d_new = d_i - w_i * carry
        return d_new, d_new

    d0 = bm[0]
    _, dp_rest = jax.lax.scan(fwd, d0, (bm[1:], w))
    dp = jnp.concatenate([d0[None], dp_rest], axis=0)

    # Backward sweep: x_{n-1} = d'_{n-1}/div[n-1];
    # x_i = (d'_i - off[i] * x_{i+1}) / div[i]
    def bwd(carry, inp):
        d_i, off_i, div_i = inp
        x_i = (d_i - off_i * carry) / div_i
        return x_i, x_i

    x_last = dp[-1] / div[-1]
    _, xs = jax.lax.scan(
        bwd, x_last, (dp[:-1], off, div[:-1]), reverse=True)
    x = jnp.concatenate([xs, x_last[None]], axis=0)
    return jnp.moveaxis(x, 0, axis)
