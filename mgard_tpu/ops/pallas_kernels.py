"""Pallas TPU kernels for the hot transform ops.

The batched tridiagonal (Thomas) solve is the transform's only
serial-dependency op.  The XLA `lax.scan` version makes 2n tiny steps with
the carry bouncing through HBM-visible buffers; this kernel keeps a
(n, TILE_B) tile of right-hand sides resident in VMEM, runs the forward
and backward recurrences in-register over the batch lanes, and touches HBM
exactly once per element in each direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 1024  # batch lanes per grid step ((8, 128) VPU tiles)


def _thomas_kernel(w_ref, off_ref, divinv_ref, x_ref, out_ref, d_ref):
    """One (n, TILE_B) tile: forward eliminate into scratch, back-substitute
    into out.  w = off/div (precomputed), divinv = 1/div."""
    n = x_ref.shape[0]

    d_ref[0, :] = x_ref[0, :]

    def fwd(i, _):
        d_ref[i, :] = x_ref[i, :] - w_ref[i - 1] * d_ref[i - 1, :]
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)

    out_ref[n - 1, :] = d_ref[n - 1, :] * divinv_ref[n - 1]

    def bwd(k, _):
        i = n - 2 - k
        out_ref[i, :] = (d_ref[i, :] - off_ref[i] * out_ref[i + 1, :]) \
            * divinv_ref[i]
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def thomas_solve_2d(x: jax.Array, w: jax.Array, off: jax.Array,
                    divinv: jax.Array, interpret: bool = False) -> jax.Array:
    """Solve the tridiagonal systems along axis 0 of ``x`` (n, B).

    ``w`` = off/div (n-1,), ``off`` (n-1,), ``divinv`` = 1/div (n,): the
    precomputed Thomas factorization of the symmetric mass matrix.
    B must be a multiple of TILE_B (pad before calling).
    """
    n, B = x.shape
    assert B % TILE_B == 0
    grid = (B // TILE_B,)
    return pl.pallas_call(
        _thomas_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # w (n-1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # off (n-1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # divinv (n,)
            pl.BlockSpec((n, TILE_B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, TILE_B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, TILE_B), x.dtype)],
        interpret=interpret,
    )(w, off, divinv, x)


def mass_solve_pallas(b: jax.Array, offdiag: np.ndarray,
                      divisors: np.ndarray, axis: int,
                      interpret: bool = False) -> jax.Array:
    """Drop-in for ops.tridiag.mass_solve using the fused kernel.

    Moves ``axis`` to the front, flattens the batch, pads it to TILE_B,
    and runs the kernel; the moveaxis transposes are XLA copies.
    """
    dt = b.dtype
    n = b.shape[axis]
    off = np.asarray(offdiag, dtype=dt)
    div = np.asarray(divisors, dtype=dt)
    w = jnp.asarray(off / div[:-1])
    offj = jnp.asarray(off)
    divinv = jnp.asarray(1.0 / div)

    bm = jnp.moveaxis(b, axis, 0)
    batch_shape = bm.shape[1:]
    B = int(np.prod(batch_shape)) if batch_shape else 1
    x2 = bm.reshape(n, B)
    Bp = -(-B // TILE_B) * TILE_B
    if Bp != B:
        x2 = jnp.concatenate(
            [x2, jnp.zeros((n, Bp - B), dtype=dt)], axis=1)
    out = thomas_solve_2d(x2, w, offj, divinv, interpret=interpret)
    out = out[:, :B].reshape((n,) + batch_shape)
    return jnp.moveaxis(out, 0, axis)
