"""Pallas LPK correction kernel (ops/lpk_kernels.py) vs the dense matmul
forms — interpret mode (the TPU-compiled path is exercised by bench and
tools/verify_tpu.py; the kernel is gated off on CPU backends)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import lpk_kernels as lk
from mgard_tpu.ops import transform
from mgard_tpu.ops.tridiag import mass_apply
from mgard_tpu.ops.transform import restrict


def _mk(shape, seed=0, coords=None):
    hier = Hierarchy(shape, coordinates=coords)
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    return hier, A


@pytest.mark.parametrize("shape", [(32, 64, 128), (16, 128, 128)])
def test_rm_dim0_matches_mass_restrict(shape):
    hier, B = _mk(shape)
    L = hier.L
    lev = hier.dims[0][L]
    assert lev.front_nc is not None and lev.n == 2 * lev.front_nc
    ref = restrict(mass_apply(B, lev.h, 0), lev, 0)
    nc0 = ref.shape[0]
    out = lk.rm_dim0(hier, B, L, interpret=True)
    got = np.asarray(out)[:nc0]
    scale = float(np.abs(np.asarray(ref)).max())
    assert np.abs(got - np.asarray(ref)).max() < 1e-5 * max(scale, 1.0)


def test_rm_dim0_nonuniform():
    shape = (32, 64, 128)
    rng = np.random.default_rng(3)
    coords = []
    for s in shape:
        c = np.sort(rng.uniform(size=s))
        c[0], c[-1] = 0.0, 1.0
        coords.append(c)
    hier, B = _mk(shape, seed=2, coords=coords)
    L = hier.L
    lev = hier.dims[0][L]
    ref = restrict(mass_apply(B, lev.h, 0), lev, 0)
    out = lk.rm_dim0(hier, B, L, interpret=True)
    got = np.asarray(out)[:ref.shape[0]]
    scale = float(np.abs(np.asarray(ref)).max())
    assert np.abs(got - np.asarray(ref)).max() < 1e-5 * max(scale, 1.0)


@pytest.mark.parametrize("shape", [(32, 64, 128)])
def test_correction_fast_matches_matmul(shape):
    """rm_dim0 + [Minv0_pad, K1, K2] chain == the K-matmul correction."""
    hier, B = _mk(shape, seed=1)
    L = hier.L
    ref = transform._apply_matrix_chain(
        B, transform._correction_matrices(hier, L),
        transform._level_dims(hier, L))
    Y = lk.rm_dim0(hier, B, L, interpret=True)
    got = transform._apply_matrix_chain(
        Y, lk.correction_matrices_fast(hier, L),
        transform._level_dims(hier, L))
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-5 * max(scale, 1.0)
