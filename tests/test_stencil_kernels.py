"""Pallas GPK stencil kernels (ops/stencil_kernels.py) vs the dense
matmul forms — interpret mode (the TPU-compiled path is exercised by
bench/probe runs; the kernels are gated off on CPU backends)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import transform, stencil_kernels as sk


def _mk(shape, seed=0, coords=None):
    hier = Hierarchy(shape, coordinates=coords)
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    return hier, A


@pytest.mark.parametrize("shape", [(8, 256, 128), (16, 128, 256)])
def test_gpk_detail_matches_matmul(shape):
    hier, A = _mk(shape)
    L = hier.L
    det_mm = A - transform._prolong_all(
        hier, transform._extract_old_all(hier, A, L), L)
    det_k = sk.gpk_detail(hier, A, L, interpret=True)
    assert float(jnp.max(jnp.abs(det_mm - det_k))) < 1e-5
    # exact zeros at all-parent nodes
    p = [np.asarray(hier.dims[d][L].coarse_pos) for d in range(3)]
    sel = np.ix_(p[0], p[1], p[2])
    assert np.all(np.asarray(det_k)[sel] == 0.0)


@pytest.mark.parametrize("shape", [(8, 256, 128), (16, 128, 256)])
def test_gpk_prolong_add_matches_matmul(shape):
    hier, A = _mk(shape, seed=1)
    L = hier.L
    C = transform._extract_old_all(hier, A, L)
    detail = A - transform._prolong_all(hier, C, L)
    A_mm = transform._prolong_all(hier, C, L) + detail
    A_k = sk.gpk_prolong_add(hier, C, detail, L, interpret=True)
    assert float(jnp.max(jnp.abs(A_mm - A_k))) < 1e-5


def test_gpk_roundtrip_nonuniform():
    shape = (8, 256, 128)
    rng = np.random.default_rng(3)
    coords = []
    for s in shape:
        c = np.sort(rng.uniform(size=s))
        c[0], c[-1] = 0.0, 1.0
        coords.append(c)
    hier, A = _mk(shape, seed=2, coords=coords)
    L = hier.L
    det = sk.gpk_detail(hier, A, L, interpret=True)
    C = transform._extract_old_all(hier, A, L)
    A2 = sk.gpk_prolong_add(hier, C, det, L, interpret=True)
    scale = float(jnp.max(jnp.abs(A)))
    assert float(jnp.max(jnp.abs(A2 - A))) < 1e-5 * scale


@pytest.mark.parametrize("shape", [(8, 256, 128), (16, 128, 256),
                                   (32, 256, 128)])
def test_fused_detail_bit_identical_to_two_pass(shape):
    """The fused single-pass encode kernel must reproduce the two-pass
    form (B20 then B1-sub through an HBM intermediate) bit for bit —
    the decode side inverts the same lerp expressions."""
    hier, A = _mk(shape, seed=4)
    L = hier.L
    v0 = sk._run_b20(A, hier, L, interpret=True)
    two = sk._run_b1sub(v0, A, hier, L, interpret=True)
    fused = sk._run_fused_detail(A, hier, L, interpret=True)
    assert np.array_equal(np.asarray(two), np.asarray(fused))


@pytest.mark.parametrize("shape", [(8, 256, 128), (16, 128, 256),
                                   (32, 256, 128)])
def test_fused_prolong_add_bit_identical_to_two_pass(shape):
    hier, A = _mk(shape, seed=5)
    L = hier.L
    C = transform._extract_old_all(hier, A, L)
    detail = sk.gpk_detail(hier, A, L, interpret=True)
    c2 = sk._embed2(C, hier, L)
    v0 = sk._run_dec_b20(c2, hier, L, interpret=True)
    two = sk._run_dec_b1add(v0, detail, hier, L, interpret=True)
    fused = sk._run_fused_prolong_add(c2, detail, hier, L,
                                      interpret=True)
    assert np.array_equal(np.asarray(two), np.asarray(fused))


def test_gpk_supported_predicate():
    # 2^k cube: supported for encode and decode at the finest level
    h = Hierarchy((8, 256, 128))
    # CPU backend: predicate must gate the kernels off
    assert not sk.gpk_supported(h, h.L, decode=False) \
        or jax.default_backend() == "tpu"
    # structural part, independent of backend
    for d in range(3):
        lev = h.dims[d][h.L]
        assert sk._dim_ok_encode(lev) and sk._dim_ok_decode(lev)
    # 2^k+1 (pure stride-2, odd): decode expansion unsupported
    h2 = Hierarchy((9, 257, 129))
    assert not sk._dim_ok_decode(h2.dims[0][h2.L])
