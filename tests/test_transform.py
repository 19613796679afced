import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import transform
from mgard_tpu.ops.tridiag import mass_apply, mass_solve


# Covers: dyadic 1-D, non-dyadic 1-D, 2-D mixed, non-dyadic 2-D, 3-D with a
# flat dim.  (Eager dispatch is very slow on this host; keep the set tight
# and jit every roundtrip.)
SHAPES = [(9,), (6,), (9, 17), (6, 7), (1, 9, 5)]


def _mass_matrix_dense(x):
    """Dense 1-D FEM mass matrix for hat functions on nodes x."""
    n = len(x)
    h = np.diff(x)
    M = np.zeros((n, n))
    for j in range(n - 1):
        M[j, j] += h[j] / 3
        M[j + 1, j + 1] += h[j] / 3
        M[j, j + 1] += h[j] / 6
        M[j + 1, j] += h[j] / 6
    return M


def test_mass_apply_matches_dense():
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 1, 9))
    v = rng.normal(size=(9, 4))
    M = _mass_matrix_dense(x)
    f = jax.jit(lambda v: mass_apply(v, np.diff(x), axis=0))
    got = np.asarray(f(jnp.asarray(v)))
    np.testing.assert_allclose(got, M @ v, rtol=1e-12)


def test_mass_solve_inverts_apply():
    rng = np.random.default_rng(2)
    h = Hierarchy((9, 5))
    lev = h.dims[0][h.L]
    v = jnp.asarray(rng.normal(size=(9, 5)))

    @jax.jit
    def f(v):
        b = mass_apply(v, lev.h, axis=0)
        return mass_solve(b, lev.offdiag, lev.divisors, axis=0)

    np.testing.assert_allclose(np.asarray(f(v)), np.asarray(v), rtol=1e-10)


@pytest.mark.parametrize("shape", SHAPES)
def test_decompose_recompose_roundtrip(shape):
    rng = np.random.default_rng(3)
    h = Hierarchy(shape)
    v = jnp.asarray(rng.normal(size=shape))
    f = jax.jit(lambda v: transform.recompose(h, transform.decompose(h, v)))
    np.testing.assert_allclose(np.asarray(f(v)), np.asarray(v), atol=1e-9)


def test_decompose_recompose_nonuniform():
    shape = (6, 9)
    rng = np.random.default_rng(4)
    coords = [np.sort(rng.uniform(0, 3, s)) for s in shape]
    h = Hierarchy(shape, coordinates=coords)
    v = jnp.asarray(rng.normal(size=shape))
    f = jax.jit(lambda v: transform.recompose(h, transform.decompose(h, v)))
    np.testing.assert_allclose(np.asarray(f(v)), np.asarray(v), atol=1e-9)


def test_decompose_exact_on_multilinear():
    # A function that is multilinear on the coarsest cells has zero detail
    # coefficients at every finer level (interpolation is exact).
    h = Hierarchy((9, 9))
    x = np.linspace(0, 1, 9)
    v = jnp.asarray(np.add.outer(2 * x, 3 * x) + 1.0)
    pyr = jax.jit(lambda v: transform.decompose(h, v))(v)
    for l in range(1, h.L + 1):
        np.testing.assert_allclose(np.asarray(pyr[l]), 0, atol=1e-12)


def test_flatten_unflatten_and_blocks_roundtrip():
    rng = np.random.default_rng(5)
    shape = (6, 9)
    h = Hierarchy(shape)
    v = jnp.asarray(rng.normal(size=shape))

    @jax.jit
    def via_flat(v):
        pyr = transform.decompose(h, v)
        flat = transform.flatten_pyramid(h, pyr)
        pyr2 = transform.unflatten_pyramid(h, flat)
        return transform.recompose(h, pyr2), flat

    @jax.jit
    def via_blocks(v):
        pyr = transform.decompose(h, v)
        blocks = transform.pyramid_to_blocks(h, pyr)
        pyr2 = transform.blocks_to_pyramid(h, blocks)
        return transform.recompose(h, pyr2)

    out, flat = via_flat(v)
    assert flat.shape == (h.ndof(),)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-9)
    out2 = via_blocks(v)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(v), atol=1e-9)
