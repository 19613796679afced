import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops.tridiag import mass_apply, mass_solve
from mgard_tpu.ops.pallas_kernels import mass_solve_pallas


@pytest.mark.parametrize("shape,axis", [((9, 2048), 0), ((2048, 9), 1),
                                        ((9, 40, 70), 0)])
def test_pallas_thomas_matches_scan(shape, axis):
    rng = np.random.default_rng(120)
    h = Hierarchy((shape[axis],))
    lev = h.dims[0][h.L]
    b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ref = mass_solve(b, lev.offdiag, lev.divisors, axis)
    got = mass_solve_pallas(b, lev.offdiag, lev.divisors, axis,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pallas_solve_inverts_mass():
    rng = np.random.default_rng(121)
    h = Hierarchy((17,))
    lev = h.dims[0][h.L]
    v = jnp.asarray(rng.normal(size=(17, 1100)).astype(np.float32))
    b = mass_apply(v, lev.h, axis=0)
    got = mass_solve_pallas(b, lev.offdiag, lev.divisors, 0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(v), rtol=2e-4,
                               atol=2e-5)
