import math

import numpy as np
import jax.numpy as jnp

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import norms


def test_l2_norm_of_constant():
    # ||1||_{L2([0,1]^2)} = 1.
    h = Hierarchy((9, 9))
    u = jnp.ones((9, 9), dtype=jnp.float64)
    np.testing.assert_allclose(float(norms.l2_norm(h, u)), 1.0, rtol=1e-12)


def test_l2_norm_linear_function():
    # ||x||_{L2([0,1])} = 1/sqrt(3); piecewise-linear interpolant of x is x.
    h = Hierarchy((17,))
    x = jnp.linspace(0, 1, 17, dtype=jnp.float64)
    np.testing.assert_allclose(
        float(norms.l2_norm(h, x)), 1 / math.sqrt(3), rtol=1e-12)


def test_s0_equals_l2():
    rng = np.random.default_rng(20)
    h = Hierarchy((17, 9))
    u = jnp.asarray(rng.normal(size=(17, 9)))
    a = float(norms.l2_norm(h, u))
    b = float(norms.s_norm(h, u, 0.0))
    np.testing.assert_allclose(a, b, rtol=1e-8)


def test_components_sum_to_l2_squared():
    rng = np.random.default_rng(21)
    h = Hierarchy((9, 9))
    u = jnp.asarray(rng.normal(size=(9, 9)))
    comps = norms.orthogonal_component_square_norms(h, u)
    total = sum(float(c) for c in comps)
    np.testing.assert_allclose(total, float(norms.l2_norm(h, u)) ** 2,
                               rtol=1e-8)


def test_norm_dispatch():
    h = Hierarchy((9,))
    u = jnp.asarray(np.linspace(-1, 2, 9))
    assert float(norms.norm(h, u, math.inf)) == 2.0
    assert float(norms.norm(h, u, 0.0)) > 0
    assert float(norms.norm(h, u, 1.0)) > 0
