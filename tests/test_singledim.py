import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import transform_singledim as sd


@pytest.mark.parametrize("shape", [(9,), (9, 17), (6, 7), (5, 9, 5)])
def test_sd_roundtrip(shape):
    rng = np.random.default_rng(130)
    h = Hierarchy(shape)
    v = jnp.asarray(rng.normal(size=shape))

    @jax.jit
    def f(v):
        coarse, slabs = sd.decompose_sd(h, v)
        return sd.recompose_sd(h, coarse, slabs)

    np.testing.assert_allclose(np.asarray(f(v)), np.asarray(v), atol=1e-9)


def test_sd_flatten_roundtrip():
    shape = (9, 17)
    rng = np.random.default_rng(131)
    h = Hierarchy(shape)
    v = jnp.asarray(rng.normal(size=shape))

    @jax.jit
    def f(v):
        coarse, slabs = sd.decompose_sd(h, v)
        flat = sd.flatten_slabs(h, coarse, slabs)
        c2, s2 = sd.unflatten_slabs(h, flat)
        return sd.recompose_sd(h, c2, s2), flat

    out, flat = f(v)
    assert flat.shape == (h.ndof(),)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-9)


def test_sd_exact_on_multilinear():
    h = Hierarchy((9, 9))
    x = np.linspace(0, 1, 9)
    v = jnp.asarray(np.add.outer(2 * x, 3 * x) + 1.0)
    coarse, slabs = jax.jit(lambda v: sd.decompose_sd(h, v))(v)
    for l in range(1, h.L + 1):
        for d, blk in slabs[l].items():
            np.testing.assert_allclose(np.asarray(blk), 0, atol=1e-12)


def test_sd_specs_cover():
    for shape in [(9, 17), (6, 7), (5, 9, 5), (1, 9, 5)]:
        h = Hierarchy(shape)
        total = sum(int(np.prod(s)) for (_, _, s) in sd.slab_specs(h))
        assert total == h.ndof(), shape
