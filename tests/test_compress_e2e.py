"""End-to-end error-bound property tests, mirroring the reference test
strategy (tests/src/test_compress.cpp:26-75): smooth random functions,
random node spacing, sweeps over s and tolerance, asserting the achieved
error respects the bound."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.config import Config, Lossless
from mgard_tpu.hierarchy import Hierarchy


def smooth_field(shape, seed=0, octaves=3):
    """A reasonably smooth random function on the grid (reference
    generate_reasonable_function analogue): sum of separable cosines with
    random phases plus mild noise."""
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 1, s) if s > 1 else np.zeros(1) for s in shape]
    out = np.zeros(shape)
    for k in range(1, octaves + 1):
        amp = 1.0 / k**2
        term = np.ones(shape)
        for d, x in enumerate(axes):
            shp = [1] * len(shape)
            shp[d] = len(x)
            term = term * np.cos(
                np.pi * k * x + rng.uniform(0, 2 * np.pi)).reshape(shp)
        out += amp * term
    out += 0.01 * rng.normal(size=shape)
    return out


@pytest.mark.parametrize("shape", [(65,), (33, 33), (17, 17, 17), (30, 40)])
@pytest.mark.parametrize("tol", [1e-1, 1e-3])
def test_linf_bound(shape, tol):
    v = smooth_field(shape, seed=hash(shape) % 1000).astype(np.float64)
    buf = mgard_tpu.compress(v, tol, s=math.inf)
    out = mgard_tpu.decompress(buf)
    err = np.abs(out - v).max()
    assert err <= tol, (err, tol)


@pytest.mark.parametrize("s", [0.0, 1.0, -1.0])
def test_snorm_bound(s):
    # The MGARD guarantee: ||u - u'||_s <= tol, with the s-norm measured on
    # the hierarchy (reference test_compress.cpp:26-75 asserts exactly this
    # via its own norm implementation).
    import jax.numpy as jnp
    from mgard_tpu.ops import norms

    shape = (33, 33)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=5).astype(np.float64)
    tol = 1e-3
    buf = mgard_tpu.compress(v, tol, s=s)
    out = mgard_tpu.decompress(buf)
    err_norm = float(norms.norm(h, jnp.asarray(out - v), s))
    assert err_norm <= tol, (err_norm, tol)


def test_float32_roundtrip():
    shape = (33, 17)
    v = smooth_field(shape, seed=7).astype(np.float32)
    tol = 1e-2
    buf = mgard_tpu.compress(v, tol)
    out = mgard_tpu.decompress(buf)
    assert out.dtype == np.float32
    assert np.abs(out.astype(np.float64) - v).max() <= tol


def test_rel_mode():
    shape = (33, 33)
    v = 1000.0 * smooth_field(shape, seed=9)
    buf = mgard_tpu.compress(v, 1e-3, mode="rel")
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 1e-3 * np.abs(v).max()


def test_nonuniform_grid_bound():
    rng = np.random.default_rng(11)
    shape = (33, 17)
    coords = [np.sort(rng.uniform(0, 1, s)) for s in shape]
    v = smooth_field(shape, seed=12)
    buf = mgard_tpu.compress(v, 1e-2, coordinates=coords)
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 1e-2


def test_compression_actually_compresses():
    shape = (65, 65)
    v = smooth_field(shape, seed=13).astype(np.float32)
    buf = mgard_tpu.compress(v, 1e-2)
    assert len(buf) < v.nbytes / 2, (len(buf), v.nbytes)


def test_zstd_stage_smaller():
    shape = (65, 65)
    v = smooth_field(shape, seed=14).astype(np.float32)
    b0 = mgard_tpu.compress(v, 1e-3)
    b1 = mgard_tpu.compress(v, 1e-3,
                            config=Config(lossless=Lossless.BITPLANE_ZSTD))
    out = mgard_tpu.decompress(b1)
    assert np.abs(out - v).max() <= 1e-3
    assert len(b1) <= len(b0)


def test_4d_and_5d_e2e():
    # The reference supports 1..7-D (CPU) / 1..5-D (X); the transform and
    # layout machinery here is N-D generic.
    for shape in [(9, 9, 5, 5), (5, 5, 5, 3, 3)]:
        v = smooth_field(shape, seed=hash(shape) % 997)
        buf = mgard_tpu.compress(v, 1e-2)
        out = mgard_tpu.decompress(buf)
        assert np.abs(out - v).max() <= 1e-2, shape


def test_nondyadic_shape_e2e():
    shape = (50, 30)
    v = smooth_field(shape, seed=15)
    buf = mgard_tpu.compress(v, 1e-2)
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 1e-2
