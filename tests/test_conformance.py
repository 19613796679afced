"""Cross-configuration conformance sweep, modeled on the reference's
BatchTests (examples/mgard-x/BatchTests/BatchTests.cpp): dtype x error
mode x tolerance x codec grid; every cell must honor its bound and
roundtrip through the self-describing container."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.config import Config, Lossless
from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import norms
from tests.test_compress_e2e import smooth_field

SHAPE = (33, 33)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("mode", ["abs", "rel"])
@pytest.mark.parametrize("tol", [1e-2, 1e-4])
def test_linf_grid(dtype, mode, tol):
    v = smooth_field(SHAPE, seed=100).astype(dtype)
    buf = mgard_tpu.compress(v, tol, mode=mode)
    out = mgard_tpu.decompress(buf)
    assert out.dtype == dtype
    bound = tol * (np.abs(v).max() if mode == "rel" else 1.0)
    assert np.abs(out.astype(np.float64) - v).max() <= bound


@pytest.mark.parametrize("s", [math.inf, 0.0, 1.0, -1.0])
@pytest.mark.parametrize("lossless", [Lossless.BITPLANE,
                                      Lossless.BITPLANE_GROUP,
                                      Lossless.BITPLANE_ZSTD])
def test_codec_grid(s, lossless):
    import jax.numpy as jnp

    v = smooth_field(SHAPE, seed=101).astype(np.float64)
    tol = 1e-3
    buf = mgard_tpu.compress(v, tol, s=s, config=Config(lossless=lossless))
    out = mgard_tpu.decompress(buf)
    h = Hierarchy(SHAPE)
    assert float(norms.norm(h, jnp.asarray(out - v), s)) <= tol
