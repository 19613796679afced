"""Tests pinning paths flagged untested in the round-2 review:

- SINGLEDIM through the public API over s x tol (reference
  decomposition_type::SingleDim, Types.h:19)
- main-pipeline HUFFMAN_ZLIB / HUFFMAN_ZSTD / NONE decode roundtrips
  (reference compress_memory_huffman, src/compressors.cpp:421-512)
- failure statuses: OverflowError on too-tight tolerance, ValueError on
  non-finite input (reference compress_status_type, Types.h:56-63)
- HYBRID with nonuniform coordinates (block operators derived from
  actual spacings vs. the reference's fixed 8x8x8 index tables)
"""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.config import Config, Decomposition, Lossless
from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import norms
from tests.test_compress_e2e import smooth_field


@pytest.mark.parametrize("s", [math.inf, 0.0, 1.0])
@pytest.mark.parametrize("tol", [1e-2, 1e-4])
def test_singledim_public_api(s, tol):
    import jax.numpy as jnp

    shape = (33, 17)
    v = smooth_field(shape, seed=7).astype(np.float64)
    cfg = Config(decomposition=Decomposition.SINGLEDIM)
    buf = mgard_tpu.compress(v, tol, s=s, config=cfg)
    out = mgard_tpu.decompress(buf)
    h = Hierarchy(shape)
    assert float(norms.norm(h, jnp.asarray(out - v), s)) <= tol


@pytest.mark.parametrize("lossless", [Lossless.HUFFMAN_ZLIB,
                                      Lossless.HUFFMAN_ZSTD,
                                      Lossless.NONE])
def test_host_lossless_roundtrip(lossless):
    shape = (33, 33)
    v = smooth_field(shape, seed=8).astype(np.float32)
    tol = 1e-3
    buf = mgard_tpu.compress(v, tol, config=Config(lossless=lossless))
    out = mgard_tpu.decompress(buf)
    assert np.abs(out.astype(np.float64) - v).max() <= tol


def test_overflow_status_raises():
    # f64 rides the 64-bitplane codec (ceiling 2^62) since round 4, so
    # 1e-12 on unit data now succeeds; both widths must still raise when
    # the tolerance is tight enough to exceed their integer ceilings.
    v32 = smooth_field((33, 33), seed=9).astype(np.float32)
    with pytest.raises(OverflowError):
        mgard_tpu.compress(v32, 1e-9)
    v64 = smooth_field((33, 33), seed=9).astype(np.float64)
    with pytest.raises(OverflowError):
        mgard_tpu.compress(v64, 1e-21)


def test_nonfinite_status_raises():
    v = smooth_field((33, 33), seed=10).astype(np.float32)
    v[3, 4] = np.nan
    with pytest.raises(ValueError):
        mgard_tpu.compress(v, 1e-3)


def test_nonfinite_inf_raises():
    v = smooth_field((33, 33), seed=11).astype(np.float32)
    v[0, 0] = np.inf
    with pytest.raises(ValueError):
        mgard_tpu.compress(v, 1e-3)


@pytest.mark.slow
def test_hybrid_nonuniform_linf():
    rng = np.random.default_rng(12)
    shape = (33, 33, 17)
    # adversarial spacing: exponentially clustered + jitter
    coords = []
    for nx in shape:
        t = np.sort(rng.uniform(0, 1, nx - 2))
        c = np.concatenate([[0.0], t, [1.0]]) ** 2
        coords.append(np.unique(c) if len(np.unique(c)) == nx
                      else np.linspace(0, 1, nx) ** 2)
    v = smooth_field(shape, seed=13).astype(np.float32)
    tol = 1e-3
    cfg = Config(decomposition=Decomposition.HYBRID, num_local_levels=1)
    buf = mgard_tpu.compress(v, tol, coordinates=coords, config=cfg)
    out = mgard_tpu.decompress(buf)
    assert np.abs(out.astype(np.float64) - v).max() <= tol
