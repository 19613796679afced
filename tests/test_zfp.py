import numpy as np
import pytest

from mgard_tpu.models.zfp import compress_zfp, decompress_zfp, BLOCK
from tests.test_compress_e2e import smooth_field


@pytest.mark.parametrize("shape", [(16, 16), (32, 32, 16), (17, 9)])
def test_fixed_rate_roundtrip(shape):
    v = smooth_field(shape, seed=110).astype(np.float32)
    buf = compress_zfp(v, rate=16)
    out = decompress_zfp(buf)
    assert out.shape == shape
    # 16 bits/value on a smooth field: small relative error
    assert np.abs(out - v).max() < 1e-2 * np.abs(v).max() + 1e-4


def test_rate_controls_size_and_error():
    shape = (32, 32)
    v = smooth_field(shape, seed=111).astype(np.float32)
    sizes, errs = [], []
    for rate in (4, 8, 16):
        buf = compress_zfp(v, rate=rate)
        sizes.append(len(buf))
        errs.append(np.abs(decompress_zfp(buf) - v).max())
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def test_rate_is_fixed():
    shape = (64, 64)
    rate = 8
    smooth = smooth_field(shape, seed=112).astype(np.float32)
    rng = np.random.default_rng(0)
    noise = rng.normal(size=shape).astype(np.float32)
    assert len(compress_zfp(smooth, rate=rate)) == \
        len(compress_zfp(noise, rate=rate))
    from mgard_tpu.models.zfp import _num_groups, _num_units
    nblocks = (64 // BLOCK) ** 2
    ngroups = _num_groups(shape)
    expected = nblocks + _num_units(shape) + 4 * rate * ngroups
    assert abs(len(compress_zfp(smooth, rate=rate)) - expected) < 64


def test_exact_at_full_rate_int_data():
    # With 32 planes kept, reconstruction matches the fixed-point rounding
    # resolution of the scheme.
    shape = (16, 16)
    v = smooth_field(shape, seed=113).astype(np.float64)
    buf = compress_zfp(v, rate=32)
    out = decompress_zfp(buf)
    assert np.abs(out - v).max() < 1e-6
