"""Bit-compatibility of the ZFP fixed-rate stream codec with the
reference's ported ZFP CompressorType (round-5 VERDICT item 8).

Golden streams in tests/data were produced by the reference's own
serial build (mgard_x::zfp::encode/decode via a driver linking
/tmp/mgard_build_x); see models/zfp_stream.py for the two upstream
faithfulness notes (active inv_round; ld-as-stride addressing).
"""

import pathlib

import numpy as np
import pytest

from mgard_tpu.models import zfp_stream as Z

DATA = pathlib.Path(__file__).parent / "data"


def test_1d_f64_bitwise_golden():
    v = np.load(DATA / "golden_zfp_48_input.npy")
    g = (DATA / "golden_zfp_48_f64_r16.zfps").read_bytes()
    rec = np.fromfile(DATA / "golden_zfp_48_f64_r16.recon", dtype=np.float64)
    assert Z.zfp_encode(v, 16) == g
    assert np.array_equal(Z.zfp_decode(g, (48,), np.float64, 16), rec)


def test_2d_f32_bitwise_encode_golden():
    v = np.load(DATA / "golden_zfp_16sq_input.npy")
    g = (DATA / "golden_zfp_16sq_f32_r12.zfps").read_bytes()
    assert Z.zfp_encode(v, 12) == g
    d = Z.zfp_decode(g, (16, 16), np.float32, 12)
    # the reference's 2-D serial decoder corrupts its heap (observed),
    # so no golden recon exists; rate-distortion bound instead
    assert np.abs(d - v).max() <= 1e-3


def test_3d_f32_bitwise_golden():
    v = np.load(DATA / "golden_zfp_20cube_input.npy")
    g = (DATA / "golden_zfp_20cube_f32_r8.zfps").read_bytes()
    rec = np.fromfile(DATA / "golden_zfp_20cube_f32_r8.recon",
                      dtype=np.float32)
    assert Z.zfp_encode(v, 8) == g
    d = Z.zfp_decode(g, (20, 20, 20), np.float32, 8).reshape(-1)
    # The upstream 3-D decode only writes the (colliding) ld-stride
    # address set and leaves the rest of its output UNINITIALIZED (its
    # own roundtrip error vs the original is ~7e28); we must agree
    # bit-for-bit on every address it actually writes, and we zero the
    # rest deterministically.
    st = Z._strides((20, 20, 20), "reference")
    touched = np.zeros(20 ** 3, bool)
    for origin, extent in Z._blocks_iter((20, 20, 20)):
        touched[Z._block_addr(origin, extent, st).reshape(-1)] = True
    assert np.array_equal(d[touched], rec[touched])
    assert np.all(d[~touched] == 0)


@pytest.mark.parametrize("shape,dtype,rate", [
    ((8, 24), np.float32, 16),
    ((5, 7, 9), np.float64, 20),
    ((30,), np.float32, 12),
])
def test_correct_stride_roundtrip(shape, dtype, rate):
    """strides='correct' = true row-major zfp layout: works for every
    shape (including the ones where the upstream port is out of
    bounds) and meets the fixed-rate distortion expectation."""
    rng = np.random.default_rng(1)
    v = np.cumsum(rng.normal(size=shape), axis=-1).astype(dtype) * 0.1
    buf = Z.zfp_encode(v, rate, strides="correct")
    assert len(buf) == Z.zfp_stream_bytes(shape, rate)
    d = Z.zfp_decode(buf, shape, dtype, rate, strides="correct")
    scale = float(np.abs(v).max())
    assert np.abs(d - v).max() <= scale * 2.0 ** (6 - rate)


def test_reference_strides_reject_oob_shape():
    v = np.zeros((100, 4, 4), np.float32)
    with pytest.raises(NotImplementedError, match="out-of-bounds"):
        Z.zfp_encode(v, 8)
