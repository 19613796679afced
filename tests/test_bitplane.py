import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgard_tpu.ops import bitplane


def _roundtrip(vals):
    q = jnp.asarray(np.asarray(vals, dtype=np.int32))
    e, words, count = bitplane.encode(q)
    out = bitplane.decode(e, words, len(vals))
    np.testing.assert_array_equal(np.asarray(out), vals)
    return e, words, int(count)


def test_roundtrip_small():
    _roundtrip(np.array([0, 1, -1, 5, -17, 2**30, -(2**30), 0], np.int32))


def test_roundtrip_random():
    rng = np.random.default_rng(8)
    for n in [1, 31, 32, 33, 1000, 4096]:
        vals = rng.integers(-2**20, 2**20, size=n).astype(np.int32)
        _roundtrip(vals)


def test_all_zero_costs_nothing():
    e, words, count = _roundtrip(np.zeros(1024, np.int32))
    assert count == 0
    assert (np.asarray(e) == 0).all()


def test_small_magnitudes_compress():
    rng = np.random.default_rng(9)
    vals = rng.integers(-3, 4, size=32 * 1000).astype(np.int32)
    e, words, count = _roundtrip(vals)
    # |v| <= 3 -> zigzag <= 7 -> at most 3 bitplane rows per chunk
    nchunks = bitplane.num_chunks_tiled(len(vals))
    assert count <= 3 * nchunks * bitplane.CHUNK_GROUPS
    nbytes = bitplane.encoded_nbytes(np.asarray(e), count)
    assert nbytes < vals.nbytes / 2


def test_geometric_decay_like_real_coefficients():
    rng = np.random.default_rng(10)
    vals = (rng.laplace(scale=2.0, size=32 * 512)).astype(np.int32)
    _roundtrip(vals)


def test_jit_encode_decode():
    rng = np.random.default_rng(11)
    vals = rng.integers(-100, 100, size=2048).astype(np.int32)
    enc = jax.jit(bitplane.encode)
    e, words, count = enc(jnp.asarray(vals))
    dec = jax.jit(lambda e, w: bitplane.decode(e, w, 2048))
    out = dec(e, words)
    np.testing.assert_array_equal(np.asarray(out), vals)


def test_pergroup_roundtrip():
    rng = np.random.default_rng(12)
    for n in [1, 33, 4096, 5000]:
        vals = rng.integers(-2**20, 2**20, size=n).astype(np.int32)
        q = jnp.asarray(vals)
        e, words, count = jax.jit(bitplane.encode_pergroup)(q)
        out = jax.jit(lambda e, w: bitplane.decode_pergroup(e, w, n))(
            e, words)
        np.testing.assert_array_equal(np.asarray(out), vals)


def test_pergroup_beats_chunk_on_spatially_varying_data():
    # A field where magnitudes vary across chunks: per-group exponents
    # should cost fewer words than per-chunk exponents.
    rng = np.random.default_rng(13)
    n = 32 * 128 * 8
    scale = np.repeat(2 ** rng.integers(0, 12, size=n // 32), 32)
    vals = (rng.integers(-3, 4, size=n) * scale).astype(np.int32)
    q = jnp.asarray(vals)
    _, _, c_chunk = jax.jit(bitplane.encode)(q)
    _, _, c_group = jax.jit(bitplane.encode_pergroup)(q)
    assert int(c_group) < int(c_chunk)


def test_int32_min_edge():
    # abs(INT32_MIN) overflows int32; the codec works on uint32 magnitudes.
    vals = np.array([np.iinfo(np.int32).min + 1, -1, 1], np.int32)
    _roundtrip(vals)


# ---------------------------------------------------------------------------
# Segmented codec (PYRAMID_SEG): fused quantize + per-segment chunks
# ---------------------------------------------------------------------------

def test_segments_roundtrip_matches_reference_quantization():
    rng = np.random.default_rng(7)
    sizes = [(3, 3, 3), (5, 5, 5), (9, 9, 9), (17, 17, 17)]
    segs = [jnp.asarray(rng.standard_normal(s), dtype=jnp.float32)
            for s in sizes]
    inv_q = jnp.float32(1000.0)
    e, words, count, status = bitplane.encode_segments(segs, inv_q)
    assert int(status) == 0
    nvals = [int(np.prod(s)) for s in sizes]
    outs = bitplane.decode_segments(e, words, nvals)
    for seg, out in zip(segs, outs):
        f = np.asarray(seg).reshape(-1)
        want = np.trunc(np.copysign(0.5 + np.abs(f * 1000.0),
                                    f)).astype(np.int32)
        np.testing.assert_array_equal(np.asarray(out), want)


def test_segments_fused_dequantize_matches_plain():
    rng = np.random.default_rng(8)
    segs = [jnp.asarray(rng.standard_normal((4, 4, 4)), dtype=jnp.float32),
            jnp.asarray(rng.standard_normal((7, 7, 7)), dtype=jnp.float32)]
    inv_q = jnp.float32(250.0)
    e, words, _, _ = bitplane.encode_segments(segs, inv_q)
    nvals = [64, 343]
    plain = bitplane.decode_segments(e, words, nvals)
    fused = bitplane.decode_segments(e, words, nvals,
                                     quantum=jnp.float32(1 / 250.0))
    for p, f in zip(plain, fused):
        np.testing.assert_allclose(
            np.asarray(p).astype(np.float32) * np.float32(1 / 250.0),
            np.asarray(f), rtol=0, atol=0)


def test_segments_status_codes():
    good = jnp.asarray(np.ones((4, 4), np.float32))
    nan = jnp.asarray(np.array([[np.nan, 1.0], [2.0, 3.0]], np.float32))
    _, _, _, st = bitplane.encode_segments([good, nan], jnp.float32(10.0))
    assert int(st) == 2
    # overflow: scaled magnitude past the int32 ceiling
    _, _, _, st = bitplane.encode_segments([good], jnp.float32(2.0 ** 32))
    assert int(st) == 1
    _, _, _, st = bitplane.encode_segments([good], jnp.float32(10.0))
    assert int(st) == 0


def test_segments_zero_tail_chunks_cost_nothing():
    # a segment is padded to whole chunk tiles; the all-zero pad chunks
    # must emit no stream rows (exponent 0)
    rng = np.random.default_rng(9)
    one = jnp.asarray(rng.standard_normal(100), dtype=jnp.float32)
    e1, _, c1, _ = bitplane.encode_segments([one], jnp.float32(100.0))
    e1 = np.asarray(e1)
    assert len(e1) == bitplane.CHUNK_TILE          # tiled chunk count
    assert np.all(e1[1:] == 0)                     # pads emit nothing
    assert int(c1) == int(e1[0]) * bitplane.CHUNK_GROUPS


def test_wide_codec_roundtrip():
    """64-bitplane codec: int64 magnitudes far past the int32 ceiling."""
    rng = np.random.default_rng(9)
    n = 70000
    q = (rng.normal(size=n) * rng.choice(
        [0, 1, 2**20, 2**45, 2**55], size=n)).astype(np.int64)
    q[0] = -(2**62)
    q[1] = 2**62 - 1
    e, w, c = jax.jit(bitplane.encode64)(jnp.asarray(q))
    cap = bitplane.max_words64(n)
    wfull = jnp.zeros(cap, dtype=jnp.uint32).at[:int(c)].set(w[:int(c)])
    out = jax.jit(lambda e, w: bitplane.decode64(e, w, n))(e, wfull)
    assert np.array_equal(np.asarray(out), q)


def test_wide_device_compress_f64_tight_tol():
    """f64 unit-range data at tol=1e-12 on the DEVICE path (round-4
    VERDICT item 4: was OverflowError past int31)."""
    import math
    import mgard_tpu
    from mgard_tpu.hierarchy import Hierarchy
    from mgard_tpu.models.compressor import Compressor

    shape = (33, 33, 33)
    rng = np.random.default_rng(5)
    x = np.linspace(0, 1, 33)
    v = (np.sin(4 * x)[:, None, None] * np.cos(3 * x)[None, :, None]
         * x[None, None, :] + 1e-8 * rng.standard_normal(shape))
    v = v.astype(np.float64)
    tol = 1e-12
    comp = Compressor(Hierarchy(shape), np.float64, s=math.inf)
    buf = comp.compress(v, tol)
    out = mgard_tpu.decompress(buf)
    assert out.dtype == np.float64
    err = float(np.abs(out - v).max())
    assert err <= tol, err
    # at 1e-12 on unit-range data ~45 bitplanes survive — no compression
    # is expected (the reference's int64 CPU path expands too); at a
    # moderate tolerance the same wide pipeline must compress
    buf6 = comp.compress(v, 1e-6)
    out6 = mgard_tpu.decompress(buf6)
    assert float(np.abs(out6 - v).max()) <= 1e-6
    assert len(buf6) < v.nbytes
    buf3 = comp.compress(v, 1e-3)
    out3 = mgard_tpu.decompress(buf3)
    assert float(np.abs(out3 - v).max()) <= 1e-3
    assert len(buf3) < 0.6 * v.nbytes
