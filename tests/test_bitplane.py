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
