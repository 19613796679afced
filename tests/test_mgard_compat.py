"""Reference-format interoperability tests (self-consistency here;
cross-validation against the compiled reference library lives in
test_reference_oracle.py)."""

import math

import numpy as np
import pytest

from mgard_tpu.io import mgard_compat
from mgard_tpu.io.huffman_native import huffman_decode, huffman_encode
from tests.test_compress_e2e import smooth_field


def test_huffman_roundtrip():
    rng = np.random.default_rng(60)
    q = rng.integers(-5000, 5000, size=10000).astype(np.int64)
    q[::97] = 10**7  # out-of-dictionary outliers -> miss channel
    tree, hit, hit_bits, miss = huffman_encode(q)
    out = huffman_decode(tree, hit, hit_bits, miss, len(q))
    np.testing.assert_array_equal(out, q)


def test_huffman_single_symbol():
    q = np.zeros(100, dtype=np.int64)
    tree, hit, hit_bits, miss = huffman_encode(q)
    assert hit_bits == 0
    out = huffman_decode(tree, hit, hit_bits, miss, 100)
    np.testing.assert_array_equal(out, q)


def test_container_roundtrip_header():
    v = smooth_field((17, 17), seed=61).astype(np.float32)
    buf = mgard_compat.compress_mgard(v, 0.01, zstd=True)
    header, payload = mgard_compat.read_container(buf)
    assert header["dataset"]["type"] == mgard_compat.DATASET_FLOAT
    topo = header["domain"]["cartesian_grid_topology"]
    assert list(topo["shape"]) == [17, 17]
    assert header["encoding"]["compressor"] == mgard_compat.CPU_HUFFMAN_ZSTD


@pytest.mark.parametrize("zstd", [True, False])
@pytest.mark.parametrize("s", [math.inf, 0.0])
def test_compat_roundtrip_bound(zstd, s):
    v = smooth_field((33, 17), seed=62).astype(np.float64)
    tol = 1e-3
    buf = mgard_compat.compress_mgard(v, tol, s=s, zstd=zstd)
    out = mgard_compat.decompress_mgard(buf)
    if math.isinf(s):
        assert np.abs(out - v).max() <= tol
    else:
        from mgard_tpu.hierarchy import Hierarchy
        from mgard_tpu.ops import norms
        import jax.numpy as jnp
        h = Hierarchy(v.shape)
        assert float(norms.norm(h, jnp.asarray(out - v), s)) <= tol


def test_compat_nondyadic():
    v = smooth_field((20, 12), seed=63).astype(np.float32)
    buf = mgard_compat.compress_mgard(v, 1e-2)
    out = mgard_compat.decompress_mgard(buf)
    assert np.abs(out - v).max() <= 1e-2


def test_protowire_roundtrip():
    from mgard_tpu.io import protowire
    msg = {
        "mgard_version": {"major_": 1, "minor_": 6, "patch_": 0},
        "dataset": {"type": 1, "dimension": 1},
        "error_control": {"mode": 0, "norm": 1, "s": -0.5,
                          "tolerance": 1e-3},
    }
    data = protowire.encode_message(
        mgard_compat.SCHEMAS["Header"], mgard_compat.SCHEMAS, msg)
    back = protowire.decode_message(
        mgard_compat.SCHEMAS["Header"], mgard_compat.SCHEMAS, data)
    assert back["dataset"]["type"] == 1
    assert back["error_control"]["s"] == -0.5
    # verify against the real protobuf runtime if available
    try:
        from google.protobuf import descriptor_pb2  # noqa: F401
    except ImportError:
        return
