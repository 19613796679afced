"""Cross-validation against the compiled *reference* MGARD library.

The oracle binary is built on demand from /root/reference (cached in
/tmp/mgard_build across runs — tools/build_reference_oracle.sh).  These
tests are marked slow via conftest; the fast tier skips them, the full
suite builds and runs them by default so the bit-for-bit interop claims
are re-verified on every full run.
"""

import math
import pathlib
import subprocess

import numpy as np
import pytest

from mgard_tpu.io import mgard_compat
from tests.test_compress_e2e import smooth_field

ORACLE = pathlib.Path("/tmp/mgard_oracle")
_BUILD_SCRIPT = pathlib.Path(__file__).resolve().parents[1] / "tools" / \
    "build_reference_oracle.sh"


def _ensure_oracle() -> bool:
    if ORACLE.exists():
        return True
    if not pathlib.Path("/root/reference").is_dir():
        return False
    try:
        subprocess.run(["sh", str(_BUILD_SCRIPT)], check=True,
                       capture_output=True, timeout=1200)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError):
        return False
    return ORACLE.exists()


@pytest.fixture(scope="module", autouse=True)
def _oracle_built():
    # Lazy: the (cached) build only happens when these tests actually
    # run, never at collection time — the fast tier stays fast.
    if not _ensure_oracle():
        pytest.skip("reference oracle unavailable "
                    "(no /root/reference or build failed)")


def _oracle(*args):
    subprocess.run([str(ORACLE), *[str(a) for a in args]], check=True,
                   capture_output=True)


def test_our_decoder_reads_reference_file(tmp_path):
    v = smooth_field((33, 33), seed=70).astype(np.float64)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgard"
    v.tofile(raw)
    _oracle("compress", raw, out, "float64", 1e-3, "inf", 33, 33)
    ours = mgard_compat.decompress_mgard(out.read_bytes())
    assert np.abs(ours - v).max() <= 1e-3
    # and via the top-level API magic dispatch
    import mgard_tpu
    ours2 = mgard_tpu.decompress(out.read_bytes())
    np.testing.assert_array_equal(ours, ours2)


def test_reference_decodes_our_file(tmp_path):
    v = smooth_field((33, 17), seed=71).astype(np.float64)
    buf = mgard_compat.compress_mgard(v, 1e-3, zstd=False)
    f = tmp_path / "ours.mgard"
    f.write_bytes(buf)
    back = tmp_path / "back.bin"
    _oracle("decompress", f, back)
    out = np.fromfile(back, dtype=np.float64).reshape(v.shape)
    assert np.abs(out - v).max() <= 1e-3


def test_decodes_match_closely(tmp_path):
    """Asserts the decompress-parity contract documented in BASELINE.md
    ("Decompress parity: the achieved contract"):

    1. bit-for-bit at the coded-stream level — the reference container's
       payload, decoded to the int64 quantized vector and re-encoded by
       our codec at the reference's settings, reproduces the payload
       bytes exactly (both decoders therefore see the identical ints);
    2. the reconstructions from that shared vector agree to < 1e-9 on
       unit-scale f64 data (recompose summation-order roundoff only —
       a deliberate, bounded nonconformance; see BASELINE.md)."""
    import zlib

    v = smooth_field((17, 17, 9), seed=72).astype(np.float64)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgard"
    back = tmp_path / "back.bin"
    v.tofile(raw)
    _oracle("compress", raw, out, "float64", 1e-4, "inf", 17, 17, 9)
    _oracle("decompress", out, back)

    header, payload = mgard_compat.read_container(out.read_bytes())
    assert header["encoding"]["compressor"] == mgard_compat.CPU_HUFFMAN_ZLIB
    q = np.frombuffer(zlib.decompress(payload), dtype="<i8")
    assert zlib.compress(q.tobytes(), 9) == payload  # contract part 1

    ref = np.fromfile(back, dtype=np.float64).reshape(v.shape)
    ours = mgard_compat.decompress_mgard(out.read_bytes())
    assert np.abs(ours - ref).max() < 1e-9  # contract part 2


ZSTD_ORACLE = pathlib.Path("/tmp/mgard_oracle_zstd")


@pytest.mark.skipif(not ZSTD_ORACLE.exists(),
                    reason="zstd-enabled oracle not built")
def test_huffman_zstd_path_parity(tmp_path):
    # Exercises the Huffman bitstream itself (tree tie-breaking included):
    # our codec decodes the reference's CPU_HUFFMAN_ZSTD payload and the
    # reference decodes ours.
    v = smooth_field((33, 33), seed=74).astype(np.float64)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgard"
    v.tofile(raw)
    subprocess.run([str(ZSTD_ORACLE), "compress", str(raw), str(out),
                    "float64", "1e-3", "inf", "33", "33"], check=True)
    header, _ = mgard_compat.read_container(out.read_bytes())
    assert header["encoding"]["compressor"] == mgard_compat.CPU_HUFFMAN_ZSTD
    ours = mgard_compat.decompress_mgard(out.read_bytes())
    assert np.abs(ours - v).max() <= 1e-3

    mine = tmp_path / "mine.mgard"
    mine.write_bytes(mgard_compat.compress_mgard(v, 1e-3, zstd=True))
    back = tmp_path / "back.bin"
    subprocess.run([str(ZSTD_ORACLE), "decompress", str(mine), str(back)],
                   check=True)
    got = np.fromfile(back, dtype=np.float64).reshape(v.shape)
    assert np.abs(got - v).max() <= 1e-3


def test_snorm_file_parity(tmp_path):
    v = smooth_field((33, 33), seed=73).astype(np.float64)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgard"
    v.tofile(raw)
    _oracle("compress", raw, out, "float64", 1e-3, 0.0, 33, 33)
    ours = mgard_compat.decompress_mgard(out.read_bytes())
    from mgard_tpu.hierarchy import Hierarchy
    from mgard_tpu.ops import norms
    import jax.numpy as jnp
    h = Hierarchy(v.shape)
    assert float(norms.norm(h, jnp.asarray(ours - v), 0.0)) <= 1e-3


def test_ratio_parity_vs_reference(tmp_path):
    """North-star size check (BASELINE.md): at the same error bound our
    compressed size must BEAT the reference's.  The host Huffman path
    runs the reference's own entropy coder so it must be within a few
    percent (ordering differences only); the on-chip bitplane+zstd codec
    must come in at or under the reference size (round 3: the PYRAMID
    level-major layout measures 0.76x of the reference at 256^3 and
    ~0.87x on this 65^3 field)."""
    import mgard_tpu
    from mgard_tpu.config import Config, Lossless

    shape = (65, 65, 65)
    v = smooth_field(shape, seed=77).astype(np.float32)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgard"
    v.tofile(raw)
    _oracle("compress", raw, out, "float32", 1e-3, "inf", *shape)
    ref_size = out.stat().st_size

    ours_h = len(mgard_tpu.compress(
        v, 1e-3, config=Config(lossless=Lossless.HUFFMAN_ZLIB)))
    ours_bp = len(mgard_tpu.compress(
        v, 1e-3, config=Config(lossless=Lossless.BITPLANE_GROUP_ZSTD)))
    assert ours_h <= 1.06 * ref_size, (ours_h, ref_size)
    assert ours_bp <= 1.0 * ref_size, (ours_bp, ref_size)
    # and the compat writer (bit-compatible stream) must not exceed it
    compat = len(mgard_compat.compress_mgard(
        v.astype(np.float64), 1e-3, zstd=False))
    assert compat <= 1.02 * ref_size, (compat, ref_size)
