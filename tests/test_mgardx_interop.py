"""MGARD-X (mgard-x executable) buffer interop.

Round-2 review missing item #2: buffers produced by the `mgard-x`
binary (Metadata.hpp preamble + per-subdomain X-Huffman streams in the
gpk_reo Mallat corner layout) must decode with mgard_tpu.decompress.

Golden fixtures in tests/data/ were produced by the reference's own
mgard-x serial build (`mgard-x -z ... -d serial`); a live round-trip
test additionally runs if that binary is present at
/tmp/mgard_build_x/bin/mgard-x.
"""

import pathlib
import subprocess

import numpy as np
import pytest

import mgard_tpu

DATA = pathlib.Path(__file__).parent / "data"
MGARDX = pathlib.Path("/tmp/mgard_build_x/bin/mgard-x")


def test_golden_2d_huffman():
    v = np.load(DATA / "golden_17x17_f32.npy")
    buf = (DATA / "golden_17x17_f32_abs1e-3.mgardx").read_bytes()
    out = mgard_tpu.decompress(buf)
    assert out.shape == v.shape and out.dtype == np.float32
    assert np.abs(out.astype(np.float64) - v).max() <= 1e-3


def test_golden_3d_huffman_zstd():
    x = np.linspace(0, 1, 33)
    v = (np.sin(3 * x)[:, None, None] * np.cos(2 * x)[None, :, None]
         * (1 + x)[None, None, :]).astype(np.float32)
    buf = (DATA / "golden_33cube_f32_abs1e-3_zstd.mgardx").read_bytes()
    out = mgard_tpu.decompress(buf)
    assert out.shape == v.shape
    # mgard-x itself reports L_inf error 1.7986e-05 for this buffer; we
    # must reproduce its reconstruction, not merely the bound.
    assert np.abs(out.astype(np.float64) - v).max() <= 2e-5


@pytest.mark.slow
@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
@pytest.mark.parametrize("mode,tol", [("abs", 1e-3), ("rel", 1e-4)])
def test_live_roundtrip(tmp_path, mode, tol):
    from tests.test_compress_e2e import smooth_field

    shape = (65, 33)
    v = smooth_field(shape, seed=11).astype(np.float32)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgardx"
    v.tofile(raw)
    subprocess.run(
        [str(MGARDX), "-z", "-i", str(raw), "-o", str(out), "-dt", "s",
         "-dim", "2", str(shape[0]), str(shape[1]), "-em", mode,
         "-e", str(tol), "-s", "inf", "-l", "huffman", "-d", "serial"],
        check=True, capture_output=True)
    got = mgard_tpu.decompress(out.read_bytes())
    bound = tol * (np.abs(v).max() if mode == "rel" else 1.0)
    assert np.abs(got.astype(np.float64) - v).max() <= bound


@pytest.mark.parametrize("zstd", [True, False])
def test_x_write_roundtrip(zstd):
    """Round-4 review missing item #5: the X container *write* path.
    Our compress_mgard_x -> our decompress must meet the bound."""
    from mgard_tpu.io import mgard_compat

    from tests.test_compress_e2e import smooth_field

    shape = (33, 33, 33)
    v = smooth_field(shape, seed=7).astype(np.float32)
    buf = mgard_compat.compress_mgard_x(v, 1e-3, zstd=zstd)
    header, _ = mgard_compat.read_container(buf)
    assert header["encoding"]["compressor"] in (
        mgard_compat.X_HUFFMAN, mgard_compat.X_HUFFMAN_ZSTD)
    out = mgard_tpu.decompress(buf)
    assert out.dtype == np.float32 and out.shape == shape
    assert np.abs(out.astype(np.float64) - v).max() <= 1e-3


def test_x_write_f64_and_outliers():
    """f64 dataset type plus a spike that forces the outlier channel
    (|q| beyond the 8192-entry dictionary)."""
    from mgard_tpu.io import mgard_compat

    rng = np.random.default_rng(3)
    shape = (65, 33)
    v = rng.standard_normal(shape) * 1e-3
    v[7, 11] = 50.0  # quantizes far outside the dictionary
    buf = mgard_compat.compress_mgard_x(v, 1e-4, zstd=True)
    out = mgard_tpu.decompress(buf)
    assert out.dtype == np.float64
    assert np.abs(out - v).max() <= 1e-4


def test_x_write_cr_fallback():
    """Incompressible data: writer stores the raw subdomain (CR < 1
    fallback), reader returns it exactly."""
    from mgard_tpu.io import mgard_compat

    rng = np.random.default_rng(5)
    v = rng.standard_normal((33, 33)).astype(np.float32)
    buf = mgard_compat.compress_mgard_x(v, 1e-7, zstd=False)
    out = mgard_tpu.decompress(buf)
    assert np.array_equal(out, v)


@pytest.mark.slow
@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
def test_live_mgardx_decodes_our_buffer(tmp_path):
    """Bidirectional interop: `mgard-x -x -d serial` must decode a
    buffer we wrote (the decode direction is covered by the golden
    fixtures and test_live_roundtrip)."""
    from mgard_tpu.io import mgard_compat

    from tests.test_compress_e2e import smooth_field

    shape = (33, 33, 33)
    v = smooth_field(shape, seed=13).astype(np.float32)
    comp = tmp_path / "ours.mgardx"
    dec = tmp_path / "out.bin"
    comp.write_bytes(mgard_compat.compress_mgard_x(v, 1e-3, zstd=True))
    subprocess.run(
        [str(MGARDX), "-x", "-i", str(comp), "-o", str(dec),
         "-d", "serial"], check=True, capture_output=True)
    got = np.fromfile(dec, dtype=np.float32).reshape(shape)
    assert np.abs(got.astype(np.float64) - v).max() <= 1e-3


@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
def test_live_raw_fallback(tmp_path):
    """Incompressible input: the reference pipeline stores the raw
    subdomain when CR < 1 (CPUPipelines.hpp:115-134)."""
    rng = np.random.default_rng(11)
    shape = (65, 33)
    v = rng.standard_normal(shape).astype(np.float32)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgardx"
    v.tofile(raw)
    subprocess.run(
        [str(MGARDX), "-z", "-i", str(raw), "-o", str(out), "-dt", "s",
         "-dim", "2", str(shape[0]), str(shape[1]), "-em", "abs",
         "-e", "1e-3", "-s", "inf", "-l", "huffman", "-d", "serial"],
        check=True, capture_output=True)
    got = mgard_tpu.decompress(out.read_bytes())
    assert np.array_equal(got, v)


@pytest.mark.slow
@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
def test_live_large_buffer_decodes_fast(tmp_path):
    """Round-5 VERDICT item 3: the X-Huffman decode is vectorized
    (root-table + lockstep chunk chase) — a multi-million-symbol
    mgard-x buffer decodes in seconds, not minutes."""
    import time

    n = 129
    x = np.linspace(0, 1, n, dtype=np.float32)
    v = (np.sin(3 * x)[:, None, None] * np.cos(2 * x)[None, :, None]
         * (1 + x)[None, None, :]).astype(np.float32)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgardx"
    v.tofile(raw)
    subprocess.run(
        [str(MGARDX), "-z", "-i", str(raw), "-o", str(out), "-dt", "s",
         "-dim", "3", str(n), str(n), str(n), "-em", "abs",
         "-e", "1e-4", "-s", "inf", "-l", "huffman", "-d", "serial"],
        check=True, capture_output=True)
    t0 = time.time()
    got = mgard_tpu.decompress(out.read_bytes())
    elapsed = time.time() - t0
    assert np.abs(got.astype(np.float64) - v).max() <= 1e-4
    assert elapsed < 60.0, f"X decode took {elapsed:.0f}s (budget 60s)"


@pytest.mark.slow
@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
@pytest.mark.parametrize("s", [0.0, 1.0])
def test_live_snorm_buffer_decodes(tmp_path, s):
    """Round-5 VERDICT item 2: s-norm (finite smoothness) mgard-x
    buffers decode — levelwise quantizers 2*tol/(2^(s l) sqrt(dof))
    with the uniform level volumes (LinearQuantization.hpp:495-545)."""
    from tests.test_compress_e2e import smooth_field

    shape = (33, 33)
    v = smooth_field(shape, seed=21).astype(np.float32)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgardx"
    v.tofile(raw)
    tol = 1e-4
    subprocess.run(
        [str(MGARDX), "-z", "-i", str(raw), "-o", str(out), "-dt", "s",
         "-dim", "2", str(shape[0]), str(shape[1]), "-em", "abs",
         "-e", str(tol), "-s", str(s), "-l", "huffman", "-d", "serial"],
        check=True, capture_output=True)
    got = mgard_tpu.decompress(out.read_bytes())
    # reproduce the reference's own reconstruction: decode the same
    # buffer with the binary and compare against IT (the s-norm bound
    # itself is an L2-family bound, not pointwise)
    ref_out = tmp_path / "ref.bin"
    subprocess.run(
        [str(MGARDX), "-x", "-i", str(out), "-o", str(ref_out),
         "-d", "serial"], check=True, capture_output=True)
    ref = np.fromfile(ref_out, dtype=np.float32).reshape(shape)
    assert np.abs(got.astype(np.float64) - ref).max() <= 1e-5


@pytest.mark.slow
@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
def test_live_block_dd_buffer_decodes(tmp_path):
    """Round-5 VERDICT item 2: Block domain-decomposed mgard-x buffers
    decode — per-subdomain |u64 size|stream| records in raster order
    (DomainDecomposer.hpp:124-160, CPUPipelines.hpp:213-219)."""
    from tests.test_compress_e2e import smooth_field

    shape = (34, 17, 17)   # dd-size 17 -> 2x1x1 subdomains of 17^3
    v = smooth_field(shape, seed=22).astype(np.float32)
    raw = tmp_path / "in.bin"
    out = tmp_path / "out.mgardx"
    v.tofile(raw)
    subprocess.run(
        [str(MGARDX), "-z", "-i", str(raw), "-o", str(out), "-dt", "s",
         "-dim", "3", *(str(n) for n in shape), "-em", "abs",
         "-e", "1e-3", "-s", "inf", "-l", "huffman-zstd", "-d", "serial",
         "-dd", "block", "-dd-size", "17"],
        check=True, capture_output=True)
    got = mgard_tpu.decompress(out.read_bytes())
    assert got.shape == shape
    assert np.abs(got.astype(np.float64) - v).max() <= 1e-3


def test_golden_reorder1_level_linearized():
    """Round-5 VERDICT item 2: reorder=1 (level-linearized) buffers
    decode.  The golden fixture was produced by the reference X library
    itself with config.reorder=1 (the mgard-x CLI hardcodes reorder=0
    and the serial library SEGFAULTS on 2-D reorder=1 — only the 3-D
    path works upstream; see LinearQuantization.hpp calc_level_offset
    for the layout).  We must reproduce the reference's own
    reconstruction, not merely the bound."""
    x = np.linspace(0, 1, 33)
    v = (np.sin(3 * x)[:, None, None] * np.cos(2 * x)[None, :, None]
         * (1 + x)[None, None, :]).astype(np.float32)
    buf = (DATA / "golden_33cube_f32_reorder1_zstd.mgardx").read_bytes()
    ref = np.fromfile(DATA / "golden_33cube_f32_reorder1_ref_recon.bin",
                      dtype=np.float32).reshape(33, 33, 33)
    out = mgard_tpu.decompress(buf)
    assert np.abs(out.astype(np.float64) - v).max() <= 1e-3
    # the reference binary reports this exact reconstruction
    assert np.abs(out.astype(np.float64) - ref).max() <= 1e-6


def test_x_write_snorm_roundtrip():
    """Round-5: the X write path also covers finite-s error control —
    levelwise quantizers mirroring LinearQuantization.hpp exactly, so
    the buffer decodes through our own (and the reference's) s-norm
    decode path."""
    from mgard_tpu.io import mgard_compat

    from tests.test_compress_e2e import smooth_field

    shape = (33, 33)
    v = smooth_field(shape, seed=31).astype(np.float32)
    buf = mgard_compat.compress_mgard_x(v, 1e-4, s=0.0)
    header, _ = mgard_compat.read_container(buf)
    assert header["error_control"]["norm"] == 1     # S_NORM
    out = mgard_tpu.decompress(buf)
    # s=0 bounds the L2 norm of the error
    l2 = float(np.sqrt(np.mean((out.astype(np.float64) - v) ** 2)))
    assert l2 <= 1e-4


def test_x_write_rel_mode_roundtrip():
    from mgard_tpu.io import mgard_compat

    from tests.test_compress_e2e import smooth_field

    shape = (33, 33)
    v = (smooth_field(shape, seed=32) * 37.0).astype(np.float32)
    buf = mgard_compat.compress_mgard_x(v, 1e-4, mode="rel")
    out = mgard_tpu.decompress(buf)
    assert np.abs(out.astype(np.float64) - v).max() <= 1e-4 * np.abs(v).max()


@pytest.mark.slow
@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
def test_live_mgardx_decodes_our_snorm_buffer(tmp_path):
    from mgard_tpu.io import mgard_compat

    from tests.test_compress_e2e import smooth_field

    shape = (33, 33, 33)
    v = smooth_field(shape, seed=33).astype(np.float32)
    comp = tmp_path / "ours.mgardx"
    dec = tmp_path / "out.bin"
    comp.write_bytes(mgard_compat.compress_mgard_x(v, 1e-4, s=0.0))
    subprocess.run(
        [str(MGARDX), "-x", "-i", str(comp), "-o", str(dec),
         "-d", "serial"], check=True, capture_output=True)
    got = np.fromfile(dec, dtype=np.float32).reshape(shape)
    ours = mgard_tpu.decompress(comp.read_bytes())
    # the reference must see the same reconstruction we do (both
    # decode the same ints through the same dequant formulas)
    assert np.abs(got.astype(np.float64)
                  - ours.astype(np.float64)).max() <= 1e-6


@pytest.mark.slow
@pytest.mark.skipif(not MGARDX.exists(),
                    reason="mgard-x serial binary not built")
def test_x_write_rel_snorm_matches_reference_norm(tmp_path):
    """Round-5 review fix: REL + finite-s records the reference's RMS
    norm (normalize_coordinates=true default), not the raw L2 sum —
    the recorded norm must match the binary's own to f32 rounding."""
    from mgard_tpu.io import mgard_compat

    x = np.linspace(0, 1, 33)
    v = (np.sin(3 * x)[:, None, None] * np.cos(2 * x)[None, :, None]
         * (1 + x)[None, None, :]).astype(np.float32)
    raw = tmp_path / "in.bin"
    ref = tmp_path / "ref.mgardx"
    v.tofile(raw)
    subprocess.run(
        [str(MGARDX), "-z", "-i", str(raw), "-o", str(ref), "-dt", "s",
         "-dim", "3", "33", "33", "33", "-em", "rel", "-e", "1e-3",
         "-s", "0", "-l", "huffman-zstd", "-d", "serial"],
        check=True, capture_output=True)
    href, _ = mgard_compat.read_container(ref.read_bytes())
    ref_norm = href["error_control"]["norm_of_original_data"]
    ours = mgard_compat.compress_mgard_x(v, 1e-3, s=0.0, mode="rel")
    hours, _ = mgard_compat.read_container(ours)
    our_norm = hours["error_control"]["norm_of_original_data"]
    assert abs(our_norm - ref_norm) <= 1e-5 * abs(ref_norm)
    # and the binary decodes our REL s-norm buffer to our reconstruction
    mine = tmp_path / "ours.mgardx"
    mine.write_bytes(ours)
    out_f = tmp_path / "back.bin"
    subprocess.run([str(MGARDX), "-x", "-i", str(mine), "-o", str(out_f),
                    "-d", "serial"], check=True, capture_output=True)
    back = np.fromfile(out_f, dtype=np.float32).reshape(v.shape)
    assert np.abs(back.astype(np.float64)
                  - mgard_tpu.decompress(ours).astype(np.float64)
                  ).max() <= 1e-6


def test_x_write_snorm_flat_dim():
    """Round-5 review fix: s-norm volumes skip flat dims (was
    ZeroDivisionError); the reference's own volume for a dof=1 dim is
    a degenerate 0, so factor 1 is the only usable reading."""
    from mgard_tpu.io import mgard_compat

    rng = np.random.default_rng(9)
    v = rng.standard_normal((17, 17, 1)).astype(np.float32) * 0.1
    buf = mgard_compat.compress_mgard_x(v, 1e-2, s=0.0)
    out = mgard_tpu.decompress(buf)
    assert out.shape == v.shape
    l2 = float(np.sqrt(np.mean((out.astype(np.float64) - v) ** 2)))
    assert l2 <= 1e-2
