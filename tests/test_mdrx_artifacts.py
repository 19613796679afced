"""Interop with refactored datasets written by the reference `mdr-x`
tool (round-4 VERDICT missing item #5).

The artifacts are generated live by the mdr-x serial binary (build via
`tools/build_reference_oracle.sh <dir> with-mdr`); tests skip when it
is absent.  See io/mdrx_compat.py for the directory/stream format.
"""

import pathlib
import subprocess

import numpy as np
import pytest

MDRX = pathlib.Path("/tmp/mgard_build_mdr/bin/mdr-x")

pytestmark = pytest.mark.skipif(not MDRX.exists(),
                                reason="mdr-x binary not built")


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    d = tmp_path_factory.mktemp("mdrx")
    x = np.linspace(0, 1, 33)
    v = (np.sin(3 * x)[:, None, None] * np.cos(2 * x)[None, :, None]
         * (1 + x)[None, None, :]).astype(np.float32)
    raw = d / "in.bin"
    v.tofile(raw)
    out = d / "art"
    subprocess.run(
        [str(MDRX), "-z", "-i", str(raw), "-o", str(out), "-dt", "s",
         "-dim", "3", "33", "33", "33", "-d", "serial"],
        check=True, capture_output=True)
    return out, v


def test_metadata_parses(artifact):
    from mgard_tpu.io import mdrx_compat as mx

    art, v = artifact
    md = mx.read_mdrx_metadata(art)
    assert len(md.subdomains) == 1
    levels = md.subdomains[0]
    assert len(levels) == 6                      # 33^3 -> l_target 5
    assert len(levels[0].sizes) == 32            # f32 -> 32 bitplanes
    assert sum(lv.num_elems for lv in levels) == 33 ** 3
    # level error bounds are the recorded max |coeff| per level
    assert all(lv.error_bound > 0 for lv in levels)


def test_full_plane_reconstruction_is_near_exact(artifact):
    """All stored bitplanes back: only the fixed-point truncation of
    ldexp(coeff, 32 - exp) remains (~1 f32 ulp of each level bound)."""
    from mgard_tpu.io import mdrx_compat as mx

    art, v = artifact
    out = mx.mdrx_reconstruct(art)
    assert out.dtype == np.float32 and out.shape == v.shape
    assert np.abs(out.astype(np.float64) - v).max() <= 1e-5


@pytest.mark.parametrize("tol", [1e-1, 1e-2, 1e-3])
def test_tolerance_driven_reconstruction(artifact, tol):
    from mgard_tpu.io import mdrx_compat as mx

    art, v = artifact
    out = mx.mdrx_reconstruct(art, tol=tol)
    assert np.abs(out.astype(np.float64) - v).max() <= tol


def test_explicit_plane_counts_monotone(artifact):
    """More planes per level -> error shrinks monotonically-ish."""
    from mgard_tpu.io import mdrx_compat as mx

    art, v = artifact
    errs = []
    for k in (4, 8, 16):
        out = mx.mdrx_reconstruct(art, num_bitplanes=[k] * 6)
        errs.append(float(np.abs(out.astype(np.float64) - v).max()))
    assert errs[0] > errs[1] > errs[2]


def test_cli_reconstruct_mdrx(artifact, tmp_path):
    art, v = artifact
    from mgard_tpu import cli

    out_file = tmp_path / "rec.bin"
    cli.main(["reconstruct", "--format", "mdr-x", "-i", str(art),
              "-o", str(out_file), "-e", "1e-2"])
    got = np.fromfile(out_file, dtype=np.float32).reshape(v.shape)
    assert np.abs(got.astype(np.float64) - v).max() <= 1e-2
