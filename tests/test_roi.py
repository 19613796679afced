import math

import numpy as np
import jax.numpy as jnp

import mgard_tpu
from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.models import roi
from tests.test_compress_e2e import smooth_field


def _field_with_hotspot(shape, seed=80):
    v = 0.05 * smooth_field(shape, seed=seed)
    sl = tuple(slice(s // 4, s // 4 + max(s // 8, 2)) for s in shape)
    v[sl] += 1.0  # the region of interest
    return v


def test_map_marks_hotspot():
    shape = (65, 65)
    v = _field_with_hotspot(shape)
    h = Hierarchy(shape)
    umap = np.asarray(roi.build_roi_map(h, jnp.asarray(v), 0.5, block=8))
    hot = tuple(slice(s // 4 + 2, s // 4 + 6) for s in shape)
    assert (umap[hot] == roi.ROI).all()
    assert (umap == roi.BACKGROUND).sum() > umap.size // 4


def test_roi_tight_inside_loose_outside():
    shape = (65, 65)
    v = _field_with_hotspot(shape)
    tol = 1e-3
    buf = mgard_tpu.compress(v, tol)
    buf_roi = roi.compress_roi(v, tol, threshold=0.5)
    # ROI compression is (weakly) smaller and decodes with the normal path
    out = mgard_tpu.decompress(buf_roi)
    assert len(buf_roi) <= len(buf)
    h = Hierarchy(shape)
    umap = np.asarray(roi.build_roi_map(h, jnp.asarray(v), 0.5, block=8))
    err = np.abs(out - v)
    # inside ROI the error honors the tight bound
    assert err[umap == roi.ROI].max() <= tol
    # globally, bounded by scalar * tol
    assert err.max() <= roi.default_scalar(2) * tol


def test_roi_3d_runs():
    shape = (17, 17, 17)
    v = _field_with_hotspot(shape, seed=81)
    buf = roi.compress_roi(v, 1e-2, threshold=0.5, block=4)
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 25 * 1e-2
