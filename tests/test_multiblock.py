import math

import numpy as np

import mgard_tpu
from mgard_tpu.config import Config
from tests.test_compress_e2e import smooth_field


def test_multiblock_linf_bound():
    shape = (80, 33)
    v = smooth_field(shape, seed=90).astype(np.float32)
    cfg = Config(max_block_bytes=4000)  # forces several slabs
    buf = mgard_tpu.compress(v, 1e-2, config=cfg)
    from mgard_tpu.io import format as fmt
    header, _ = fmt.read_container(buf)
    assert header.dd_nblocks >= 2
    out = mgard_tpu.decompress(buf)
    assert out.shape == shape
    assert np.abs(out - v).max() <= 1e-2


def test_multiblock_snorm_budget_split():
    shape = (80, 17)
    v = smooth_field(shape, seed=91).astype(np.float64)
    cfg = Config(max_block_bytes=4000)
    tol = 1e-3
    buf = mgard_tpu.compress(v, tol, s=0.0, config=cfg)
    out = mgard_tpu.decompress(buf)
    # Global L2-ish control: each block gets sqrt(tol^2/n) so the sum of
    # squares still meets tol (reference ErrorToleranceCalculator).
    err = out - v
    assert np.sqrt(np.mean(err**2)) <= tol


def test_multiblock_rel_mode():
    shape = (100, 20)
    v = 50.0 * smooth_field(shape, seed=92)
    cfg = Config(max_block_bytes=4000)
    buf = mgard_tpu.compress(v, 1e-3, mode="rel", config=cfg)
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 1e-3 * np.abs(v).max()
