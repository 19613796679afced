"""Footprint-driven domain decomposition + shape adjustment
(round-2 review item #7; reference DomainDecomposer.hpp:72-89 and
ShapeAdjustment.hpp:43-77)."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu import api
from mgard_tpu.config import Config
from tests.test_compress_e2e import smooth_field


def test_estimate_matches_compiler_memory_analysis():
    """The footprint estimate must stay within 30% of XLA's own
    compile-time accounting (temp + args + outputs) for the default
    encode executable — the review's acceptance bar."""
    import jax
    import jax.numpy as jnp

    from mgard_tpu.hierarchy import Hierarchy
    from mgard_tpu.models.compressor import Compressor

    shape = (129, 129, 129)
    hier = Hierarchy(shape)
    comp = Compressor(hier, np.float32, s=math.inf)
    v = jax.ShapeDtypeStruct(shape, jnp.float32)
    tol = jax.ShapeDtypeStruct((), jnp.float32)
    ma = comp._encode.lower(v, tol).compile().memory_analysis()
    measured = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                + ma.output_size_in_bytes)
    est = api.estimate_memory_footprint(shape)
    assert measured <= est <= 1.3 * measured + (64 << 20), (est, measured)


def test_plan_blocks_from_footprint():
    """A 3 GB virtual input must pick its block count from the estimate
    vs the budget, without touching any data."""
    shape = (768, 1024, 1024)  # 3.2 GB f32
    cfg = Config(max_memory_footprint=4 << 30)
    nb = api.plan_blocks(shape, np.float32, cfg)
    est = api.estimate_memory_footprint(shape)
    assert nb >= -(-est // (4 << 30))
    # per-slab estimate fits the budget
    slab = (shape[0] // nb + 1, shape[1], shape[2])
    assert api.estimate_memory_footprint(slab) <= (4 << 30) * 1.6
    # a huge budget keeps it single-block (legacy byte cap lifted too)
    assert api.plan_blocks(
        shape, np.float32,
        Config(max_memory_footprint=64 << 30,
               max_block_bytes=8 << 30)) == 1


def test_footprint_triggers_multiblock_e2e():
    v = smooth_field((128, 33), seed=21).astype(np.float32)
    cfg = Config(max_memory_footprint=estimate_half(v))
    buf = mgard_tpu.compress(v, 1e-2, config=cfg)
    from mgard_tpu.io import format as fmt
    header, _ = fmt.read_container(buf)
    assert header.dd_nblocks >= 2
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 1e-2


def estimate_half(v):
    return api.estimate_memory_footprint(v.shape, v.dtype) // 2


def test_adjust_shape_rebalances():
    assert api.adjust_shape((1024, 2)) == (64, 32)
    assert api.adjust_shape((4096,)) == (4096,)
    assert np.prod(api.adjust_shape((360, 2, 2))) == 360 * 4


def test_adjust_shape_e2e_roundtrip():
    rng = np.random.default_rng(2)
    x = np.linspace(0, 1, 16384)
    v = (np.sin(40 * x) + 0.01 * rng.standard_normal(16384)
         ).astype(np.float32).reshape(16384, 1)
    cfg = Config(adjust_shape=True)
    buf = mgard_tpu.compress(v, 1e-2, config=cfg)
    out = mgard_tpu.decompress(buf)
    assert out.shape == v.shape
    assert np.abs(out - v).max() <= 1e-2
