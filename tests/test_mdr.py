import math

import numpy as np
import pytest

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.models import mdr
from tests.test_compress_e2e import smooth_field


def test_refactor_full_reconstruct_exact_ish():
    shape = (17, 17)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=40).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30)
    out = mdr.mdr_reconstruct(h, res, tol=1e-12)
    # All bitplanes fetched -> error at the fixed-point resolution.
    assert np.abs(out - v).max() < 1e-6


@pytest.mark.parametrize("tol", [1e-1, 1e-2, 1e-3])
def test_progressive_tolerance(tol):
    shape = (17, 17)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=41).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30)
    out = mdr.mdr_reconstruct(h, res, tol=tol)
    assert np.abs(out - v).max() <= tol


def test_fewer_planes_for_looser_tol():
    shape = (17, 17)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=42).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30)
    c_loose = mdr.mdr_request(res.metadata, 1e-1)
    c_tight = mdr.mdr_request(res.metadata, 1e-4)
    assert sum(c_loose) < sum(c_tight)


def test_incremental_refinement_reuses_state():
    shape = (17, 17)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=43).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30)
    md = res.metadata

    rec = mdr.MDReconstructor(h, md)
    c1 = mdr.mdr_request(md, 1e-1)
    for l, c in enumerate(c1):
        streams = {0: res.streams[l][0]}
        for b in range(c):
            streams[1 + b] = res.streams[l][1 + b]
        rec.add_streams(l, streams)
    out1 = rec.reconstruct(c1)
    assert np.abs(out1 - v).max() <= 1e-1

    # Refine: fetch only the extra planes.
    c2 = mdr.mdr_request(md, 1e-3)
    for l in range(len(md.levels)):
        extra = {}
        for b in range(c1[l], c2[l]):
            extra[1 + b] = res.streams[l][1 + b]
        if extra:
            rec.add_streams(l, extra)
    out2 = rec.reconstruct(c2)
    assert np.abs(out2 - v).max() <= 1e-3
    assert np.abs(out2 - v).max() <= np.abs(out1 - v).max()


def test_domain_decomposed_mdr():
    shape = (40, 17)
    v = smooth_field(shape, seed=45).astype(np.float64)
    ds = mdr.mdr_refactor_dd(v, max_block_bytes=2000)
    assert len(ds.results) >= 2
    for tol in (1e-1, 1e-3):
        out = ds.reconstruct(tol)
        assert out.shape == shape
        assert np.abs(out - v).max() <= tol
    assert ds.retrieved_bytes(1e-1) < ds.retrieved_bytes(1e-3)


def test_metadata_roundtrip():
    shape = (9, 9)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=44)
    res = mdr.mdr_refactor(h, v, B=16)
    buf = res.metadata.pack()
    md2 = mdr.MDRMetadata.unpack(buf)
    assert md2.shape == res.metadata.shape
    assert md2.num_bitplanes == 16
    for a, b in zip(res.metadata.levels, md2.levels):
        assert a.n == b.n and a.exponent == b.exponent
        np.testing.assert_allclose(a.sq_errors, b.sq_errors)


def test_negabinary_roundtrip():
    shape = (17, 17)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=46).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30, encoding=mdr.ENC_NEGABINARY)
    assert res.metadata.encoding == mdr.ENC_NEGABINARY
    for tol in (1e-1, 1e-3):
        out = mdr.mdr_reconstruct(h, res, tol=tol)
        assert np.abs(out - v).max() <= tol


def test_snorm_request_meets_bound():
    shape = (33, 33)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=47).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30)
    import jax.numpy as jnp
    from mgard_tpu.ops import norms
    for tol in (1e-1, 1e-2, 1e-3):
        counts = mdr.mdr_request(res.metadata, tol, s=0.0)
        out = mdr.mdr_reconstruct(h, res, tol=tol, s=0.0)
        err = float(norms.norm(h, jnp.asarray(out - v), 0.0))
        assert err <= tol, (tol, err, counts)


def test_adaptive_resolution():
    shape = (33, 33)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=48).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30)
    for lvl in (h.L - 1, h.L - 2):
        out = mdr.mdr_reconstruct(h, res, tol=1e-3, target_level=lvl)
        assert out.shape == h.shapes[lvl]
    full = mdr.mdr_reconstruct(h, res, tol=1e-3, target_level=h.L)
    assert full.shape == shape


def test_per_plane_lossless_shrinks_retrieval():
    shape = (65, 65)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=49).astype(np.float64)
    res_z = mdr.mdr_refactor(h, v, B=30, lossless=mdr.LOSSLESS_ZSTD)
    res_r = mdr.mdr_refactor(h, v, B=30, lossless=mdr.LOSSLESS_NONE)
    size_z = sum(len(s) for st in res_z.streams for s in st)
    size_r = sum(len(s) for st in res_r.streams for s in st)
    assert size_z < size_r
    # compressed sizes are recorded and drive the request cost model
    szs = res_z.metadata.levels[-1].stream_sizes
    assert szs.sum() > 0
    out = mdr.mdr_reconstruct(h, res_z, tol=1e-3)
    assert np.abs(out - v).max() <= 1e-3


@pytest.mark.parametrize("strategy", ["inorder", "roundrobin"])
def test_interpreter_siblings_meet_bound_with_more_bytes(strategy):
    """Round-5 VERDICT item 9: the inorder / round-robin size
    interpreters (reference BasicSizeInterpreter.hpp:11,53) hit the same
    tolerance as greedy, retrieving at least as many bytes (greedy is
    the rate-optimal one)."""
    shape = (17, 17)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=44).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=30)
    md = res.metadata

    def retrieved_bytes(counts):
        total = 0
        for l, c in enumerate(counts):
            total += int(md.levels[l].stream_sizes[0])
            total += int(sum(md.levels[l].stream_sizes[1:1 + c]))
        return total

    for tol in (1e-1, 1e-3):
        counts = mdr.mdr_request(md, tol, strategy=strategy)
        rec = mdr.MDReconstructor(h, md)
        for l, c in enumerate(counts):
            streams = {0: res.streams[l][0]}
            for b in range(c):
                streams[1 + b] = res.streams[l][1 + b]
            rec.add_streams(l, streams)
        out = rec.reconstruct(counts)
        assert np.abs(out - v).max() <= tol
        greedy = mdr.mdr_request(md, tol, strategy="greedy")
        assert retrieved_bytes(counts) >= retrieved_bytes(greedy)


def test_interpreter_unknown_strategy_raises():
    shape = (9, 9)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=45).astype(np.float64)
    res = mdr.mdr_refactor(h, v, B=10)
    with pytest.raises(ValueError, match="strategy"):
        mdr.mdr_request(res.metadata, 1e-2, strategy="fastest")
