import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mgard_tpu.parallel.domain import DomainDecomposer, local_abs_tol
from mgard_tpu.parallel.sharded import ShardedCompressor


def test_domain_decomposer_single_block_when_small():
    dd = DomainDecomposer((64, 64), max_block_bytes=1 << 30, itemsize=4)
    assert len(dd) == 1


def test_domain_decomposer_splits_max_dim():
    dd = DomainDecomposer((1000, 10), max_block_bytes=10000, itemsize=4)
    assert len(dd) >= 4
    # blocks tile the domain
    covered = np.zeros((1000, 10), dtype=int)
    for i in range(len(dd)):
        covered[dd.slices(i)] += 1
    assert (covered == 1).all()


def test_local_tol():
    assert local_abs_tol(0.1, math.inf, 7) == 0.1
    np.testing.assert_allclose(local_abs_tol(0.1, 0.0, 4), 0.05)


def test_sharded_roundtrip_8_devices():
    devices = np.array(jax.devices())
    assert len(devices) >= 8, "conftest should provide 8 CPU devices"
    mesh = Mesh(devices[:8], ("blocks",))
    block_shape = (9, 9)
    sc = ShardedCompressor(mesh, "blocks", block_shape, np.float32)
    rng = np.random.default_rng(30)
    v = rng.normal(size=(8, *block_shape)).astype(np.float32)
    e, w, c, st, block_tol = sc.encode(v, 1e-2)
    out = np.asarray(sc.decode(e, w, block_tol))
    assert np.abs(out - v).max() <= 1e-2


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
