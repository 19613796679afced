"""Data-parallel compression over a device mesh (the reference scales via
MPI+ADIOS2 at application level, doc/MGARD-X.md:285; here it's shard_map
over domain blocks).  Runs on real chips or a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/multichip_sharded.py
"""

import numpy as np
import jax
from jax.sharding import Mesh

from mgard_tpu.parallel.sharded import ShardedCompressor

devices = np.array(jax.devices())
mesh = Mesh(devices, ("blocks",))
nblocks = len(devices)
block_shape = (33, 33, 33)

sc = ShardedCompressor(mesh, "blocks", block_shape, np.float32)
rng = np.random.default_rng(0)
v = rng.normal(size=(nblocks, *block_shape)).astype(np.float32)

e, w, counts, statuses, block_tol = sc.encode(v, 1e-2)
sizes = np.asarray(counts)
print(f"{nblocks} devices, per-block words: {sizes.tolist()}")
out = np.asarray(sc.decode(e, w, block_tol))
print(f"max err {np.abs(out - v).max():.2e} <= 1e-2")
