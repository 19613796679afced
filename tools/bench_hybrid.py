"""Time the HYBRID decomposition path on hardware at 512^3 vs MULTIDIM.

VERDICT r2 item #1b: the hybrid path (linear FLOPs, block-local 8->5
matmuls) was built as the scalable alternative to the dense O(n^2) level
matrices but never benched on the TPU.  This probe times encode/decode
for k=1,2 and prints ratio + max error so the winner can become the
large-grid default.
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mgard_tpu.config import Config, Decomposition
from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.models.compressor import Compressor
from mgard_tpu.ops import bitplane


@jax.jit
def _fold(*leaves):
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
    return acc


def sync(out):
    """Fold one element of EVERY leaf — single-leaf readbacks can
    return before sibling buffers land on the tunneled backend."""
    return np.asarray(_fold(*jax.tree_util.tree_leaves(out)))


def timed(name, fn, *args, n1=2, n2=6):
    sync(fn(*args))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"{name:32s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def field(shape):
    axes = [jnp.linspace(0.0, 1.0, s, dtype=jnp.float32) for s in shape]
    f = jnp.zeros(shape, dtype=jnp.float32)
    for k in (1, 3, 7):
        term = jnp.ones(shape, dtype=jnp.float32)
        for d, x in enumerate(axes):
            shp = [1] * len(shape)
            shp[d] = len(x)
            term = term * jnp.cos(np.pi * k * x + 0.1 * k * (d + 1)
                                  ).reshape(shp)
        f = f + term / k
    return f + 0.001 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                         dtype=jnp.float32)


def main(edge=512):
    shape = (edge, edge, edge)
    nbytes = edge ** 3 * 4
    v = field(shape)
    sync(v)
    tol = jnp.asarray(1e-3, dtype=jnp.float32)
    print(f"== {shape} f32 on {jax.devices()[0]}")

    for label, cfg in [
        ("MULTIDIM", Config()),
        ("HYBRID k=1", Config(decomposition=Decomposition.HYBRID,
                              num_local_levels=1)),
        ("HYBRID k=2", Config(decomposition=Decomposition.HYBRID,
                              num_local_levels=2)),
    ]:
        hier = Hierarchy(shape)
        comp = Compressor(hier, np.float32, s=math.inf, config=cfg)
        t_enc = timed(f"{label} encode", comp._encode, v, tol)
        e, w, c, _ = comp._encode(v, tol)
        sync((e, w, c))
        t_dec = timed(f"{label} decode", comp._decode, e, w, tol)
        out = comp._decode(e, w, tol)
        err = float(jnp.max(jnp.abs(out - v)))
        cb = bitplane.encoded_nbytes(np.asarray(e), int(c))
        print(f"  e2e {nbytes/(t_enc+t_dec)/1e9:6.2f} GB/s  "
              f"enc {nbytes/t_enc/1e9:6.2f}  dec {nbytes/t_dec/1e9:6.2f}  "
              f"ratio {nbytes/cb:5.2f}x  err {err:.3e}", flush=True)
        assert err <= 1e-3


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
