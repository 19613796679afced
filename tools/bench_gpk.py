"""Probe the roll-stencil interpolation forms vs the dense matmuls
(round-3 perf work: kill the MXU passes spent on 2-nonzero matrices).

Run on TPU:  python tools/bench_gpk.py [edge]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import stencil, transform


@jax.jit
def _fold(*leaves):
    acc = jnp.zeros((), jnp.float64)
    for leaf in leaves:
        acc = acc + leaf.reshape(-1)[0].astype(jnp.float64)
    return acc


def sync(out):
    return np.asarray(_fold(*jax.tree_util.tree_leaves(out)))


def timed(name, fn, *args, n1=4, n2=12):
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
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main(edge=512):
    shape = (edge, edge, edge)
    hier = Hierarchy(shape)
    L = hier.L
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                 dtype=jnp.float32)
    sync(x)
    print(f"== {shape} f32 on {jax.devices()[0]} L={L}", flush=True)
    print(f"stencil supported at L: {stencil.supported(hier, L)}",
          flush=True)

    # -- correctness first (small helper on the same device) ------------
    def detail_matmul(v):
        c = transform._extract_old_all(hier, v, L)
        return v - transform._prolong_all(hier, c, L)

    d_mm = jax.jit(detail_matmul)(x)
    d_st = jax.jit(lambda v: stencil.detail_stencil(hier, v, L))(x)
    diff = float(jnp.max(jnp.abs(d_mm - d_st)))
    bitsame = bool(jnp.all(d_mm == d_st))
    print(f"detail stencil vs matmul: maxdiff={diff:.3e} "
          f"bit-identical={bitsame}", flush=True)

    C = jax.jit(lambda v: transform._extract_old_all(hier, v, L))(x)
    sync(C)
    p_mm = jax.jit(lambda c: transform._prolong_all(hier, c, L))(C)
    p_st = jax.jit(lambda c: stencil.interp_all(
        hier, transform._embed_old(hier, c, L), L))(C)
    print(f"prolong stencil vs matmul: "
          f"maxdiff={float(jnp.max(jnp.abs(p_mm - p_st))):.3e} "
          f"bit-identical={bool(jnp.all(p_mm == p_st))}", flush=True)

    # -- timings ---------------------------------------------------------
    timed("detail (matmul extract+prolong+sub)", jax.jit(detail_matmul), x)
    timed("detail (roll stencil)",
          jax.jit(lambda v: stencil.detail_stencil(hier, v, L)), x)
    timed("interp_all alone (rolls)",
          jax.jit(lambda v: stencil.interp_all(hier, v, L)), x)
    timed("extract (matmul)",
          jax.jit(lambda v: transform._extract_old_all(hier, v, L)), x)

    timed("prolong (matmul)",
          jax.jit(lambda c: transform._prolong_all(hier, c, L)), C)
    timed("embed (matmul)",
          jax.jit(lambda c: transform._embed_old(hier, c, L)), C)

    def embed_pads(c):
        for d in range(hier.ndim):
            lev = hier.dims[d][L]
            zero = jnp.zeros((), dtype=c.dtype)
            fc = lev.front_nc
            nc = c.shape[d]
            if lev.coarse_is_stride2:
                cfg = [(0, 0, 0)] * c.ndim
                cfg[d] = (0, 0, 1)
                c = jax.lax.pad(c, zero, cfg)
            else:
                of = jax.lax.slice_in_dim(c, 0, fc, axis=d)
                ot = jax.lax.slice_in_dim(c, fc, nc, axis=d)
                cfg = [(0, 0, 0)] * c.ndim
                cfg[d] = (0, 0, 1)
                c = jnp.concatenate(
                    [jax.lax.pad(of, zero, cfg), ot], axis=d)
        return c
    timed("embed (interior pads)", jax.jit(embed_pads), C)

    timed("prolong (embed-matmul + rolls)",
          jax.jit(lambda c: stencil.interp_all(
              hier, transform._embed_old(hier, c, L), L)), C)
    timed("prolong (embed-pads + rolls)",
          jax.jit(lambda c: stencil.interp_all(hier, embed_pads(c), L)), C)

    # whole decompose/recompose with the stencil wired in via env knob
    timed("decompose (current)",
          jax.jit(lambda v: transform.decompose(hier, v)), x)
    pyr = jax.jit(lambda v: transform.decompose(hier, v))(x)
    sync(pyr)
    timed("recompose (current)",
          jax.jit(lambda p: transform.recompose(hier, p)), pyr)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
