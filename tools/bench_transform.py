"""Bisect the 512^3 transform cost on hardware (round-3 perf work).

Timing methodology: the tunneled backend's only reliable sync is a host
readback of a value that depends on the computation; earlier probes
synced only the FIRST tree leaf (the coarsest pyramid level), which can
complete early and produced impossible numbers (decompose "3.3 ms").
Here the picker folds one element of EVERY leaf, and slopes use larger
rep counts.
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

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import bitplane, transform
from mgard_tpu.ops.quantize import quantize_pyramid, dequantize_pyramid


@jax.jit
def _fold(*leaves):
    acc = jnp.zeros((), jnp.float64)
    for leaf in leaves:
        acc = acc + leaf.reshape(-1)[0].astype(jnp.float64)
    return acc


def sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(_fold(*leaves))


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
    print(f"{name:36s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main(edge=512):
    shape = (edge, edge, edge)
    hier = Hierarchy(shape)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                 dtype=jnp.float32)
    sync(x)
    tol = jnp.asarray(1e-3, dtype=jnp.float32)
    print(f"== {shape} f32 on {jax.devices()[0]}", flush=True)

    L = hier.L

    # finest-level single ops
    timed("extract level L (matmul)",
          jax.jit(lambda v: transform._extract_old_all(hier, v, L)), x)
    C = jax.jit(lambda v: transform._extract_old_all(hier, v, L))(x)
    sync(C)
    timed("prolong level L (matmul)",
          jax.jit(lambda c: transform._prolong_all(hier, c, L)), C)
    timed("correction level L (matmul)",
          jax.jit(lambda v: transform._correction(hier, v, L)), x)
    timed("embed level L (matmul)",
          jax.jit(lambda c: transform._embed_old(hier, c, L)), C)
    timed("zero_old level L",
          jax.jit(lambda v: transform._zero_old(hier, v, L)), x)

    # whole stages
    timed("decompose", jax.jit(lambda v: transform.decompose(hier, v)), x)
    pyr = jax.jit(lambda v: transform.decompose(hier, v))(x)
    sync(pyr)
    timed("recompose", jax.jit(
        lambda p: transform.recompose(hier, p)), pyr)
    timed("pyramid_to_fine", jax.jit(
        lambda p: transform.pyramid_to_fine(hier, p)), pyr)
    fine = jax.jit(lambda p: transform.pyramid_to_fine(hier, p))(pyr)
    sync(fine)
    timed("fine_to_pyramid", jax.jit(
        lambda f: transform.fine_to_pyramid(hier, f)), fine)

    def enc_transform(v):
        p = transform.decompose(hier, v)
        qp = quantize_pyramid(hier, p, math.inf, tol)
        return transform.pyramid_to_fine(hier, qp).reshape(-1)
    timed("encode transform (dec+q+fine)", jax.jit(enc_transform), x)

    qd = jax.jit(enc_transform)(x)
    sync(qd)

    def dec_transform(flat):
        f = flat.reshape(hier.shape)
        qp = transform.fine_to_pyramid(hier, f)
        p = dequantize_pyramid(hier, qp, math.inf, tol, jnp.float32)
        return transform.recompose(hier, p)
    timed("decode transform (unfine+dq+rec)", jax.jit(dec_transform), qd)

    timed("bp encode", jax.jit(bitplane.encode), qd)
    e, w, c = jax.jit(bitplane.encode)(qd)
    sync((e, w))
    n = int(np.prod(shape))
    timed("bp decode", jax.jit(lambda e, w: bitplane.decode(e, w, n)), e, w)


def variants(edge=512):
    """Time the non-matmul fallback forms of the selection/interp ops."""
    shape = (edge, edge, edge)
    hier = Hierarchy(shape)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                 dtype=jnp.float32)
    sync(x)
    L = hier.L
    print(f"== variants {shape} on {jax.devices()[0]}", flush=True)

    def extract_slices(v):
        for d in range(hier.ndim):
            v = transform.extract_old(v, hier.dims[d][L], d)
        return v
    timed("extract level L (slices)", jax.jit(extract_slices), x)
    C = jax.jit(extract_slices)(x)
    sync(C)

    def prolong_pads(c):
        for d in range(hier.ndim):
            c = transform.prolong(c, hier.dims[d][L], d)
        return c
    timed("prolong level L (pads)", jax.jit(prolong_pads), C)

    def embed_pads(c):
        import os
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
    timed("embed level L (pads)", jax.jit(embed_pads), C)

    def detail_via_pads(v):
        c = extract_slices(v)
        return v - prolong_pads(c)
    timed("detail = v - P(E(v)) (pads)", jax.jit(detail_via_pads), x)

    def detail_via_matmul(v):
        c = transform._extract_old_all(hier, v, L)
        return v - transform._prolong_all(hier, c, L)
    timed("detail = v - P(E(v)) (matmul)", jax.jit(detail_via_matmul), x)


if __name__ == "__main__":
    edge = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    if len(sys.argv) > 2 and sys.argv[2] == "variants":
        variants(edge)
    else:
        main(edge)
