"""Probe: does optimization_barrier between pipeline stages fix the
composition penalty (FULL encode 110ms vs 55ms sum-of-parts)?"""

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
from mgard_tpu.ops.quantize import supremum_quantum, dequantize_pyramid


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    picker = jax.jit(lambda a: a.reshape(-1)[0])
    return np.asarray(picker(leaf))


def timed(name, fn, *args, n1=2, n2=6):
    out = fn(*args)
    sync(out)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"{name:40s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main(edge=512):
    shape = (edge, edge, edge)
    hier = Hierarchy(shape)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                 dtype=jnp.float32)
    sync(x)
    tol = jnp.asarray(1e-3, dtype=jnp.float32)
    print(f"== {shape} on {jax.devices()[0]}", flush=True)

    def fine_then_quant(v):
        pyr = transform.decompose(hier, v)
        fine = transform.pyramid_to_fine(hier, pyr)
        inv = 1.0 / supremum_quantum(hier, tol).astype(fine.dtype)
        s = fine * inv
        return jnp.trunc(jnp.copysign(0.5 + jnp.abs(s), s)).astype(jnp.int32)

    def full_barrier(v):
        q = fine_then_quant(v)
        q = jax.lax.optimization_barrier(q)
        return bitplane.encode(q.reshape(-1))
    timed("FULL encode barrier", jax.jit(full_barrier), x)

    def full_barrier_ovf(v):
        q = fine_then_quant(v)
        q = jax.lax.optimization_barrier(q)
        e, w, c = bitplane.encode(q.reshape(-1))
        return e, w, c, jnp.max(jnp.abs(q)) >= np.int32(2**31 - 1)
    timed("FULL encode barrier+ovf", jax.jit(full_barrier_ovf), x)

    def full_nobarrier(v):
        q = fine_then_quant(v)
        return bitplane.encode(q.reshape(-1))
    timed("FULL encode no barrier", jax.jit(full_nobarrier), x)

    # decode side
    e, w, c = jax.jit(full_barrier)(x)
    sync((e, w, c))
    n = int(np.prod(shape))

    def full_dec_barrier(e, w):
        flat = bitplane.decode(e, w, n)
        flat = jax.lax.optimization_barrier(flat)
        fine = flat.reshape(hier.shape)
        qpyr = transform.fine_to_pyramid(hier, fine)
        pyr = dequantize_pyramid(hier, qpyr, math.inf, tol, jnp.float32)
        return transform.recompose(hier, pyr)
    timed("FULL decode barrier", jax.jit(full_dec_barrier), e, w)

    def full_dec_nobar(e, w):
        flat = bitplane.decode(e, w, n)
        fine = flat.reshape(hier.shape)
        qpyr = transform.fine_to_pyramid(hier, fine)
        pyr = dequantize_pyramid(hier, qpyr, math.inf, tol, jnp.float32)
        return transform.recompose(hier, pyr)
    timed("FULL decode no barrier", jax.jit(full_dec_nobar), e, w)

    # barrier after every stage on decode
    def full_dec_barrier2(e, w):
        flat = bitplane.decode(e, w, n)
        flat = jax.lax.optimization_barrier(flat)
        fine = flat.reshape(hier.shape)
        qpyr = transform.fine_to_pyramid(hier, fine)
        qpyr = jax.lax.optimization_barrier(qpyr)
        pyr = dequantize_pyramid(hier, qpyr, math.inf, tol, jnp.float32)
        return transform.recompose(hier, pyr)
    timed("FULL decode barrier x2", jax.jit(full_dec_barrier2), e, w)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
