"""One-off probes for the encode/decode gap analysis (TPU).

Times individual sub-stages of the FULL encode/decode at 512^3 to find
where the pipeline loses time vs the sum of its parts.
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
from mgard_tpu.ops.quantize import quantize_pyramid, supremum_quantum


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
    print(f"{name:36s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main(edge=512):
    shape = (edge, edge, edge)
    hier = Hierarchy(shape)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                 dtype=jnp.float32)
    sync(x)
    tol = jnp.asarray(1e-3, dtype=jnp.float32)
    print(f"== {shape} on {jax.devices()[0]}", flush=True)

    # piecewise: pyramid -> to_fine float -> quantize fine
    def tofine_float(v):
        pyr = transform.decompose(hier, v)
        return transform.pyramid_to_fine(hier, pyr)
    timed("decompose+to_fine (float)", jax.jit(tofine_float), x)

    def quant_then_fine(v):
        pyr = transform.decompose(hier, v)
        qpyr = quantize_pyramid(hier, pyr, math.inf, tol)
        return transform.pyramid_to_fine(hier, qpyr)
    timed("decompose+quant+to_fine", jax.jit(quant_then_fine), x)

    def fine_then_quant(v):
        fine = tofine_float(v)
        inv = 1.0 / supremum_quantum(hier, tol).astype(fine.dtype)
        s = fine * inv
        return jnp.trunc(jnp.copysign(0.5 + jnp.abs(s), s)).astype(jnp.int32)
    timed("decompose+to_fine+quant(fused)", jax.jit(fine_then_quant), x)

    # encode pieces
    qd = jax.jit(fine_then_quant)(x).reshape(-1)
    sync(qd)

    timed("bp encode", jax.jit(bitplane.encode), qd)

    def enc_with_overflow(q):
        e, w, c = bitplane.encode(q)
        return e, w, c, jnp.max(jnp.abs(q)) >= np.int32(2**31 - 1)
    timed("bp encode + overflow max", jax.jit(enc_with_overflow), qd)

    def full_noovf(v):
        q = fine_then_quant(v).reshape(-1)
        return bitplane.encode(q)
    timed("FULL encode (no overflow)", jax.jit(full_noovf), x)

    def full_ovf(v):
        q = fine_then_quant(v).reshape(-1)
        e, w, c = bitplane.encode(q)
        return e, w, c, jnp.max(jnp.abs(q)) >= np.int32(2**31 - 1)
    timed("FULL encode (overflow)", jax.jit(full_ovf), x)

    # encode without the condense gather (planes written raw)
    def enc_nocondense(q):
        n = q.shape[0]
        C = bitplane.CHUNK_GROUPS
        vpc = bitplane.GROUP * C
        nchunks = -(-n // vpc)
        qc = q.reshape(nchunks, bitplane.GROUP, C)
        from mgard_tpu.ops.pallas_kernels import bp_encode_core
        return bp_encode_core(qc)
    timed("bp encode core only (pallas)", jax.jit(enc_nocondense), qd)

    # the condense gather alone
    pl, sg, ee = jax.jit(enc_nocondense)(qd)
    sync((pl, sg, ee))

    def condense(planes_c, sign_c, e):
        nchunks = planes_c.shape[0]
        C = bitplane.CHUNK_GROUPS
        GROUP = bitplane.GROUP
        counts = jnp.where(e > 0, e + 1, 0)
        offsets = jnp.cumsum(counts) - counts
        total_rows = offsets[-1] + counts[-1]
        rows2d = jnp.concatenate(
            [sign_c, planes_c.reshape(nchunks * GROUP, C)], axis=0)
        cap_rows = nchunks * (GROUP + 1)
        marks = jnp.zeros(cap_rows + 1, dtype=jnp.int32).at[offsets].add(
            1, indices_are_sorted=True)
        cid = jnp.clip(jnp.cumsum(marks[:-1]) - 1, 0, nchunks - 1)
        j = jnp.arange(cap_rows, dtype=jnp.int32)
        slot = jnp.clip(j - offsets[cid], 0, GROUP)
        plane_idx = jnp.clip(e[cid] - slot, 0, GROUP - 1)
        src = jnp.where(slot == 0, cid, nchunks + cid * GROUP + plane_idx)
        rows = jnp.take(rows2d, src, axis=0)
        rows = jnp.where((j < total_rows)[:, None], rows, np.uint32(0))
        return rows, total_rows
    timed("condense gather only", jax.jit(condense), pl, sg, ee)

    # decode side
    e, w, c = jax.jit(bitplane.encode)(qd)
    sync((e, w, c))
    n = int(np.prod(shape))
    timed("bp decode", jax.jit(lambda e, w: bitplane.decode(e, w, n)), e, w)

    def deq_unfine(flat):
        fine = flat.reshape(hier.shape)
        qpyr = transform.fine_to_pyramid(hier, fine)
        from mgard_tpu.ops.quantize import dequantize_pyramid
        return dequantize_pyramid(hier, qpyr, math.inf, tol, jnp.float32)
    timed("unfine+dequant only", jax.jit(deq_unfine), qd)

    def recomp(flat):
        pyr = deq_unfine(flat)
        return transform.recompose(hier, pyr)
    timed("unfine+deq+recompose", jax.jit(recomp), qd)

    def full_dec(e, w):
        flat = bitplane.decode(e, w, n)
        return recomp(flat)
    timed("FULL decode", jax.jit(full_dec), e, w)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
