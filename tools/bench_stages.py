"""Stage-level timing of the encode/decode pipeline on the current device.

Measurement notes for the tunneled TPU ("axon") backend:
  * block_until_ready() through the tunnel does not reliably await device
    completion; the only trustworthy sync is a host readback of a value
    that depends on the computation.
  * eager ops are catastrophically slow; the harness must never touch
    device arrays eagerly inside a timed region.
  * we time N1 and N2 back-to-back calls (same executable, same queue —
    device execution is serial) and report the slope
    (t2 - t1) / (N2 - N1), which cancels fixed sync/readback overhead.
"""

import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.models.compressor import Compressor
from mgard_tpu.ops import bitplane, transform
from mgard_tpu.ops.quantize import (quantize_blocks, dequantize_blocks,
                                    quantize_pyramid, dequantize_pyramid)


@jax.jit
def _fold(*leaves):
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
    return acc


def sync(out):
    """Force real completion: fold one element of EVERY output leaf
    (single-leaf readbacks can return early through the tunnel)."""
    return np.asarray(_fold(*jax.tree_util.tree_leaves(out)))


def timed(name, fn, *args, n1=2, n2=6):
    out = fn(*args)
    sync(out)  # warmup/compile

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"{name:28s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main(edge=512):
    shape = (edge, edge, edge)
    hier = Hierarchy(shape)
    nbytes = edge**3 * 4
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                 dtype=jnp.float32)
    sync(x)
    tol = jnp.asarray(1e-3, dtype=jnp.float32)
    print(f"== {shape} f32 ({nbytes/1e6:.0f} MB) on {jax.devices()[0]}")

    # transform stages
    timed("decompose", jax.jit(lambda v: transform.decompose(hier, v)), x)
    timed("recompose", jax.jit(lambda v: transform.recompose(
        hier, transform.decompose(hier, v))), x)

    def dqf(v):
        pyr = transform.decompose(hier, v)
        qpyr = quantize_pyramid(hier, pyr, math.inf, tol)
        return transform.pyramid_to_fine(hier, qpyr).reshape(-1)
    timed("decompose+quant+to_fine", jax.jit(dqf), x)

    # bitplane stages on a realistic quantized vector
    qd = jax.jit(dqf)(x)
    sync(qd)

    timed("transpose32 only", jax.jit(
        lambda q: bitplane.transpose32(
            jnp.abs(q).astype(jnp.uint32).reshape(-1, 32).T)), qd)
    timed("bitplane encode (chunk)", jax.jit(bitplane.encode), qd)
    timed("bitplane encode (group)", jax.jit(bitplane.encode_pergroup), qd)

    e, w, c = jax.jit(bitplane.encode)(qd)
    sync((e, w, c))
    n = int(np.prod(shape))
    timed("bitplane decode (chunk)", jax.jit(
        lambda e, w: bitplane.decode(e, w, n)), e, w)
    eg, wg, cg = jax.jit(bitplane.encode_pergroup)(qd)
    sync((eg, wg, cg))
    timed("bitplane decode (group)", jax.jit(
        lambda e, w: bitplane.decode_pergroup(e, w, n)), eg, wg)
    print(f"  ratio chunk: {nbytes/bitplane.encoded_nbytes(np.asarray(e), int(c)):.2f}x"
          f"  group: {nbytes/bitplane.encoded_nbytes(np.asarray(eg), int(cg)):.2f}x",
          flush=True)

    # unflatten + dequant + recompose (decode side of the transform,
    # FINE layout — the default; the LEVEL_BLOCKS unflatten stalls the
    # compiler at 512^3 and is only used for small ratio-oriented encodes)
    def ur(flat):
        fine = flat.reshape(hier.shape)
        qpyr = transform.fine_to_pyramid(hier, fine)
        pyr = dequantize_pyramid(hier, qpyr, math.inf, tol, jnp.float32)
        return transform.recompose(hier, pyr)
    timed("unfine+deq+recompose", jax.jit(ur), qd)

    # full pipelines
    comp = Compressor(hier, np.float32, s=math.inf)
    t_enc = timed("FULL encode", comp._encode, x, tol)
    ew = comp._encode(x, tol)[:3]
    sync(ew)
    t_dec = timed("FULL decode", comp._decode, ew[0], ew[1], tol)
    print(f"e2e: {nbytes/(t_enc+t_dec)/1e9:.2f} GB/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
