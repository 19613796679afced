"""Headline benchmark: encode+decode throughput on a 3-D float32 field.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: MGARD-X CUDA single-GPU end-to-end compression throughput on 3-D
float fields. The reference repo publishes figures only (doc/MGARD-X.md:279,
PNG plots); the IPDPS'21/'25 papers and those plots put single-V100/A100
end-to-end (compress+decompress) throughput in the ~5-15 GB/s range at
eb=1e-3. We take 10 GB/s as the comparison point (BASELINE.md).

Timing notes: through the tunneled TPU backend, block_until_ready() does
not reliably await device completion, so each measurement forces a host
readback of a value that depends on the computation, and the reported
time is the slope between N1 and N2 back-to-back calls (fixed sync
overhead cancels; device execution is serial per queue).
"""

import json
import math
import os
import signal
import sys
import time

import numpy as np

BASELINE_GBPS = 10.0
# Per-size wall-clock budget: first 512^3 compiles take ~1-2 min through the
# remote-compile tunnel; a wedged compile service can hang indefinitely, so
# each size gets an alarm and the bench falls back to the next size.
SIZE_BUDGET_S = int(os.environ.get("MGARD_BENCH_SIZE_BUDGET", "420"))


class _Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise _Timeout()


def smooth_field_device(shape, dtype):
    """Generate a smooth test field on-device (no host transfer)."""
    import jax
    import jax.numpy as jnp

    axes = [jnp.linspace(0.0, 1.0, s, dtype=dtype) for s in shape]
    f = jnp.zeros(shape, dtype=dtype)
    for k in (1, 3, 7):
        term = jnp.ones(shape, dtype=dtype)
        for d, x in enumerate(axes):
            shp = [1] * len(shape)
            shp[d] = len(x)
            term = term * jnp.cos(np.pi * k * x + 0.1 * k * (d + 1)).reshape(shp)
        f = f + term / k
    key = jax.random.PRNGKey(0)
    f = f + 0.001 * jax.random.normal(key, shape, dtype=dtype)
    return f


def _sync(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    picker = jax.jit(lambda a: a.reshape(-1)[0])
    return np.asarray(picker(leaf))


def timed(fn, *args, n1=2, n2=8):
    _sync(fn(*args))  # warmup/compile

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main():
    import jax

    # Persistent compilation cache: the tunneled remote-compile service is
    # slow and serial; caching compiled executables on disk makes repeat
    # bench runs (and the driver's run) start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from mgard_tpu.hierarchy import Hierarchy
    from mgard_tpu.models.compressor import Compressor

    signal.signal(signal.SIGALRM, _alarm)
    for edge in (512, 256, 128):
        shape = (edge, edge, edge)
        signal.alarm(SIZE_BUDGET_S)
        try:
            hier = Hierarchy(shape)
            comp = Compressor(hier, np.float32, s=math.inf)
            v = smooth_field_device(shape, jnp.float32)
            _sync(v)
            tol = jnp.asarray(1e-3, dtype=jnp.float32)

            t_enc = timed(comp._encode, v, tol)
            e, w, c, _ = comp._encode(v, tol)
            _sync((e, w, c))
            t_dec = timed(comp._decode, e, w, tol)

            nbytes = float(np.prod(shape)) * 4
            gbps = nbytes / (t_enc + t_dec) / 1e9

            out = comp._decode(e, w, tol)
            err = float(jnp.max(jnp.abs(out - v)))
            count = int(c)
            comp_bytes = count * 4 + int(np.asarray(e).size)
            ratio = nbytes / comp_bytes
            print(f"# shape={shape} t_enc={t_enc*1e3:.1f}ms "
                  f"t_dec={t_dec*1e3:.1f}ms err={err:.3e} "
                  f"ratio={ratio:.2f}x", file=sys.stderr)
            assert err <= 1e-3, "error bound violated in bench"

            signal.alarm(0)
            print(json.dumps({
                "metric": f"encode+decode GB/s/chip, {edge}^3 f32, eb=1e-3",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 3),
            }))
            return
        except (_Timeout, Exception) as exc:  # noqa: BLE001
            signal.alarm(0)
            print(f"# {shape} failed: {type(exc).__name__}: "
                  f"{str(exc)[:300]}", file=sys.stderr)
            continue
    raise SystemExit("all bench sizes failed")


if __name__ == "__main__":
    main()
