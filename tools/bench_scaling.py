"""Weak-scaling harness for the sharded (multi-chip) pipeline.

North-star row 3 (BASELINE.md): "GB/s measured at 1 chip, 1 host,
N>=2 hosts".  Real multi-chip hardware is not reachable from this
environment (one tunneled v5e chip), so the harness records two
complementary curves:

  * ``--tpu``: the real chip at mesh size 1 — absolute GB/s/chip of the
    sharded program (the same jitted shard_map step that runs on a pod
    slice; on N chips the program is identical, the mesh just grows).
  * default (CPU): a virtual 1/2/4/8-device host mesh
    (``--xla_force_host_platform_device_count``) — relative weak-scaling
    efficiency of the COMPILED program (collective/dispatch overheads
    included; absolute numbers are meaningless on the emulated backend,
    the curve shape is the signal).

Each mesh size compresses one 64^3 block per device (weak scaling), via
ShardedCompressor.roundtrip_step — the unified pipeline, not a fork.

Writes one JSON line per mesh size and a summary to SCALING.json.

Usage:
    python tools/bench_scaling.py            # virtual CPU mesh curve
    python tools/bench_scaling.py --tpu      # real-chip absolute point
"""

import json
import math
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

if "--tpu" not in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    from mgard_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache("/root/.cache/jax_comp")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from mgard_tpu.parallel.sharded import ShardedCompressor  # noqa: E402

# Per-device block edge.  The virtual CPU mesh keeps blocks small (the
# emulated backend only measures relative curve shape); the real-chip
# absolute point uses a block big enough that fixed dispatch/sync
# latency through the tunnel does not dominate (a 64^3 block is 1 MB —
# pure latency floor).
EDGE = 256 if "--tpu" in sys.argv else 64
EDGE = int(os.environ.get("MGARD_SCALING_EDGE", EDGE))


def field(nblocks):
    shape = (nblocks * EDGE, EDGE, EDGE)
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, shape[0], dtype=np.float32)
    v = (np.sin(6 * x)[:, None, None]
         * np.cos(np.linspace(0, 3, EDGE, dtype=np.float32))[None, :, None]
         * np.linspace(0, 1, EDGE, dtype=np.float32)[None, None, :]
         + 0.001 * rng.standard_normal(shape)).astype(np.float32)
    return np.stack(np.split(v, nblocks, axis=0))


def run(n_dev, reps=30):
    devices = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("blocks",))
    sc = ShardedCompressor(mesh, "blocks", (EDGE, EDGE, EDGE), np.float32)
    blocks = field(n_dev)
    vb = sc.shard_blocks(blocks)
    tol = jnp.asarray([1e-2], dtype=jnp.float32)
    step = sc.roundtrip_step()
    err, words = step(vb, tol)     # compile + warm
    assert float(err) <= 1e-2, f"bound violated: {float(err)}"
    t0 = time.perf_counter()
    for _ in range(reps):
        err, words = step(vb, tol)
    _ = float(err)
    dt = (time.perf_counter() - t0) / reps
    nbytes = blocks.nbytes * 2     # encode + decode of every block
    return {
        "devices": n_dev,
        "step_ms": round(dt * 1e3, 3),
        "gbps_total": round(nbytes / dt / 1e9, 3),
        "gbps_per_chip": round(nbytes / dt / 1e9 / n_dev, 3),
    }


def main():
    backend = jax.default_backend()
    avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= avail]
    rows = []
    for n in sizes:
        r = run(n)
        r["backend"] = backend
        print(json.dumps(r), flush=True)
        rows.append(r)
    if len(rows) > 1:
        base = rows[0]["gbps_per_chip"]
        for r in rows:
            r["weak_scaling_efficiency"] = round(
                r["gbps_per_chip"] / base, 3)
    out = {"edge_per_block": EDGE, "rows": rows}
    path = REPO / "SCALING.json"
    existing = {}
    if path.exists():
        try:
            existing = json.loads(path.read_text())
        except Exception:
            existing = {}
    existing[backend] = out
    path.write_text(json.dumps(existing, indent=1))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
