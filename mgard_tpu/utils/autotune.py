"""Autotuner: benchmark codec configurations and persist the winners.

Counterpart of the reference AutoTuner
(include/mgard-x/RuntimeX/AutoTuners/, src/mgard-x/Executables/
mgard-x-autotuner.cpp), which benchmarks per-kernel block sizes and
*rewrites its own source tables* requiring a rebuild
(AutoTuner.h:46-120).  Here tuning results go to a JSON table keyed by
(device kind, dtype, size bucket) and are consulted at Config build time —
no rebuild, no source mutation.
"""

from __future__ import annotations

import json
import math
import os
import pathlib
import time
from typing import Dict, List, Optional

import numpy as np

from ..config import Config, Lossless

_DEFAULT_PATH = pathlib.Path(
    os.environ.get("MGARD_TPU_AUTOTUNE",
                   os.path.expanduser("~/.cache/mgard_tpu/autotune.json")))


def _size_bucket(ndof: int) -> str:
    return f"2^{max(10, int(math.log2(max(ndof, 1))))}"


def _device_kind() -> str:
    import jax
    return jax.devices()[0].device_kind.replace(" ", "_")


def load_table(path: Optional[pathlib.Path] = None) -> Dict:
    path = path or _DEFAULT_PATH
    if path.exists():
        return json.loads(path.read_text())
    return {}


def lookup(shape, dtype, path: Optional[pathlib.Path] = None
           ) -> Optional[Config]:
    """Return the tuned Config for this (device, dtype, size), if any."""
    table = load_table(path)
    key = f"{_device_kind()}|{np.dtype(dtype).name}|" \
          f"{_size_bucket(int(np.prod(shape)))}"
    entry = table.get(key)
    if entry is None:
        return None
    return Config(lossless=Lossless(entry["lossless"]))


def autotune(shape, dtype=np.float32, s: float = math.inf,
             candidates: Optional[List[Lossless]] = None,
             objective: str = "balanced", iters: int = 3,
             save: bool = True,
             path: Optional[pathlib.Path] = None) -> Dict:
    """Benchmark codecs for this shape/dtype on the current device.

    objective: "throughput" (GB/s), "ratio", or "balanced"
    (GB/s * ratio).  Returns the per-candidate results and persists the
    winner when ``save``.
    """
    import jax
    import jax.numpy as jnp

    from ..hierarchy import Hierarchy
    from ..models.compressor import Compressor

    if candidates is None:
        candidates = [Lossless.BITPLANE, Lossless.BITPLANE_GROUP]

    hier = Hierarchy(shape)
    nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
    rng = np.random.default_rng(0)
    v = jnp.asarray(np.cumsum(
        rng.normal(size=shape).astype(dtype), axis=-1))  # smooth-ish
    tol = jnp.asarray(1e-3, dtype=v.dtype)

    results = {}
    for cand in candidates:
        comp = Compressor(hier, np.dtype(dtype), s=s,
                          config=Config(lossless=cand))
        out = comp._encode(v, tol)
        jax.block_until_ready(out)
        # slope timing (see bench.py for why)
        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = comp._encode(v, tol)
            leaf = jax.tree_util.tree_leaves(o)[0]
            np.asarray(jax.jit(lambda a: a.reshape(-1)[0])(leaf))
            return time.perf_counter() - t0
        t = max((run(2 * iters) - run(iters)) / iters, 1e-9)
        e, w, c, _ = comp._encode(v, tol)
        size = int(c) * 4 + int(np.asarray(e).size)
        gbps = nbytes / t / 1e9
        ratio = nbytes / max(size, 1)
        results[int(cand)] = {"gbps": gbps, "ratio": ratio}

    def score(r):
        if objective == "throughput":
            return r["gbps"]
        if objective == "ratio":
            return r["ratio"]
        return r["gbps"] * r["ratio"]

    best = max(results, key=lambda k: score(results[k]))
    if save:
        path = path or _DEFAULT_PATH
        table = load_table(path)
        key = f"{_device_kind()}|{np.dtype(dtype).name}|" \
              f"{_size_bucket(int(np.prod(shape)))}"
        table[key] = {"lossless": best, "results": results,
                      "objective": objective}
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(table, indent=1))
    return {"best": Lossless(best), "results": results}
