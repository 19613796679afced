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


def _key(shape, dtype) -> str:
    return f"{_device_kind()}|{np.dtype(dtype).name}|" \
           f"{_size_bucket(int(np.prod(shape)))}"


def lookup(shape, dtype, path: Optional[pathlib.Path] = None
           ) -> Optional[Config]:
    """Return the tuned Config for this (device, dtype, size), if any.

    Merges the codec pick (``autotune``) with the runtime-knob winners
    (``sweep_knobs``) recorded under the same key — the reference keys
    its tables per-precision/per-dim the same way (AutoTunerSerial.h,
    AutoTuner.h:46-120).  The per-key chunk width is safe to apply
    per-workload because containers record their width (round-5)."""
    table = load_table(path)
    key = _key(shape, dtype)
    entry = table.get(key)
    knobs = table.get("knobs", {}).get(key, {})
    if entry is None and not knobs:
        return None
    kw = {}
    if entry is not None:
        kw["lossless"] = Lossless(entry["lossless"])
    cg = knobs.get("MGARD_TPU_CHUNK_GROUPS")
    if cg:
        kw["chunk_groups"] = int(cg)
    return Config(**kw)


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
        key = _key(shape, dtype)
        table[key] = {"lossless": best, "results": results,
                      "objective": objective}
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(table, indent=1))
    return {"best": Lossless(best), "results": results}


# --- runtime-knob sweep (round-4 review item #7) ---------------------------
#
# The constants that actually move throughput — codec chunk width,
# Pallas chunks-per-grid-step, the dense-matmul size cap, GPK stencils
# on/off, pipeline depth — are import-time module constants seeded from
# the environment (they shape traced programs and, for chunk_groups, the
# stream layout itself).  The sweep therefore benchmarks each candidate
# in a SUBPROCESS with the env set, exactly the reference AutoTuner's
# model of "benchmark, then persist a table the next run reads"
# (AutoTuner.h:46-120, mgard-x-autotuner.cpp) minus the source rewrite.
# Winners land in the JSON table; apply_tuned() (called from
# mgard_tpu/__init__ before the ops modules import) seeds the env with
# them so every later import runs tuned.

KNOB_ENV = {
    "chunk_groups": "MGARD_TPU_CHUNK_GROUPS",
    "bp_cb": "MGARD_TPU_BP_CB",
    "matmul_max_n": "MGARD_TPU_MATMUL_MAX_N",
    "gpk": "MGARD_TPU_GPK",
    "pipeline_depth": "MGARD_TPU_PIPELINE_DEPTH",
}

DEFAULT_GRID = {
    "chunk_groups": [1024, 2048, 4096],
    "bp_cb": [4, 8],
    "gpk": [1, 0],
}


def probe(shape, dtype=np.float32, s: float = math.inf,
          tol: float = 1e-3, iters: int = 4) -> Dict:
    """Benchmark encode+decode of the current process's configuration
    (env knobs already applied at import).  Returns {gbps, ratio, ...};
    run via ``python -m mgard_tpu.utils.autotune probe`` from sweeps."""
    import jax
    import jax.numpy as jnp

    from ..hierarchy import Hierarchy
    from ..models.compressor import Compressor
    from .cache import enable_persistent_cache

    enable_persistent_cache()
    if np.dtype(dtype) == np.dtype(np.float64):
        jax.config.update("jax_enable_x64", True)
    hier = Hierarchy(shape)
    comp = Compressor(hier, np.dtype(dtype), s=s)
    rng = np.random.default_rng(0)
    v = jnp.asarray(np.cumsum(
        rng.normal(size=shape).astype(dtype), axis=-1) * 0.01)
    tolj = jnp.asarray(tol, dtype=v.dtype)

    def sync(out):
        leaves = jax.tree_util.tree_leaves(out)
        f = jax.jit(lambda *ls: sum(x.reshape(-1)[0].astype(jnp.float32)
                                    for x in ls))
        return np.asarray(f(*leaves))

    out = comp._encode(v, tolj)
    sync(out)
    e, w, c, _ = out
    sync(comp._decode(e, w, tolj))

    def slope(fn, *args):
        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(*args)
            sync(o)
            return time.perf_counter() - t0
        t1, t2 = run(iters), run(3 * iters)
        return max((t2 - t1) / (2 * iters), 1e-9)

    t_enc = slope(comp._encode, v, tolj)
    t_dec = slope(comp._decode, e, w, tolj)
    nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
    size = int(c) * 4 + int(np.asarray(e).size)
    return {
        "gbps": nbytes / (t_enc + t_dec) / 1e9,
        "t_enc_ms": t_enc * 1e3, "t_dec_ms": t_dec * 1e3,
        "ratio": nbytes / max(size, 1),
    }


def sweep_knobs(shape=(256, 256, 256), dtype=np.float32,
                grid: Optional[Dict] = None, objective: str = "balanced",
                budget_s: int = 900, save: bool = True,
                path: Optional[pathlib.Path] = None,
                log=print, _runner=None) -> Dict:
    """One-at-a-time sweep around the current defaults: for each knob,
    benchmark each candidate in a subprocess (fresh import so the env
    takes effect), keep the winner, move to the next knob.

    Winners persist PER (device, dtype, size-bucket) under
    ``table["knobs"][key]`` — 64^3 f32, 512^3 f32 and f64 each get their
    own swept values (reference: per-precision/per-dim AutoTuner tables,
    AutoTunerSerial.h) — plus ``default_knobs``, the winners of the
    LARGEST swept bucket, which apply_tuned() seeds process-wide at
    import for the knobs that must be import-time (BP_CB, matmul cap,
    GPK).  ``_runner`` injects a probe function for tests."""
    import subprocess
    import sys

    grid = grid or DEFAULT_GRID
    current: Dict[str, object] = {}
    results: Dict[str, Dict] = {}

    def run_probe(knobs: Dict) -> Optional[Dict]:
        if _runner is not None:
            return _runner(knobs)
        env = dict(os.environ)
        # keep sweep compiles out of the committed repo cache
        env.setdefault("MGARD_TPU_CACHE_DIR", "/tmp/mgard_tpu_sweep_cache")
        for k, val in knobs.items():
            env[KNOB_ENV[k]] = str(val)
        cmd = [sys.executable, "-m", "mgard_tpu.utils.autotune", "probe",
               "--shape", *map(str, shape),
               "--dtype", np.dtype(dtype).name]
        try:
            out = subprocess.run(cmd, env=env, capture_output=True,
                                 text=True, timeout=budget_s, check=True)
            return json.loads(out.stdout.strip().splitlines()[-1])
        except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
                json.JSONDecodeError, IndexError) as exc:
            log(f"#   candidate {knobs} failed: {type(exc).__name__}")
            return None

    def score(r):
        if objective == "throughput":
            return r["gbps"]
        if objective == "ratio":
            return r["ratio"]
        return r["gbps"] * r["ratio"]

    for knob, candidates in grid.items():
        results[knob] = {}
        best_val, best_score = None, -1.0
        for cand in candidates:
            r = run_probe({**current, knob: cand})
            if r is None:
                continue
            results[knob][str(cand)] = {k: round(float(vv), 4)
                                        for k, vv in r.items()}
            log(f"# {knob}={cand}: {r['gbps']:.2f} GB/s, "
                f"ratio {r['ratio']:.2f}x")
            if score(r) > best_score:
                best_val, best_score = cand, score(r)
        if best_val is not None:
            current[knob] = best_val

    if save and current:
        path = path or _DEFAULT_PATH
        table = load_table(path)
        winners_env = {KNOB_ENV[k]: str(v) for k, v in current.items()}
        knobs_tbl = table.setdefault("knobs", {})
        key = _key(shape, dtype)
        knobs_tbl[key] = dict(winners_env,
                              _ndof=int(np.prod(shape)))
        # default_knobs = the largest swept bucket's winners (import-time
        # seeding); per-workload widths come from lookup()/Config.tuned.
        largest = max(knobs_tbl.values(),
                      key=lambda e: e.get("_ndof", 0))
        table["default_knobs"] = {k: v for k, v in largest.items()
                                  if not k.startswith("_")}
        table.setdefault("sweeps", {})[
            f"{np.dtype(dtype).name}|{'x'.join(map(str, shape))}"] = results
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(table, indent=1))
    return {"winners": current, "results": results}


def apply_tuned(path: Optional[pathlib.Path] = None) -> None:
    """Seed env defaults from the persisted sweep winners.  Called from
    mgard_tpu/__init__ BEFORE the ops modules import; explicit user env
    always wins (setdefault)."""
    try:
        table = load_table(path)
    except (OSError, json.JSONDecodeError):
        return
    for env_key, val in table.get("default_knobs", {}).items():
        if env_key in KNOB_ENV.values():
            os.environ.setdefault(env_key, str(val))


def _main(argv=None):
    import argparse

    p = argparse.ArgumentParser(prog="mgard_tpu.utils.autotune")
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("probe")
    pr.add_argument("--shape", nargs="+", type=int, required=True)
    pr.add_argument("--dtype", default="float32")
    pr.add_argument("--tol", type=float, default=1e-3)
    sw = sub.add_parser("sweep")
    sw.add_argument("--shape", nargs="+", type=int,
                    default=[256, 256, 256])
    sw.add_argument("--dtype", default="float32")
    sw.add_argument("--objective", default="balanced")
    args = p.parse_args(argv)
    if args.cmd == "probe":
        r = probe(tuple(args.shape), np.dtype(args.dtype), tol=args.tol)
        print(json.dumps(r))
    else:
        r = sweep_knobs(tuple(args.shape), np.dtype(args.dtype),
                        objective=args.objective)
        print(json.dumps(r))


if __name__ == "__main__":
    _main()
