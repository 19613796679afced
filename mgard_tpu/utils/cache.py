"""Persistent-compilation-cache helper.

The reference autotuner bakes tuned configurations into source so a
rebuild ships them (AutoTuner.h:46-120).  The TPU-native analogue of
"shipping compiled state" is JAX's persistent compilation cache: compiled
TPU executables are serialized into a directory keyed by (program, jax
version, backend fingerprint).  We keep that directory INSIDE the repo
(``.jax_cache/``, committed) so a fresh checkout on the same machine
starts warm — through a tunneled remote-compile service a cold 512^3
pipeline compile can take minutes, while a cache hit loads in
milliseconds.

Call :func:`enable_persistent_cache` before any jit compilation (it is
idempotent).  ``MGARD_TPU_CACHE_DIR`` overrides the location; setting it
to the empty string disables the cache.
"""

from __future__ import annotations

import os
import pathlib

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
DEFAULT_CACHE_DIR = str(_REPO_ROOT / ".jax_cache")

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``).  Returns the directory used, or None when
    disabled via ``MGARD_TPU_CACHE_DIR=""``."""
    global _enabled
    import jax

    env = os.environ.get("MGARD_TPU_CACHE_DIR")
    if path is None:
        path = env if env is not None else DEFAULT_CACHE_DIR
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Through the tunnel even tiny compiles take seconds; cache all
        # of them.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        return None
    return path
