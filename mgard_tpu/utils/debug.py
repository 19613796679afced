"""Debug / sanitizer mode.

The reference builds with ASAN/UBSAN in debug configurations
(CMakeLists.txt:344-345) and offers
``DeviceRuntime::SyncAllKernelsAndCheckErrors`` (DeviceAdapter.h:315).
The JAX-native analog: enable ``jax_debug_nans``/``jax_debug_infs`` (every
jitted kernel re-runs op-by-op and raises at the first non-finite
intermediate — the 'sync all kernels and check' behavior), plus extra
host-side integrity assertions in the codec pipeline (encode word counts
within capacity, decoded output finite).

Enable with ``mgard_tpu.utils.debug.enable()`` or the environment
variable ``MGARD_TPU_DEBUG=1``.
"""

from __future__ import annotations

import os

_enabled = False


def enable() -> None:
    global _enabled
    import jax
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    _enabled = True


def disable() -> None:
    global _enabled
    import jax
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
    _enabled = False


def enabled() -> bool:
    return _enabled


def check(cond: bool, msg: str) -> None:
    """Debug-mode assertion (no-op unless enabled)."""
    if _enabled and not cond:
        raise AssertionError(f"mgard_tpu debug check failed: {msg}")


if os.environ.get("MGARD_TPU_DEBUG") == "1":
    enable()
