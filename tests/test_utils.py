import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.utils import log


def test_timer_reports(capsys):
    old = log.level
    log.level = log.TIME
    try:
        with log.Timer("phase", nbytes=10**9) as t:
            pass
        assert t.seconds >= 0
        err = capsys.readouterr().err
        assert "phase" in err and "GB/s" in err
    finally:
        log.level = old


def test_release_cache_and_footprint():
    v = np.random.rand(9, 9).astype(np.float32)
    buf = mgard_tpu.compress(v, 1e-2)
    mgard_tpu.release_cache()
    out = mgard_tpu.decompress(buf)
    assert np.abs(out - v).max() <= 1e-2
    fp = mgard_tpu.estimate_memory_footprint((256, 256, 256), np.float32)
    assert 100e6 < fp < 10e9


def test_debug_mode_checks():
    """Sanitizer-mode analog (reference ASAN/UBSAN CMake options +
    SyncAllKernelsAndCheckErrors): debug mode enables jax nan-checking
    and pipeline integrity assertions."""
    import jax

    import mgard_tpu
    from mgard_tpu.utils import debug
    from tests.test_compress_e2e import smooth_field

    debug.enable()
    try:
        assert jax.config.jax_debug_nans
        v = smooth_field((33, 33), seed=77).astype(np.float32)
        buf = mgard_tpu.compress(v, 1e-3)
        out = mgard_tpu.decompress(buf)
        assert np.abs(out - v).max() <= 1e-3
        with pytest.raises(AssertionError):
            debug.check(False, "boom")
    finally:
        debug.disable()
    assert not jax.config.jax_debug_nans
