"""mgard_tpu: a TPU-native error-bounded scientific data compressor.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
CODARcode/MGARD: multigrid decomposition with guaranteed L-inf / s-norm
error bounds, levelwise quantization, TPU-resident lossless coding, a
self-describing container format, progressive (MDR) refactoring, and
data-parallel scaling over TPU meshes.
"""

# Seed env defaults from the persisted autotune winners BEFORE the ops
# modules import (their kernel-shaping constants read the env at import;
# the reference analog rebuilds with AutoTuner-rewritten tables).
from .utils.autotune import apply_tuned as _apply_tuned

_apply_tuned()

from .api import (compress, decompress, estimate_memory_footprint,  # noqa: F401,E402
                  release_cache)
from .config import Config, ErrorMode, Lossless  # noqa: F401
from .hierarchy import Hierarchy  # noqa: F401
from .models.compressor import Compressor, get_compressor  # noqa: F401

__version__ = "0.1.0"
