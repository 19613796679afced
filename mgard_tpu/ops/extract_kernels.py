"""One-pass Pallas coarse-extraction kernel.

``_extract_old_all``'s dim-0-slice + two-selection-matmul chain reads
the fine array once but materializes two intermediates, measuring
2.74 ms at 512^3 (BASELINE.md round-5 profile) against a ~0.9 ms
read-once bound.  This kernel reads each fine plane exactly once and
emits the coarse block directly:

* dim 0 (outer): the grid runs over coarse rows; the BlockSpec index
  map picks fine row ``min(2 i, n0 - 1)`` — both the stride-2 (odd n)
  and the front-interleaved nondyadic (even n) hierarchies place their
  coarse nodes at "evens of the even prefix, plus the last node", so
  one map covers every level;
* dim 1 (sublanes): an in-register split ``x[:m].reshape(m//2, 2,
  n2)[:, 0]`` selects even sublanes, plus the last row;
* dim 2 (lanes): a 0/1 selection ``dot`` at HIGHEST precision on the
  MXU — bit-exact for selection operands (the same argument as the
  dense embed/extract matrices in ops/transform.py).

The output is bit-identical to the matmul chain (asserted by
tools/verify_tpu.py check 0b on hardware), so container bytes do not
change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hierarchy import Hierarchy

__all__ = ["extract_supported", "extract_coarse_3d"]


def _evens_plus_last(pos, n: int) -> bool:
    want = np.append(np.arange(0, n - 1, 2), n - 1)
    return pos is not None and len(pos) == len(want) \
        and np.array_equal(np.asarray(pos), want)


def extract_supported(hier: Hierarchy, l: int) -> bool:
    """True when the fused kernel covers (hier, l): TPU backend, 3
    non-flat dims, every dim's coarse set in the evens-plus-last
    pattern, and a lane-dim worth tiling."""
    if jax.default_backend() != "tpu":
        return False
    dims = [d for d in range(hier.ndim) if hier.shape[d] > 1]
    if hier.ndim != 3 or dims != [0, 1, 2]:
        return False
    for d in range(3):
        lev = hier.dims[d][l]
        if not _evens_plus_last(lev.coarse_pos, lev.n):
            return False
    # small grids gain nothing and the (1, n1, n2) block would be tiny
    return hier.dims[2][l].n >= 128 and hier.dims[0][l].n >= 8


def _mk_kernel(n1: int, n2: int, nc1: int):
    m = n1 - (n1 % 2)          # largest even sublane prefix

    def kernel(e_ref, a_ref, c_ref):
        x = a_ref[0]                                   # (n1, n2)
        ev = x[:m].reshape(m // 2, 2, n2)[:, 0]        # even sublanes
        rows = jnp.concatenate([ev, x[n1 - 1:n1]], axis=0)   # (nc1, n2)
        c_ref[0] = jax.lax.dot_general(
            rows, e_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    return kernel


def extract_coarse_3d(hier: Hierarchy, A: jax.Array, l: int) -> jax.Array:
    """Coarse nodes of the dense level-``l`` array, one fused pass."""
    n0, n1, n2 = A.shape
    nc0 = len(hier.dims[0][l].coarse_pos)
    nc1 = len(hier.dims[1][l].coarse_pos)
    nc2 = len(hier.dims[2][l].coarse_pos)
    E = np.zeros((n2, nc2), dtype=np.float32)
    E[np.asarray(hier.dims[2][l].coarse_pos), np.arange(nc2)] = 1.0

    return pl.pallas_call(
        _mk_kernel(n1, n2, nc1),
        grid=(nc0,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # E, whole
            pl.BlockSpec((1, n1, n2),
                         lambda i: (jnp.minimum(2 * i, n0 - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nc1, nc2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc0, nc1, nc2), A.dtype),
    )(jnp.asarray(E), A)
