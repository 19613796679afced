import math

import numpy as np
import jax.numpy as jnp
import pytest

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import transform
from mgard_tpu.ops.quantize import quantize_blocks, dequantize_blocks


@pytest.mark.parametrize("s", [math.inf, 0.0, 1.0, -1.0])
def test_quantize_roundtrip_error(s):
    rng = np.random.default_rng(7)
    h = Hierarchy((9, 9))
    blocks = [jnp.asarray(rng.normal(size=bs))
              for (_, _, bs, _) in transform.block_specs(h)]
    tol = 0.1
    q = quantize_blocks(h, blocks, s, tol)
    back = dequantize_blocks(h, q, s, tol, jnp.float64)
    # Per-coefficient error must be at most half that coefficient's quantum
    # (the aggregate-norm bound follows from the theory; tested e2e).
    from mgard_tpu.ops.quantize import (_block_inv_quantum_volume,
                                        supremum_quantum)
    specs = transform.block_specs(h)
    for (l, r, bs, pos), b, b2 in zip(specs, blocks, back):
        err = np.abs(np.asarray(b) - np.asarray(b2))
        if s == math.inf:
            quantum = float(supremum_quantum(h, tol)) * np.ones(bs)
        else:
            ws = _block_inv_quantum_volume(h, l, pos)
            inv = np.ones(bs)
            for d, w in enumerate(ws):
                shp = [1] * len(bs)
                shp[d] = len(w)
                inv = inv * w.reshape(shp)
            quantum = 2 * tol / (2.0 ** (s * l) * np.sqrt(h.ndof()) * inv)
        assert (err <= quantum / 2 * (1 + 1e-12)).all()


def test_linf_quantum_value():
    h = Hierarchy((5, 5))
    from mgard_tpu.ops.quantize import supremum_quantum
    # 2*tol / ((L+1) * (1 + 3^d)); L=2, d=2 -> 2*tol/30
    np.testing.assert_allclose(
        float(supremum_quantum(h, 0.3)), 2 * 0.3 / (3 * 10))


def test_rounding_half_away():
    h = Hierarchy((3,))
    blocks = [jnp.asarray(v) for v in ([0.74, -0.74], [0.76])]
    specs = transform.block_specs(h)
    assert len(specs) == len(blocks)
    # L=1, d=1 -> quantum = 2*tol/(2*4) = tol/4. tol=1 -> q=0.25.
    q = quantize_blocks(h, blocks, math.inf, 1.0)
    np.testing.assert_array_equal(np.asarray(q[0]), [3, -3])
    np.testing.assert_array_equal(np.asarray(q[1]), [3])
