"""Pallas fused condense codec vs the XLA fallback (interpret mode).

The two implementations share one wire contract (ops/bitplane.py /
ops/pallas_kernels.py): identical exponents, identical words[:count],
and exact roundtrips — including the int32 minimum, whose zigzag image
is the all-ones word.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mgard_tpu.ops import bitplane


@pytest.mark.parametrize("n", [5000, 300000])
def test_pallas_condense_matches_xla(n, monkeypatch):
    rng = np.random.default_rng(0)
    q = (rng.normal(size=n)
         * rng.choice([0, 1, 5, 1000, 1e6], size=n)).astype(np.int32)
    q[0] = -2**31
    qj = jnp.asarray(q)

    monkeypatch.setenv("MGARD_TPU_PALLAS_CODEC", "0")
    e1, w1, c1 = jax.jit(bitplane.encode)(qj)
    out1 = jax.jit(lambda e, w: bitplane.decode(e, w, n))(e1, w1)
    assert np.array_equal(np.asarray(out1), q)

    monkeypatch.setenv("MGARD_TPU_PALLAS_CODEC", "1")
    with pltpu.force_tpu_interpret_mode():
        e2, w2, c2 = bitplane.encode(qj)
        cap = bitplane.max_words(n)
        wfull = jnp.zeros(cap, dtype=jnp.uint32).at[:int(c2)].set(
            w2[:int(c2)])
        out2 = bitplane.decode(e2, wfull, n)

    assert int(c1) == int(c2)
    assert np.array_equal(np.asarray(e1), np.asarray(e2))
    assert np.array_equal(np.asarray(w1)[:int(c1)],
                          np.asarray(w2)[:int(c2)])
    assert np.array_equal(np.asarray(out2), q)
