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


def test_pallas_segments_fused_matches_xla(monkeypatch):
    """Fused quantize+condense (bp_quant_max + bp_quant_condense) vs the
    XLA fallback of encode_segments: identical exponents, words, status;
    decode_segments roundtrips."""
    rng = np.random.default_rng(1)
    sizes = [17 * 17 * 17, 33 * 33 * 33, 130000]
    segs = [jnp.asarray((rng.normal(size=s)
                         * rng.choice([0.0, 1.0, 40.0, 3e3], size=s)
                         ).astype(np.float32)) for s in sizes]
    inv_q = 128.0

    monkeypatch.setenv("MGARD_TPU_PALLAS_CODEC", "0")
    e1, w1, c1, st1 = bitplane.encode_segments(segs, inv_q)

    monkeypatch.setenv("MGARD_TPU_PALLAS_CODEC", "1")
    with pltpu.force_tpu_interpret_mode():
        e2, w2, c2, st2 = bitplane.encode_segments(segs, inv_q)
        cap = bitplane.max_words_segments(sizes)
        wfull = jnp.zeros(cap, dtype=jnp.uint32).at[:int(c2)].set(
            w2[:int(c2)])
        outs = bitplane.decode_segments(e2, wfull, sizes,
                                        quantum=1.0 / inv_q)

    assert int(c1) == int(c2)
    assert int(st1) == int(st2) == 0
    assert np.array_equal(np.asarray(e1), np.asarray(e2))
    assert np.array_equal(np.asarray(w1)[:int(c1)],
                          np.asarray(w2)[:int(c2)])
    for seg, out in zip(segs, outs):
        q = np.trunc(np.abs(np.asarray(seg)) * inv_q + 0.5)
        q = np.where(np.asarray(seg) < 0, -q, q)
        assert np.abs(np.asarray(out) - q / inv_q).max() < 1e-9
