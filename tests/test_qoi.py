import math

import numpy as np
import jax.numpy as jnp

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.models.qoi import QuantityOfInterest, compress_qoi
import mgard_tpu
from tests.test_compress_e2e import smooth_field


def _mean_qoi(u):
    return jnp.mean(u)


def test_operator_norm_positive_and_monotone():
    h = Hierarchy((17, 17))
    q = QuantityOfInterest(h, _mean_qoi)
    n0 = q.norm(0.0)
    n1 = q.norm(1.0)
    assert n0 > 0
    # Smoother domain norm (larger s) makes the functional easier to
    # bound: operator norm decreases in s for this smooth functional.
    assert n1 <= n0 * 1.01


def test_weight_array_equivalent_to_callable():
    h = Hierarchy((9, 9))
    w = np.full((9, 9), 1.0 / 81)
    q1 = QuantityOfInterest(h, lambda u: jnp.sum(u * w))
    q2 = QuantityOfInterest(h, w)
    np.testing.assert_allclose(q1.component_square_norms,
                               q2.component_square_norms, rtol=1e-10)


def test_qoi_error_bounded():
    shape = (33, 33)
    h = Hierarchy(shape)
    v = smooth_field(shape, seed=50)
    q = QuantityOfInterest(h, _mean_qoi)
    tol = 1e-4
    buf = compress_qoi(v, q, tol, s=0.0)
    out = mgard_tpu.decompress(buf)
    qv = float(np.mean(v))
    qo = float(np.mean(out))
    assert abs(qv - qo) <= tol, (qv, qo)
