"""Quantity-of-interest preservation (MGARD-QOI).

Counterpart of mgard::TensorQuantityOfInterest
(include/TensorQuantityOfInterest.tpp:10-54): for a linear functional Q on
the function space, compute its operator norm as a map (V, ||.||_s) -> R;
compressing with s-norm tolerance ``tol / ||Q||_{-s}`` then guarantees
|Q(u) - Q(u')| <= tol.

TPU-native twist: the reference evaluates the functional against every one
of the ndof basis hats (an O(ndof) loop of functional calls,
TensorQuantityOfInterest.tpp:26-33).  Here the load vector is one
reverse-mode AD pass: f = grad(Q) — exact for linear functionals, and one
jitted evaluation instead of ndof.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..hierarchy import Hierarchy
from ..ops import norms
from ..ops.transform import _level_dims
from ..ops.tridiag import mass_solve

__all__ = ["QuantityOfInterest", "compress_qoi"]


class QuantityOfInterest:
    """Operator-norm machinery for a linear functional Q(u).

    ``functional`` is either a callable ``Q(u) -> scalar`` (linear in u; u
    has the hierarchy's shape) or an explicit weight array of that shape
    (``Q(u) = sum(w * u)``).
    """

    def __init__(self, hier: Hierarchy,
                 functional: Union[Callable, np.ndarray]):
        self.hier = hier
        if callable(functional):
            zero = jnp.zeros(hier.shape, dtype=jnp.float64)
            f = jax.grad(lambda u: jnp.asarray(functional(u),
                                               dtype=jnp.float64))(zero)
        else:
            f = jnp.asarray(functional, dtype=jnp.float64)
            if tuple(f.shape) != hier.shape:
                raise ValueError("weight array shape mismatch")

        @jax.jit
        def comps_fn(f):
            # Riesz representative r solves M r = f on the finest level.
            r = f
            for d in _level_dims(hier, hier.L):
                lev = hier.dims[d][hier.L]
                r = mass_solve(r, lev.offdiag, lev.divisors, d)
            return norms.orthogonal_component_square_norms(hier, r)

        self.component_square_norms = [float(c) for c in comps_fn(f)]

    def norm(self, s: float) -> float:
        """Norm of Q as an operator on (V, ||.||_s)
        (TensorQuantityOfInterest.tpp:47-54)."""
        return math.sqrt(sum(
            2.0 ** (2 * -s * l) * c
            for l, c in enumerate(self.component_square_norms)))


def compress_qoi(data, qoi: QuantityOfInterest, tolerance: float,
                 s: float = 0.0, config: Optional[Config] = None) -> bytes:
    """Compress so that |Q(u) - Q(decompressed)| <= tolerance."""
    from ..api import compress
    tau = tolerance / qoi.norm(s)
    return compress(np.asarray(data), tau, s=s, config=config)
