"""Norms of functions on a mesh hierarchy (reference TensorNorms,
include/TensorNorms.tpp:17-135).

* L-infinity: max |u|.
* L2: sqrt(u' M u) with M the finest-level tensor mass matrix.
* s-norm: sqrt( sum_l 2^{2sl} ||P_l u - P_{l-1} u||_{L2}^2 ) computed via
  the orthogonal-component decomposition: f = M u, restrict f down the
  hierarchy, and the squared norm of the projection onto level l is
  (M_l^{-1} f_l) . f_l.

All dense-pyramid ops; jittable with a static hierarchy.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..hierarchy import Hierarchy
from .transform import _level_dims, restrict
from .tridiag import mass_apply, mass_solve

__all__ = ["norm", "l2_norm", "linf_norm", "s_norm",
           "orthogonal_component_square_norms"]


def _mass_all(hier: Hierarchy, v, l: int):
    for d in _level_dims(hier, l):
        v = mass_apply(v, hier.dims[d][l].h, d)
    return v


def _solve_all(hier: Hierarchy, v, l: int):
    for d in _level_dims(hier, l):
        lev = hier.dims[d][l]
        v = mass_solve(v, lev.offdiag, lev.divisors, d)
    return v


def _restrict_all(hier: Hierarchy, v, l: int):
    for d in _level_dims(hier, l):
        v = restrict(v, hier.dims[d][l], d)
    return v


def linf_norm(u: jax.Array) -> jax.Array:
    return jnp.max(jnp.abs(u))


def l2_norm(hier: Hierarchy, u: jax.Array) -> jax.Array:
    f = _mass_all(hier, u, hier.L)
    return jnp.sqrt(jnp.sum(u * f))


def orthogonal_component_square_norms(hier: Hierarchy, u: jax.Array):
    """Squared L2 norms of the orthogonal components, coarsest first
    (reference TensorNorms.tpp:45-97)."""
    f = _mass_all(hier, u, hier.L)
    sq = [None] * (hier.L + 1)
    sq[hier.L] = jnp.sum(u * f)
    for l in range(hier.L - 1, -1, -1):
        f = _restrict_all(hier, f, l + 1)
        proj = _solve_all(hier, f, l)
        sq[l] = jnp.sum(proj * f)
    comps = [sq[0]]
    for l in range(1, hier.L + 1):
        comps.append(jnp.maximum(sq[l] - sq[l - 1], 0.0))
    return comps


def s_norm(hier: Hierarchy, u: jax.Array, s: float) -> jax.Array:
    comps = orthogonal_component_square_norms(hier, u)
    total = jnp.zeros((), dtype=u.dtype)
    for l, c in enumerate(comps):
        total = total + (2.0 ** (2.0 * s * l)) * c
    return jnp.sqrt(total)


def norm(hier: Hierarchy, u: jax.Array, s: float) -> jax.Array:
    """Dispatch on s (reference TensorNorms.tpp:125-135)."""
    if math.isinf(s):
        return linf_norm(u)
    if s == 0:
        return l2_norm(hier, u)
    return s_norm(hier, u, s)
