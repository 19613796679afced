"""Multilevel decomposition on unstructured simplicial meshes.

Counterpart of the reference's experimental unstructured stack
(src/unstructured/MeshHierarchy.cpp:154-228, UniformRestriction.cpp:11-28,
norms.cpp, estimators.cpp in CODARcode/MGARD).  The transform per level
``l`` (fine to coarse), with values ``u`` on the level-``l`` nodes:

    detail   = u_new - 0.5 (u[ea] + u[eb])      # subtract interpolant
    b        = R_{l-1} M_l (0 (+) detail)       # mass apply + restriction
    corr     = M_{l-1}^{-1} b                   # PCG, diagonal precond
    u_old   += corr                             # L2 projection to l-1

All index arrays (edge parents, element connectivity) are static per
hierarchy; the per-level solves are `jax.scipy.sparse.linalg.cg` with a
matrix-free segment-sum matvec — jittable end-to-end.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import MeshLevel, refine_uniform

__all__ = ["UniformMeshHierarchy"]


def _cg_solve(mesh: MeshLevel, b: jax.Array, tol: float = 1e-9,
              maxiter: int = 400) -> jax.Array:
    """Solve M x = b with diagonally-preconditioned CG (reference
    pcg::pcg with MassMatrixPreconditioner, src/unstructured/pcg.cpp)."""
    dinv = jnp.asarray(1.0 / mesh.mass_diagonal(), dtype=b.dtype)
    x, _ = jax.scipy.sparse.linalg.cg(
        mesh.mass_matvec, b, tol=tol, maxiter=maxiter,
        M=lambda r: dinv * r)
    return x


class UniformMeshHierarchy:
    """Hierarchy built by ``L`` uniform refinements of a root mesh.

    Meshes are ordered coarsest (level 0) to finest (level L), and a
    nodal dataset on the finest mesh is ordered new_nodes(0),
    new_nodes(1), ... — the reference's ordering contract
    (include/unstructured/MeshHierarchy.hpp:24-48).
    """

    def __init__(self, root: MeshLevel, L: int):
        if L < 1:
            raise ValueError("L must be >= 1")
        meshes = [root]
        for _ in range(L):
            meshes.append(refine_uniform(meshes[-1]))
        self.meshes: List[MeshLevel] = meshes
        self.L = L

    def ndof(self, l: int = -1) -> int:
        return self.meshes[l].ndof

    def ndof_new(self, l: int) -> int:
        return self.ndof(l) - (self.ndof(l - 1) if l else 0)

    # ------------------------------------------------------------------
    # transform
    # ------------------------------------------------------------------
    def _interpolant_on_new(self, u_old: jax.Array, l: int) -> jax.Array:
        ep = jnp.asarray(self.meshes[l].edge_parents)
        return 0.5 * (u_old[ep[:, 0]] + u_old[ep[:, 1]])

    def _restrict(self, F: jax.Array, l: int) -> jax.Array:
        """Adjoint of midpoint interpolation, level l -> l-1 (reference
        UniformRestriction::do_operator_parentheses)."""
        n = self.ndof(l - 1)
        ep = jnp.asarray(self.meshes[l].edge_parents)
        half_new = 0.5 * F[n:]
        out = F[:n]
        out = out.at[ep[:, 0]].add(half_new)
        out = out.at[ep[:, 1]].add(half_new)
        return out

    def _correction(self, detail: jax.Array, l: int) -> jax.Array:
        """M_{l-1}^{-1} R (M_l (0 (+) detail)) (reference
        do_calculate_correction_from_multilevel_component,
        src/unstructured/MeshHierarchy.cpp:385-417)."""
        n = self.ndof(l - 1)
        full = jnp.concatenate(
            [jnp.zeros(n, dtype=detail.dtype), detail])
        b = self._restrict(self.meshes[l].mass_matvec(full), l)
        return _cg_solve(self.meshes[l - 1], b)

    def _decompose_impl(self, u: jax.Array) -> jax.Array:
        out = u
        for l in range(self.L, 0, -1):
            n = self.ndof(l - 1)
            tail = jax.lax.slice_in_dim(out, self.ndof(l), out.shape[0])
            u_old = jax.lax.slice_in_dim(out, 0, n)
            u_new = jax.lax.slice_in_dim(out, n, self.ndof(l))
            detail = u_new - self._interpolant_on_new(u_old, l)
            u_old = u_old + self._correction(detail, l)
            out = jnp.concatenate([u_old, detail, tail])
        return out

    def _recompose_impl(self, u: jax.Array) -> jax.Array:
        out = u
        for l in range(1, self.L + 1):
            n = self.ndof(l - 1)
            tail = jax.lax.slice_in_dim(out, self.ndof(l), out.shape[0])
            u_old = jax.lax.slice_in_dim(out, 0, n)
            detail = jax.lax.slice_in_dim(out, n, self.ndof(l))
            u_old = u_old - self._correction(detail, l)
            u_new = detail + self._interpolant_on_new(u_old, l)
            out = jnp.concatenate([u_old, u_new, tail])
        return out

    def decompose(self, u) -> jax.Array:
        """Nodal values on the finest mesh -> multilevel coefficients
        (level-ordered: level-0 projection, then per-level details)."""
        u = jnp.asarray(u)
        if u.shape != (self.ndof(),):
            raise ValueError(f"expected ({self.ndof()},), got {u.shape}")
        return jax.jit(self._decompose_impl)(u)

    def recompose(self, u) -> jax.Array:
        """Exact inverse of :meth:`decompose` (up to CG tolerance)."""
        u = jnp.asarray(u)
        if u.shape != (self.ndof(),):
            raise ValueError(f"expected ({self.ndof()},), got {u.shape}")
        return jax.jit(self._recompose_impl)(u)

    # ------------------------------------------------------------------
    # norms & estimators (reference norms.cpp / estimators.cpp)
    # ------------------------------------------------------------------
    def norm(self, u, s: float = math.inf) -> float:
        """L-inf (s = inf), L2 (s = 0) or s-norm of nodal values ``u``
        on the finest mesh (reference src/unstructured/norms.cpp)."""
        u = jnp.asarray(u)
        if math.isinf(s):
            return float(jnp.max(jnp.abs(u)))
        if s == 0:
            fine = self.meshes[-1]
            return float(jnp.sqrt(jnp.vdot(u, fine.mass_matvec(u))))
        # s-norm: sum over levels of 2^{2sl} ||P_l u - P_{l-1} u||_L2^2,
        # with P_l the L2 projection onto level l.
        proj = [None] * (self.L + 1)
        proj[self.L] = u
        for l in range(self.L, 0, -1):
            b = self._restrict(self.meshes[l].mass_matvec(proj[l]), l)
            proj[l - 1] = _cg_solve(self.meshes[l - 1], b)
        total = 0.0
        for l in range(self.L + 1):
            p = proj[l]
            if l == 0:
                sq = float(jnp.vdot(p, self.meshes[0].mass_matvec(p)))
            else:
                n = self.ndof(l - 1)
                up = jnp.concatenate([
                    proj[l - 1],
                    self._interpolant_on_new(proj[l - 1], l)])
                diff = p - up
                sq = float(jnp.vdot(
                    diff, self.meshes[l].mass_matvec(diff)))
            total += 2.0 ** (2 * s * l) * sq
        return math.sqrt(total)

    def estimator(self, coeffs, s: float) -> float:
        """Computable upper-bound functional on the s-norm from
        multilevel coefficients (reference estimators.cpp:28-75):
        sqrt(sum_l 2^{2sl} <mc_l, M_l|_new mc_l>), with the reliability
        constant folded in by the caller/quantizer."""
        if math.isinf(s):
            raise ValueError("pointwise estimator not implemented "
                             "(reference estimators.cpp:70-73)")
        coeffs = jnp.asarray(coeffs)
        total = 0.0
        for l in range(self.L + 1):
            lo = self.ndof(l - 1) if l else 0
            hi = self.ndof(l)
            mesh = self.meshes[l]
            full = jnp.zeros(mesh.ndof, dtype=coeffs.dtype)
            full = full.at[lo:hi].set(coeffs[lo:hi])
            b = mesh.mass_matvec(full)
            sq = float(jnp.vdot(coeffs[lo:hi], b[lo:hi]))
            total += 2.0 ** (2 * s * l) * sq
        return math.sqrt(total)

    def estimator_bounds(self, s: float = 0.0):
        """(realism, reliability) constants relating estimator and norm
        (reference s_square_estimator_bounds, estimators.cpp:17-26)."""
        d = self.meshes[0].dim
        realism = 0.1 if d == 2 else 1.0 / 24
        return realism, 1.0

    def indicator_bounds(self):
        """(realism, reliability) for the square indicator
        (reference s_square_indicator_bounds, indicators.cpp:7-10)."""
        d = self.meshes[0].dim
        return 1.0 / ((d + 1) * (d + 2)), 1.0 / (d + 1)
