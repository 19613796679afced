"""Pallas stencil kernels for the interpolation operators (3-D).

The GPK role of the reference (fused coefficient kernels,
include/mgard-x/DataRefactoring/MultiDimension/Coefficient/GPKFunctor.h)
done the TPU way: multilinear interpolation of the parental sub-grid is
a composition of per-dim 3-point lerps ``B_d`` (see ops/stencil.py for
the identity and its proof), and on a level whose dims are stride-2 or
front-interleaved every ``B_d`` is a +-1 shift — a VPU roll, not a
matmul and not an XLA interior pad.

Composition order is (dim2, dim0, dim1) on BOTH sides so encode and
decode run bit-identical lerps:

  encode:  detail = A - (B1 o B0 o B2)(A)
    pass A   B2 per row (in-register lane rolls) + B0 across rows
             (one-row halo input specs, clamped at the edges — the
             clamped rows are never selected: boundary nodes are
             always parental)
    pass B   B1 (one-column halo on pass A's output) fused with the
             subtract against A

  decode:  A = (B1 o B0 o B2)(embed(C)) + detail
    host     embed C along dim2 only: one bit-exact 0/1 selection
             matmul (nc2 -> n2) on the COARSE array — Mosaic has no
             lane-interleave, so the minor-dim expansion rides the MXU
             where it is cheap (~0.5 ms at 512^3), while dims 0/1
             expand in-kernel
    pass A   B2 per coarse row + dim-0 expand/lerp (rows of the fine
             grid selected or lerped from coarse rows)
    pass B   dim-1 expand/lerp via ``jnp.repeat`` sublane duplication
             and the shifted-slice pair (e1[2k]=v[k] is the left
             parent, s1[2k]=v[k+? ]... s1 = r1[1:] gives the right
             parent at new rows and the trailing-coarse-node source at
             the tail), fused with the add of detail

The ``B_d`` composition only ever *reads* positions that are parental
in every dim it has not yet processed, so duplicate/garbage values at
not-yet-processed positions are overwritten before they can propagate
(same induction as ops/stencil.py).

Supported structure (``gpk_supported``): 3-D float32 on TPU, every dim
refined with parents at +-1 and block-tileable sizes; decode
additionally needs dims 0/1 even with a single trailing coarse node
(``n == 2*front_nc`` — every 2^k size), which keeps the in-kernel
expansion one repeat + shifted slice.  Callers fall back to the
dense-matmul forms in ops/transform.py otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hierarchy import Hierarchy

_B0 = 8            # fine rows (dim0) per grid step
_B1 = 128          # fine columns (dim1) per grid step


def _dim_ok_encode(lev) -> bool:
    if lev.coarse_pos is None or lev.new_pos is None or not len(lev.new_pos):
        return False
    return lev.coarse_is_stride2 or lev.front_nc is not None


def _dim_ok_decode(lev) -> bool:
    # even n, front-interleaved, single trailing coarse node: 2^k sizes
    return lev.front_nc is not None and lev.n == 2 * lev.front_nc


def gpk_supported(hier: Hierarchy, l: int, decode: bool) -> bool:
    if hier.ndim != 3 or any(s == 1 for s in hier.shape):
        return False
    if jax.default_backend() != "tpu":
        return False
    n0, n1, n2 = (hier.dims[d][l].n for d in range(3))
    if n0 % _B0 or n1 % _B1 or n2 % 128:
        return False
    for d in range(3):
        lev = hier.dims[d][l]
        if not _dim_ok_encode(lev):
            return False
        if decode and d < 2 and not _dim_ok_decode(lev):
            return False
    return True


def _mw_arrays(hier: Hierarchy, l: int):
    """Per-dim (mask, weight) float32 host vectors (new nodes only)."""
    cache = getattr(hier, "_gpk_mw", None)
    if cache is None:
        cache = {}
        hier._gpk_mw = cache
    if l not in cache:
        out = []
        for d in range(3):
            lev = hier.dims[d][l]
            m = np.zeros(lev.n, dtype=np.float32)
            w = np.zeros(lev.n, dtype=np.float32)
            m[lev.new_pos] = 1.0
            w[lev.new_pos] = lev.new_ratio.astype(np.float32)
            out.append((m, w))
        cache[l] = out
    return cache[l]


def _meta0(hier: Hierarchy, l: int, decode: bool) -> np.ndarray:
    """(n0, 128) float32 SMEM row table: [g,0]=mask, [g,1]=weight,
    [g,2]=1 for a parental row whose coarse source is (g+1)//2 rather
    than g//2 (the trailing coarse node of an even front-interleaved
    dim; decode only)."""
    m, w = _mw_arrays(hier, l)[0]
    n0 = len(m)
    meta = np.zeros((n0, 128), dtype=np.float32)
    meta[:, 0] = m
    meta[:, 1] = w
    if decode:
        for g in range(n0):
            if m[g] == 0.0 and g % 2 == 1:
                meta[g, 2] = 1.0
    return meta


def _mw_plane(hier: Hierarchy, l: int):
    """dim1 masks/weights as (n1, 128) columns; dim2 as (8, n2) rows."""
    (m1, w1), (m2, w2) = _mw_arrays(hier, l)[1], _mw_arrays(hier, l)[2]
    m1c = np.repeat(m1[:, None], 128, axis=1)
    w1c = np.repeat(w1[:, None], 128, axis=1)
    m2r = np.repeat(m2[None, :], 8, axis=0)
    w2r = np.repeat(w2[None, :], 8, axis=0)
    return m1c, w1c, m2r, w2r


def _b2(row, m2, w2):
    """Lane lerp B2 on a (rows, n2) slab: new lanes get the +-1 lerp,
    parental lanes pass through bit-exactly."""
    n2 = row.shape[-1]
    # int32 shift operands: under jax_enable_x64 a bare Python int
    # traces as i64 and Mosaic's tpu.dynamic_rotate rejects it
    l2 = pltpu.roll(row, np.int32(1), axis=1)
    r2 = pltpu.roll(row, np.int32(n2 - 1), axis=1)  # roll by -1
    return jnp.where(m2 != 0.0, (1.0 - w2) * l2 + w2 * r2, row)


# ---------------------------------------------------------------------------
# encode pass A: B2 per row + B0 across rows (one-row halo)
# ---------------------------------------------------------------------------

def _b20_kernel(meta_ref, m2_ref, w2_ref, prev_ref, cen_ref, nxt_ref,
                out_ref):
    m2 = m2_ref[0:1, :]
    w2 = w2_ref[0:1, :]
    rows = [_b2(cen_ref[r], m2, w2) for r in range(_B0)]
    prevr = _b2(prev_ref[0], m2, w2)
    nxtr = _b2(nxt_ref[0], m2, w2)
    outs = []
    for r in range(_B0):
        left = rows[r - 1] if r > 0 else prevr
        right = rows[r + 1] if r < _B0 - 1 else nxtr
        m = meta_ref[r, 0]
        w = meta_ref[r, 1]
        lerp = (1.0 - w) * left + w * right
        outs.append(jnp.where(m != 0.0, lerp, rows[r]))
    out_ref[:] = jnp.stack(outs, axis=0)


def _run_b20(A: jax.Array, hier, l: int, interpret=False) -> jax.Array:
    n0, n1, n2 = A.shape
    meta = _meta0(hier, l, decode=False)
    _, _, m2r, w2r = _mw_plane(hier, l)
    grid = (n0 // _B0, n1 // _B1)
    return pl.pallas_call(
        _b20_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B0, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _B1, n2),
                         lambda i, j: (jnp.maximum(i * _B0 - 1, 0), j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _B1, n2),
                         lambda i, j, _n=n0: (jnp.minimum(i * _B0 + _B0,
                                                          _n - 1), j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1, n2), A.dtype),
        interpret=interpret,
    )(jnp.asarray(meta), jnp.asarray(m2r, A.dtype),
      jnp.asarray(w2r, A.dtype), A, A, A)


# ---------------------------------------------------------------------------
# encode pass B: B1 (one-column halo) fused with the subtract
# ---------------------------------------------------------------------------

def _b1sub_kernel(m1_ref, w1_ref, prev_ref, cen_ref, nxt_ref, a_ref,
                  out_ref):
    # prev/next are 8-sublane halo strips (Mosaic rejects 1-sublane
    # blocks); only their boundary row is used.
    m1 = m1_ref[:, :1]
    w1 = w1_ref[:, :1]
    outs = []
    for r in range(_B0):
        v = cen_ref[r]                               # (B1, n2)
        up = jnp.concatenate([prev_ref[r, 7:8], v[:-1]], axis=0)
        dn = jnp.concatenate([v[1:], nxt_ref[r, 0:1]], axis=0)
        b1 = jnp.where(m1 != 0.0, (1.0 - w1) * up + w1 * dn, v)
        outs.append(a_ref[r] - b1)
    out_ref[:] = jnp.stack(outs, axis=0)


def _run_b1sub(V0: jax.Array, A: jax.Array, hier, l: int,
               interpret=False) -> jax.Array:
    n0, n1, n2 = V0.shape
    m1c, w1c, _, _ = _mw_plane(hier, l)
    grid = (n0 // _B0, n1 // _B1)
    return pl.pallas_call(
        _b1sub_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B1, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B1, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            # 8-sublane halo strips; kernel uses row 7 / row 0 only
            pl.BlockSpec((_B0, 8, n2),
                         lambda i, j: (i, jnp.maximum(
                             j * (_B1 // 8) - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, 8, n2),
                         lambda i, j, _n=n1: (i, jnp.minimum(
                             j * (_B1 // 8) + _B1 // 8, _n // 8 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1, n2), V0.dtype),
        interpret=interpret,
    )(jnp.asarray(m1c, V0.dtype), jnp.asarray(w1c, V0.dtype),
      V0, V0, V0, A)


# ---------------------------------------------------------------------------
# encode fused: B2 + B0 + B1 + subtract in ONE pass over the fine array
# ---------------------------------------------------------------------------
#
# The two-pass form writes and re-reads the 537 MB intermediate V0 at
# 512^3 (measured 1.43 + 1.81 ms per finest level on v5e); the fused
# kernel recomputes the one-column V0 halo each block needs from narrow
# strips of A instead, cutting HBM traffic to read-A + write-detail.
# Every lerp is the IDENTICAL expression to the two-pass kernels, so
# the fused path is bit-exact against them (asserted in tests).

def _b20_row(cen_rows, prevr, nxtr, meta_ref, m2, w2):
    """V0 rows for one 8-row block from already-B2'd rows (shared by the
    center slab and the halo columns)."""
    outs = []
    for r in range(_B0):
        left = cen_rows[r - 1] if r > 0 else prevr
        right = cen_rows[r + 1] if r < _B0 - 1 else nxtr
        m = meta_ref[r, 0]
        w = meta_ref[r, 1]
        lerp = (1.0 - w) * left + w * right
        outs.append(jnp.where(m != 0.0, lerp, cen_rows[r]))
    return outs


def _fused_detail_kernel(meta_ref, m2_ref, w2_ref, m1_ref, w1_ref,
                         prev_ref, cen_ref, nxt_ref,
                         lcen_ref, lprev_ref, lnxt_ref,
                         rcen_ref, rprev_ref, rnxt_ref, out_ref):
    m2 = m2_ref[0:1, :]
    w2 = w2_ref[0:1, :]
    m1 = m1_ref[:, :1]
    w1 = w1_ref[:, :1]
    # center slab: B2 per row, then B0 across rows (as _b20_kernel)
    rows = [_b2(cen_ref[r], m2, w2) for r in range(_B0)]
    prevr = _b2(prev_ref[0], m2, w2)
    nxtr = _b2(nxt_ref[0], m2, w2)
    v0c = _b20_row(rows, prevr, nxtr, meta_ref, m2, w2)
    # halo columns: V0 at dim-1 columns j*B1 - 1 and j*B1 + B1, computed
    # from the 8-sublane strips (the needed column is strip sublane 7 on
    # the left, 0 on the right)
    lrows = [_b2(lcen_ref[r, 7:8], m2, w2) for r in range(_B0)]
    lprevr = _b2(lprev_ref[0, 7:8], m2, w2)
    lnxtr = _b2(lnxt_ref[0, 7:8], m2, w2)
    v0l = _b20_row(lrows, lprevr, lnxtr, meta_ref, m2, w2)
    rrows = [_b2(rcen_ref[r, 0:1], m2, w2) for r in range(_B0)]
    rprevr = _b2(rprev_ref[0, 0:1], m2, w2)
    rnxtr = _b2(rnxt_ref[0, 0:1], m2, w2)
    v0r = _b20_row(rrows, rprevr, rnxtr, meta_ref, m2, w2)
    # B1 along dim 1 (as _b1sub_kernel) + subtract, all in registers
    outs = []
    for r in range(_B0):
        v = v0c[r]                                   # (B1, n2)
        up = jnp.concatenate([v0l[r], v[:-1]], axis=0)
        dn = jnp.concatenate([v[1:], v0r[r]], axis=0)
        b1 = jnp.where(m1 != 0.0, (1.0 - w1) * up + w1 * dn, v)
        outs.append(cen_ref[r] - b1)
    out_ref[:] = jnp.stack(outs, axis=0)


def _run_fused_detail(A: jax.Array, hier, l: int,
                      interpret=False) -> jax.Array:
    n0, n1, n2 = A.shape
    meta = _meta0(hier, l, decode=False)
    m1c, w1c, m2r, w2r = _mw_plane(hier, l)
    grid = (n0 // _B0, n1 // _B1)
    s8 = n1 // 8 - 1          # clamp for 8-sublane strips

    def prev_i(i, j):
        return (jnp.maximum(i * _B0 - 1, 0), j, 0)

    def nxt_i(i, j, _n=n0):
        return (jnp.minimum(i * _B0 + _B0, _n - 1), j, 0)

    def lcen_i(i, j):
        return (i, jnp.maximum(j * (_B1 // 8) - 1, 0), 0)

    def lprev_i(i, j):
        return (jnp.maximum(i * _B0 - 1, 0),
                jnp.maximum(j * (_B1 // 8) - 1, 0), 0)

    def lnxt_i(i, j, _n=n0):
        return (jnp.minimum(i * _B0 + _B0, _n - 1),
                jnp.maximum(j * (_B1 // 8) - 1, 0), 0)

    def rcen_i(i, j, _s=s8):
        return (i, jnp.minimum(j * (_B1 // 8) + _B1 // 8, _s), 0)

    def rprev_i(i, j, _s=s8):
        return (jnp.maximum(i * _B0 - 1, 0),
                jnp.minimum(j * (_B1 // 8) + _B1 // 8, _s), 0)

    def rnxt_i(i, j, _n=n0, _s=s8):
        return (jnp.minimum(i * _B0 + _B0, _n - 1),
                jnp.minimum(j * (_B1 // 8) + _B1 // 8, _s), 0)

    return pl.pallas_call(
        _fused_detail_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B0, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B1, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B1, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _B1, n2), prev_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _B1, n2), nxt_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, 8, n2), lcen_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n2), lprev_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n2), lnxt_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, 8, n2), rcen_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n2), rprev_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n2), rnxt_i, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1, n2), A.dtype),
        interpret=interpret,
    )(jnp.asarray(meta), jnp.asarray(m2r, A.dtype),
      jnp.asarray(w2r, A.dtype), jnp.asarray(m1c, A.dtype),
      jnp.asarray(w1c, A.dtype), A, A, A, A, A, A, A, A, A)


_FUSED = __import__("os").environ.get("MGARD_TPU_GPK_FUSED", "1") == "1"


def gpk_detail(hier: Hierarchy, A: jax.Array, l: int,
               interpret: bool = False) -> jax.Array:
    """detail = A - multilinear-interp(parents of A).  Exact zeros at
    all-parent nodes; bit-identical lerps to the decode kernels.

    Default: the fused single-pass kernel (read A, write detail).  The
    two-pass form (V0 intermediate in HBM) remains under
    MGARD_TPU_GPK_FUSED=0 and is the arithmetic reference the fused
    kernel is tested bit-exact against."""
    if _FUSED:
        return _run_fused_detail(A, hier, l, interpret=interpret)
    v0 = _run_b20(A, hier, l, interpret=interpret)
    return _run_b1sub(v0, A, hier, l, interpret=interpret)


# ---------------------------------------------------------------------------
# decode: embed along dim2 (MXU), then B2+B0, then B1-expand + add
# ---------------------------------------------------------------------------

def _embed2(C: jax.Array, hier, l: int) -> jax.Array:
    """Place C at the dim-2 parental lanes of the fine grid (zeros at
    new lanes): one 0/1 selection matmul — bit-exact at HIGHEST."""
    lev2 = hier.dims[2][l]
    cache = getattr(hier, "_gpk_emb2", None)
    if cache is None:
        cache = {}
        hier._gpk_emb2 = cache
    if l not in cache:
        nc2 = len(lev2.coarse_pos)
        E = np.zeros((lev2.n, nc2), dtype=np.float64)
        E[np.asarray(lev2.coarse_pos), np.arange(nc2)] = 1.0
        cache[l] = E
    E = jnp.asarray(cache[l], dtype=C.dtype)
    return jax.lax.dot_general(
        C, E, dimension_numbers=(((2,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=C.dtype)


def _dec_b20_kernel(meta_ref, m2_ref, w2_ref, cmain_ref, cx_ref, out_ref):
    m2 = m2_ref[0:1, :]
    w2 = w2_ref[0:1, :]
    hb = _B0 // 2
    t = [_b2(cmain_ref[r], m2, w2) for r in range(hb)]
    t.append(_b2(cx_ref[0], m2, w2))
    outs = []
    for r in range(_B0):
        m = meta_ref[r, 0]
        w = meta_ref[r, 1]
        tail = meta_ref[r, 2]
        lo = t[r // 2]
        hi = t[r // 2 + 1]
        lerp = (1.0 - w) * lo + w * hi
        parent = jnp.where(tail != 0.0, hi, lo)
        outs.append(jnp.where(m != 0.0, lerp, parent))
    v = jnp.stack(outs, axis=0)
    pad = out_ref.shape[1] - v.shape[1]
    if pad:
        # pad sublanes to a multiple of 8 so the next pass's halo strip
        # spec stays in bounds (values unused)
        v = jnp.concatenate(
            [v, jnp.zeros((v.shape[0], pad, v.shape[2]), v.dtype)], axis=1)
    out_ref[:] = v


def _run_dec_b20(C2: jax.Array, hier, l: int, interpret=False) -> jax.Array:
    """C embedded along dim2 (nc0, nc1, n2) -> v0 (n0, nc1 padded to a
    multiple of 8, n2): B2 on each coarse row, then dim-0
    expansion/lerp."""
    nc0, nc1, n2 = C2.shape
    n0 = hier.dims[0][l].n
    nc1p = -(-nc1 // 8) * 8
    meta = _meta0(hier, l, decode=True)
    _, _, m2r, w2r = _mw_plane(hier, l)
    hb = _B0 // 2
    grid = (n0 // _B0,)
    return pl.pallas_call(
        _dec_b20_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B0, 128), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, nc1, n2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc1, n2),
                         lambda i, _n=nc0: (jnp.minimum(i * hb + hb,
                                                        _n - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B0, nc1p, n2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, nc1p, n2), C2.dtype),
        interpret=interpret,
    )(jnp.asarray(meta), jnp.asarray(m2r, C2.dtype),
      jnp.asarray(w2r, C2.dtype), C2, C2)


def _dec_b1add_kernel(m1_ref, w1_ref, main_ref, extra_ref, det_ref,
                      out_ref, *, fc1: int):
    m1 = m1_ref[:, :1]
    w1 = w1_ref[:, :1]
    thr = (2 * fc1 - 1) - pl.program_id(1) * _B1
    sub = jax.lax.broadcasted_iota(
        jnp.int32, (_B1, main_ref.shape[-1]), 0)
    outs = []
    for r in range(_B0):
        vs = jnp.concatenate([main_ref[r], extra_ref[r, 0:1]], axis=0)
        r1 = jnp.repeat(vs, 2, axis=0)               # (B1 + 2, n2)
        e1 = r1[:_B1]                                # left parent / self
        s1 = r1[1:_B1 + 1]                           # right parent / tail
        base = jnp.where(sub >= thr, s1, e1)
        b1 = jnp.where(m1 != 0.0, (1.0 - w1) * e1 + w1 * s1, base)
        outs.append(b1 + det_ref[r])
    out_ref[:] = jnp.stack(outs, axis=0)


def _run_dec_b1add(V0: jax.Array, detail: jax.Array, hier, l: int,
                   interpret=False) -> jax.Array:
    n0, nc1p, n2 = V0.shape
    n1 = hier.dims[1][l].n
    fc1 = hier.dims[1][l].front_nc
    m1c, w1c, _, _ = _mw_plane(hier, l)
    b1h = _B1 // 2
    grid = (n0 // _B0, n1 // _B1)
    kern = functools.partial(_dec_b1add_kernel, fc1=fc1)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B1, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B1, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, b1h, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # 8-sublane halo strip (V0 is padded so it stays in bounds);
            # kernel uses its row 0 only
            pl.BlockSpec((_B0, 8, n2),
                         lambda i, j, _n=nc1p: (i, jnp.minimum(
                             (j * b1h + b1h) // 8, _n // 8 - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B0, _B1, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1, n2), V0.dtype),
        interpret=interpret,
    )(jnp.asarray(m1c, V0.dtype), jnp.asarray(w1c, V0.dtype),
      V0, V0, detail)


# ---------------------------------------------------------------------------
# decode fused: B2 + dim-0 expand + dim-1 expand + add in ONE pass
# ---------------------------------------------------------------------------
#
# Mirrors the encode fusion: the two-pass decode writes and re-reads the
# (n0, nc1, n2) intermediate V0; the fused kernel reads the dim-1 slice
# of the dim2-embedded coarse array each block needs (main columns plus
# the one-coarse-column halo as an 8-sublane strip) and runs the whole
# composition in registers.  Identical lerp expressions to the two-pass
# kernels; bit-exact (asserted in tests).

# The fused decode kernel uses a narrower dim-1 block than the encode
# side: at 512^3 the (8, 128, n2) detail + output windows alone are
# 2 MB each and, double-buffered with the coarse inputs and in-kernel
# temps, blow Mosaic's 16 MB scoped-VMEM budget by ~2 MB.
_B1D = 64


def _fused_prolong_kernel(meta_ref, m2_ref, w2_ref, m1_ref, w1_ref,
                          cmain_ref, cx_ref, ccol_ref, cxcol_ref,
                          det_ref, out_ref, *, fc1: int):
    m2 = m2_ref[0:1, :]
    w2 = w2_ref[0:1, :]
    m1 = m1_ref[:, :1]
    w1 = w1_ref[:, :1]
    hb = _B0 // 2
    tm = [_b2(cmain_ref[r], m2, w2) for r in range(hb)]
    tm.append(_b2(cx_ref[0], m2, w2))
    tc = [_b2(ccol_ref[r, 0:1], m2, w2) for r in range(hb)]
    tc.append(_b2(cxcol_ref[0, 0:1], m2, w2))
    thr = (2 * fc1 - 1) - pl.program_id(1) * _B1D
    sub = jax.lax.broadcasted_iota(
        jnp.int32, (_B1D, cmain_ref.shape[-1]), 0)
    for r in range(_B0):
        m = meta_ref[r, 0]
        w = meta_ref[r, 1]
        tail = meta_ref[r, 2]

        def expand0(t):
            lo = t[r // 2]
            hi = t[r // 2 + 1]
            lerp = (1.0 - w) * lo + w * hi
            parent = jnp.where(tail != 0.0, hi, lo)
            return jnp.where(m != 0.0, lerp, parent)

        vs = jnp.concatenate([expand0(tm), expand0(tc)], axis=0)
        r1 = jnp.repeat(vs, 2, axis=0)               # (B1D + 2, n2)
        e1 = r1[:_B1D]
        s1 = r1[1:_B1D + 1]
        base = jnp.where(sub >= thr, s1, e1)
        b1 = jnp.where(m1 != 0.0, (1.0 - w1) * e1 + w1 * s1, base)
        out_ref[r] = b1 + det_ref[r]


def _run_fused_prolong_add(C2: jax.Array, detail: jax.Array, hier, l: int,
                           interpret=False) -> jax.Array:
    nc0, nc1, n2 = C2.shape
    n0, n1 = hier.dims[0][l].n, hier.dims[1][l].n
    fc1 = hier.dims[1][l].front_nc
    meta = _meta0(hier, l, decode=True)
    m1c, w1c, m2r, w2r = _mw_plane(hier, l)
    hb = _B0 // 2
    b1h = _B1D // 2
    grid = (n0 // _B0, n1 // _B1D)
    cstop = (nc1 - 1) // 8     # last 8-sublane block of the coarse dim1

    def cx_i(i, j, _n=nc0):
        return (jnp.minimum(i * hb + hb, _n - 1), j, 0)

    def ccol_i(i, j, _s=cstop):
        return (i, jnp.minimum(j * (b1h // 8) + b1h // 8, _s), 0)

    def cxcol_i(i, j, _n=nc0, _s=cstop):
        return (jnp.minimum(i * hb + hb, _n - 1),
                jnp.minimum(j * (b1h // 8) + b1h // 8, _s), 0)

    kern = functools.partial(_fused_prolong_kernel, fc1=fc1)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_B0, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B1D, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_B1D, 128), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, b1h, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b1h, n2), cx_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, 8, n2), ccol_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n2), cxcol_i, memory_space=pltpu.VMEM),
            pl.BlockSpec((_B0, _B1D, n2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_B0, _B1D, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n0, n1, n2), C2.dtype),
        interpret=interpret,
    )(jnp.asarray(meta), jnp.asarray(m2r, C2.dtype),
      jnp.asarray(w2r, C2.dtype), jnp.asarray(m1c, C2.dtype),
      jnp.asarray(w1c, C2.dtype), C2, C2, C2, C2, detail)


def gpk_prolong_add(hier: Hierarchy, C: jax.Array, detail: jax.Array,
                    l: int, interpret: bool = False) -> jax.Array:
    """A = multilinear-interp(embed(C)) + detail (the recompose step's
    interpolation half; the correction matmul stays in transform.py).

    Default: dim-2 embed on the MXU, then the fused single-pass kernel.
    MGARD_TPU_GPK_FUSED=0 keeps the two-pass form (V0 in HBM), the
    arithmetic reference the fused kernel is tested bit-exact against."""
    c2 = _embed2(C, hier, l)
    if _FUSED:
        return _run_fused_prolong_add(c2, detail, hier, l,
                                      interpret=interpret)
    v0 = _run_dec_b20(c2, hier, l, interpret=interpret)
    return _run_dec_b1add(v0, detail, hier, l, interpret=interpret)
