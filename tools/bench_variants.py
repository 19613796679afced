"""Head-to-head timing of extract/correction variants at 512^3 (round-4).

Current (round-3) forms put the whole correction K = M^-1 R M and the
parent extraction on the MXU as dense (nc, n) matmuls at the FINE size.
The candidates here move the dim-0 half to major-dim-strided VPU work
(strides on the MAJOR dim are contiguous plane reads — no lane/sublane
gather) and keep only the shrunken dims on the MXU.

Run on hardware:  python tools/bench_variants.py 512
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import transform as tr


@jax.jit
def _fold(*leaves):
    acc = jnp.zeros((), jnp.float64)
    for leaf in leaves:
        acc = acc + leaf.reshape(-1)[0].astype(jnp.float64)
    return acc


def sync(out):
    return np.asarray(_fold(*jax.tree_util.tree_leaves(out)))


def timed(name, fn, *args, n1=4, n2=12):
    t0 = time.perf_counter()
    sync(fn(*args))
    print(f"{name:44s} compile {time.perf_counter()-t0:6.1f}s",
          end="", flush=True)

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        sync(out)
        return time.perf_counter() - t0

    t1 = run(n1)
    t2 = run(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"   {dt*1e3:8.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------------------
# host-side tables for the dim-0 strided forms
# ---------------------------------------------------------------------------

def rm_coeffs(lev):
    """5-tap coefficients of A = R M for rows with base 2j (front rows),
    plus the tail row's 4 taps (cols n-4..n-1) when n == 2*front_nc."""
    A = tr._restriction_matrix_np(lev) @ tr._mass_matrix_np(lev.h)
    nc, n = A.shape
    J = nc - 1 if (lev.front_nc is not None and lev.n == 2 * lev.front_nc) \
        else nc
    c = np.zeros((5, J), dtype=np.float64)
    for j in range(J):
        for k in range(-2, 3):
            col = 2 * j + k
            if 0 <= col < n:
                c[k + 2, j] = A[j, col]
    tail = A[nc - 1, n - 4:] if J == nc - 1 else None
    return c, tail


def minv_dense(lev):
    """Dense inverse mass matrix (nc, nc) via the Thomas solve columns."""
    n = lev.n
    return tr._thomas_np(lev, np.eye(n))


def strided_taps(v, J, k):
    """S_k[j] = v[2j+k] for j in [0, J), zero-padded out of range, dim 0."""
    n = v.shape[0]
    lo = max(k, 0)
    j0 = (lo - k + 1) // 2          # first valid j
    start = 2 * j0 + k
    count = min(J - j0, (n - 1 - start) // 2 + 1)
    s = jax.lax.slice_in_dim(v, start, start + 2 * (count - 1) + 1,
                             stride=2, axis=0)
    pads = [(0, 0, 0)] * v.ndim
    pads[0] = (j0, J - j0 - count, 0)
    return jax.lax.pad(s, jnp.zeros((), v.dtype), pads)


def main(edge=512):
    shape = (edge, edge, edge)
    hier = Hierarchy(shape)
    L = hier.L
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(0), shape,
                                 dtype=jnp.float32)
    sync(x)
    print(f"== variants {shape} on {jax.devices()[0]}", flush=True)

    lev0 = hier.dims[0][L]
    dims = tr._level_dims(hier, L)

    # --- extract variants -------------------------------------------------
    def extract_matmul(v):
        return tr._extract_old_all(hier, v, L)

    E = tr._extract_matrices(hier, L)

    def extract_x0(v):
        # dim0: major-dim strided slice + tail row concat; dims 1,2: the
        # 0/1 selection matmuls
        fc = lev0.front_nc
        front = jax.lax.slice_in_dim(v, 0, 2 * fc - 1, stride=2, axis=0)
        tail = jax.lax.slice_in_dim(v, lev0.n - 1, lev0.n, axis=0)
        c0 = jnp.concatenate([front, tail], axis=0)
        return tr._apply_matrix_chain(c0, [None, E[1], E[2]], dims)

    r1 = timed("extract (matmul chain, current)", jax.jit(extract_matmul), x)
    r2 = timed("extract (dim0 strided + matmul12)", jax.jit(extract_x0), x)
    a = jax.jit(extract_matmul)(x)
    b = jax.jit(extract_x0)(x)
    print("   extract max diff:", float(jnp.max(jnp.abs(a - b))))

    # --- correction variants ---------------------------------------------
    def corr_matmul(v):
        return tr._correction(hier, v, L)

    K = tr._correction_matrices(hier, L)
    c5, tail4 = rm_coeffs(lev0)
    J = c5.shape[1]
    levc0 = hier.dims[0][L - 1]
    Minv0 = minv_dense(levc0)

    def corr_x0(v):
        # dim0 RM as 5-tap major-strided stencil (+ tail row), then
        # K1, K2 matmuls and the coarse dense M^-1 on dim 0.
        acc = None
        for k in range(-2, 3):
            ck = jnp.asarray(c5[k + 2], v.dtype).reshape(-1, 1, 1)
            t = ck * strided_taps(v, J, k)
            acc = t if acc is None else acc + t
        if tail4 is not None:
            tl = None
            for i, w in enumerate(tail4):
                if w == 0.0:
                    continue
                row = jax.lax.slice_in_dim(
                    v, lev0.n - 4 + i, lev0.n - 3 + i, axis=0)
                tl = row * np.float32(w) if tl is None else \
                    tl + row * np.float32(w)
            acc = jnp.concatenate([acc, tl], axis=0)
        return tr._apply_matrix_chain(
            acc, [np.ascontiguousarray(Minv0), K[1], K[2]], dims)

    r3 = timed("correction (K matmul chain, current)", jax.jit(corr_matmul), x)
    r4 = timed("correction (dim0 stencil + K12 + Minv0)", jax.jit(corr_x0), x)
    a = jax.jit(corr_matmul)(x)
    b = jax.jit(corr_x0)(x)
    d = float(jnp.max(jnp.abs(a - b)))
    s = float(jnp.max(jnp.abs(a)))
    print(f"   corr max diff: {d:.3e} (scale {s:.3e})")

    from mgard_tpu.ops import lpk_kernels as lk

    def corr_lpk(v):
        Y = lk.rm_dim0(hier, v, L)
        return tr._apply_matrix_chain(
            Y, lk.correction_matrices_fast(hier, L), dims)

    r5 = timed("correction (Pallas LPK rm0 + matmuls)", jax.jit(corr_lpk), x)
    b = jax.jit(corr_lpk)(x)
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"   corr-lpk max diff: {d:.3e} (scale {s:.3e})")

    def corr_lpk_high(v):
        Y = lk.rm_dim0(hier, v, L)
        mats = lk.correction_matrices_fast(hier, L)
        order = list(range(3))
        B = Y
        for dd, M in zip(dims, mats):
            p = order.index(dd)
            Mj = jnp.asarray(M, dtype=B.dtype)
            if p == 0:
                B = jax.lax.dot_general(
                    Mj, B, dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGH,
                    preferred_element_type=B.dtype)
            else:
                B = jax.lax.dot_general(
                    B, Mj, dimension_numbers=(((p,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGH,
                    preferred_element_type=B.dtype)
                order = order[:p] + order[p + 1:] + [dd]
        ident = list(range(3))
        if order != ident:
            B = jnp.transpose(B, [order.index(i) for i in ident])
        return B

    r6 = timed("correction (LPK + HIGH matmuls)", jax.jit(corr_lpk_high), x)
    b = jax.jit(corr_lpk_high)(x)
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"   corr-lpk-high max diff: {d:.3e} (scale {s:.3e})")

    print(f"\nextract: {r1*1e3:.2f} -> {r2*1e3:.2f} ms | "
          f"corr: {r3*1e3:.2f} -> x0 {r4*1e3:.2f} / lpk {r5*1e3:.2f} "
          f"/ lpk-high {r6*1e3:.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
