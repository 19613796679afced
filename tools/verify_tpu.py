"""Hardware gate for the compiled Pallas/XLA fast paths (round-4,
VERDICT item 6).  One command, exit 0 on hardware iff:

  1. The fused single-pass GPK kernels are BIT-IDENTICAL to the
     two-pass forms on the compiled Mosaic path (the identity the
     encode/decode exactness contract rests on — both sides run the
     same lerp expressions);
  1b. GPK stencils vs the dense-matmul interpolation: same counts and
     exponents, quantized streams differing only in a tiny fraction
     of bin-boundary values (the two formulations are different f32
     operation orders, ~1e-7 relative — NOT bit-identical by design),
     and cross-path decode (encode with one, decode with the other)
     still meets the error bound;
  2. Pallas fused codec vs the XLA codec produce identical exponents
     and words;
  3. encode -> decode round-trips within the error bound across a
     tolerance sweep (exercises the HIGH-precision correction chain's
     headroom);
  4. decode of an encode is deterministic (two runs, equal bytes).

Run:  python tools/verify_tpu.py [edge]          (default 128)

The checks run at a modest size so the whole gate fits in a driver
budget even with cold compiles; every fast path engaged at 512^3 is
shape-generic and engages identically at 128^3 (all dims 2^k).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(edge: int = 128) -> int:
    import jax
    from mgard_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache("/root/.cache/jax_comp")
    import jax.numpy as jnp

    import math
    from mgard_tpu.hierarchy import Hierarchy
    from mgard_tpu.models.compressor import Compressor
    from mgard_tpu.ops import bitplane

    if jax.default_backend() != "tpu":
        print("verify_tpu: backend is", jax.default_backend(),
              "- the compiled-path gate needs TPU hardware")
        return 2

    shape = (edge, edge, edge)
    rng = np.random.default_rng(7)
    x = np.linspace(0, 1, edge, dtype=np.float32)
    v = (np.sin(5 * x)[:, None, None]
         * np.cos(3 * x)[None, :, None] * x[None, None, :]
         + 0.01 * rng.standard_normal(shape)).astype(np.float32)
    failures = []

    def check(name, ok, detail=""):
        print(f"  [{'ok' if ok else 'FAIL'}] {name} {detail}")
        if not ok:
            failures.append(name)

    # --- 1. fused vs two-pass GPK kernel identity ----------------------
    print("== fused vs two-pass GPK kernels (compiled)")
    from mgard_tpu.ops import stencil_kernels as sk
    from mgard_tpu.ops import transform

    hier = Hierarchy(shape)
    comp = Compressor(hier, np.float32, s=math.inf)
    tol = jnp.asarray(1e-3, jnp.float32)
    vj = jnp.asarray(v)
    L = hier.L

    # --- 0b. one-pass extract kernel vs the matmul chain ---------------
    # A pure selection: must be BIT-IDENTICAL, so container bytes do
    # not depend on MGARD_TPU_XK.
    print("== one-pass extract kernel vs matmul chain")
    from mgard_tpu.ops import extract_kernels as xk
    if xk.extract_supported(hier, L):
        ck = jax.jit(lambda A: xk.extract_coarse_3d(hier, A, L))(vj)
        saved_xk = transform._XK
        try:
            transform._XK = False
            cm = jax.jit(
                lambda A: transform._extract_old_all(hier, A, L))(vj)
        finally:
            transform._XK = saved_xk
        check("extract kernel bit-identical",
              bool(jnp.all(ck == cm)))
    else:
        check("extract kernel supported at this edge", False)
    if sk.gpk_supported(hier, L, decode=True):
        det2 = jax.jit(lambda A: sk._run_b1sub(
            sk._run_b20(A, hier, L), A, hier, L))(vj)
        detf = jax.jit(lambda A: sk._run_fused_detail(A, hier, L))(vj)
        check("fused detail bit-identical",
              bool(jnp.all(det2 == detf)))
        C = jax.jit(lambda A: transform._extract_old_all(hier, A, L))(vj)
        c2 = jax.jit(lambda C: sk._embed2(C, hier, L))(C)
        pa2 = jax.jit(lambda c2, d: sk._run_dec_b1add(
            sk._run_dec_b20(c2, hier, L), d, hier, L))(c2, detf)
        paf = jax.jit(lambda c2, d: sk._run_fused_prolong_add(
            c2, d, hier, L))(c2, detf)
        check("fused prolong-add bit-identical",
              bool(jnp.all(pa2 == paf)))
    else:
        check("gpk supported at this edge", False)

    # --- 1b. GPK stencils vs matmul interpolation ----------------------
    # The two formulations are different f32 operation orders (stencil
    # fma vs MXU dot), ~1e-7 relative: streams must agree except for a
    # tiny fraction of bin-boundary flips, and a container encoded with
    # one path must decode within the bound on the other.
    print("== GPK on vs off (cross-path)")
    saved_gpk = transform._GPK
    try:
        transform._GPK = True
        e_on, w_on, c_on, st_on = [np.asarray(o) for o in
                                   comp._encode(vj, tol)]
        transform._GPK = False
        comp_off = Compressor(hier, np.float32, s=math.inf)
        e_off, w_off, c_off, st_off = [np.asarray(o) for o in
                                       comp_off._encode(vj, tol)]
        c = int(c_on)
        check("counts equal", c == int(c_off), f"{c} vs {int(c_off)}")
        check("exponents equal", np.array_equal(e_on, e_off))
        # Thresholds derived from the measured cross-path divergence
        # (ADVICE round-4): the two paths differ by ~rho = 1e-7 relative
        # (f32 fma-vs-dot order), so a coefficient's bin flips when its
        # scaled value lies within rho * |value| / quantum of a bin
        # boundary — expected flip fraction ~ 2 * rho * amax / quantum.
        # We allow 10x that expectation (floor 1e-4 for tiny streams).
        from mgard_tpu.ops.quantize import supremum_quantum
        quantum = float(supremum_quantum(hier, float(tol)))
        rho = 1.2e-7
        exp_frac = min(1.0, 2.0 * rho * float(np.abs(v).max()) / quantum)
        flip_cap = max(10.0 * exp_frac, 1e-4)
        frac = float(np.count_nonzero(w_on[:c] != w_off[:c])) / max(c, 1)
        check(f"word flips < {flip_cap:.2e} (10x expectation)",
              frac < flip_cap, f"frac={frac:.5f}")
        # decode the GPK-on stream with the matmul recompose: a bin-
        # boundary flip moves one coefficient by at most one quantum, so
        # the bound carries one quantum of slack (not zero headroom).
        out_cross = np.asarray(comp_off._decode(
            jnp.asarray(e_on), jnp.asarray(w_on), tol))
        err = float(np.abs(out_cross - v).max())
        check("cross-path decode within bound + quantum",
              err <= 1e-3 + quantum, f"err={err:.3e}")
    finally:
        transform._GPK = saved_gpk

    # --- 2. Pallas codec vs XLA codec ----------------------------------
    print("== Pallas codec vs XLA codec (compiled)")
    q = (rng.normal(size=200000)
         * rng.choice([0, 1, 9, 4000], size=200000)).astype(np.int32)
    qj = jnp.asarray(q)
    os.environ["MGARD_TPU_PALLAS_CODEC"] = "1"
    ep, wp, cp = jax.jit(bitplane.encode)(qj)
    os.environ["MGARD_TPU_PALLAS_CODEC"] = "0"
    ex, wx, cx = jax.jit(bitplane.encode)(qj)
    del os.environ["MGARD_TPU_PALLAS_CODEC"]
    cnt = int(cp)
    check("codec counts equal", cnt == int(cx))
    check("codec exponents equal", np.array_equal(np.asarray(ep),
                                                  np.asarray(ex)))
    check("codec words equal", np.array_equal(np.asarray(wp)[:cnt],
                                              np.asarray(wx)[:cnt]))
    cap = bitplane.max_words(len(q))
    wfull = np.zeros(cap, np.uint32)
    wfull[:cnt] = np.asarray(wp)[:cnt]
    back = jax.jit(lambda e, w: bitplane.decode(e, w, len(q)))(
        ep, jnp.asarray(wfull))
    check("codec roundtrip exact", np.array_equal(np.asarray(back), q))

    # --- 3. error bound across a tolerance sweep -----------------------
    print("== error-bound sweep (HIGH-precision correction headroom)")
    for tol_f in (1e-2, 1e-3, 1e-4, 1e-5):
        t = jnp.asarray(tol_f, jnp.float32)
        e, w, cnum, st = comp._encode(vj, t)
        out = np.asarray(comp._decode(e, w, t))
        err = float(np.abs(out - v).max())
        check(f"tol={tol_f:g}", err <= tol_f, f"err={err:.3e}")

    # --- 4. determinism -------------------------------------------------
    print("== determinism")
    e1, w1, c1, _ = [np.asarray(o) for o in comp._encode(vj, tol)]
    e2, w2, c2, _ = [np.asarray(o) for o in comp._encode(vj, tol)]
    check("encode deterministic",
          int(c1) == int(c2) and np.array_equal(e1, e2)
          and np.array_equal(w1[:int(c1)], w2[:int(c1)]))

    if failures:
        print("FAILED:", ", ".join(failures))
        return 1
    print("verify_tpu: all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 128))
