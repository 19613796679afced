"""XGC-style fusion-data case study.

Counterpart of the reference's examples/xgc-casestudy (4-D nonuniform /
5-D temporal XGC workflows): compresses a synthetic gyrokinetic
distribution-function snapshot f(phi, node, vpara, vperp) — the XGC
"f0" layout, with a nonuniform velocity grid — three ways:

  1. error-bounded one-shot compression at several tolerances,
  2. relative-bound compression (the mode XGC pipelines use),
  3. MDR refactor + progressive retrieval at decreasing tolerances
     (the HPDR IPDPS'25 workflow: store once, read the bytes each
     analysis needs).

Run: python examples/xgc_case_study.py [edge_scale]
"""

import sys
import time

import numpy as np

import mgard_tpu
from mgard_tpu.config import Config, Lossless

scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1

# Synthetic f0-like snapshot: (n_phi planes, mesh nodes, v_para, v_perp).
# Maxwellian-ish in velocity, smooth poloidal structure, multiscale noise.
n_phi, n_node, n_vpa, n_vpe = 8, 1024 * scale, 33, 17
rng = np.random.default_rng(0)
theta = np.linspace(0, 2 * np.pi, n_node, endpoint=False)
# nonuniform velocity grids (denser near v=0, like XGC's)
vpa = np.sign(np.linspace(-1, 1, n_vpa)) * np.linspace(-1, 1, n_vpa) ** 2
vpe = np.linspace(0, 1, n_vpe) ** 1.5

f = (np.exp(-(vpa[None, None, :, None] ** 2) * 3
            - (vpe[None, None, None, :] ** 2) * 2)
     * (1.0 + 0.3 * np.sin(theta)[None, :, None, None]
        + 0.05 * np.cos(3 * theta)[None, :, None, None]
        * np.linspace(0.8, 1.2, n_phi)[:, None, None, None]))
f = (f * (1 + 0.01 * rng.standard_normal(f.shape))).astype(np.float32)
coords = [np.arange(n_phi, dtype=np.float64),
          np.arange(n_node, dtype=np.float64), vpa.astype(np.float64),
          vpe.astype(np.float64)]

print(f"f0 snapshot {f.shape} = {f.nbytes/1e6:.1f} MB "
      f"(nonuniform v-grids)")

print("\n-- error-bounded compression (abs L-inf) --")
for tol in (1e-2, 1e-3, 1e-4):
    t0 = time.perf_counter()
    buf = mgard_tpu.compress(f, tol, coordinates=coords,
                             config=Config(lossless=Lossless.BITPLANE_ZSTD))
    dt = time.perf_counter() - t0
    out = mgard_tpu.decompress(buf)
    err = np.abs(out - f).max()
    print(f"tol={tol:g}: {f.nbytes//1024} KB -> {len(buf)//1024} KB "
          f"({f.nbytes/len(buf):6.1f}x) err={err:.2e} [{dt*1e3:.0f} ms]")

print("\n-- relative bound (XGC production mode) --")
buf = mgard_tpu.compress(f, 1e-3, mode="rel", coordinates=coords)
out = mgard_tpu.decompress(buf)
print(f"rel 1e-3: ratio {f.nbytes/len(buf):.1f}x, "
      f"rel err {np.abs(out-f).max()/np.abs(f).max():.2e}")

print("\n-- MDR: refactor once, retrieve progressively --")
from mgard_tpu.models import mdr
from mgard_tpu.hierarchy import Hierarchy

hier = Hierarchy(f.shape)
ref = mdr.mdr_refactor(hier, f)
stored = sum(len(b) for streams in ref.streams for b in streams)
print(f"refactored store: {stored//1024} KB")
for tol in (1e-1, 1e-2, 1e-3):
    out = mdr.mdr_reconstruct(hier, ref, tol)
    got = np.abs(out - f).max()
    counts = mdr.mdr_request(ref.metadata, tol)
    read = sum(len(ref.streams[lev][0])
               + sum(len(ref.streams[lev][1 + b]) for b in range(c))
               for lev, c in enumerate(counts))
    print(f"tol={tol:g}: read {read//1024} KB of {stored//1024} KB "
          f"({100*read/stored:.0f}%), err={got:.2e}")
