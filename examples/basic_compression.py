"""Basic error-bounded compression (counterpart of the reference
examples/compression + examples/decompression samples)."""

import math

import numpy as np

import mgard_tpu

x = np.linspace(0, 1, 129)
v = (np.sin(4 * np.pi * x)[:, None, None]
     * np.cos(2 * np.pi * x)[None, :, None]
     * np.exp(-x)[None, None, :]).astype(np.float32)

# Absolute L-infinity bound
buf = mgard_tpu.compress(v, tolerance=1e-3)
out = mgard_tpu.decompress(buf)
print(f"L-inf  : {v.nbytes} -> {len(buf)} bytes "
      f"({v.nbytes/len(buf):.1f}x), max err {np.abs(out-v).max():.2e}")

# Relative s-norm bound (s=0 is the L2 function norm)
buf = mgard_tpu.compress(v, tolerance=1e-4, s=0.0, mode="rel")
out = mgard_tpu.decompress(buf)
print(f"L2 rel : {v.nbytes} -> {len(buf)} bytes "
      f"({v.nbytes/len(buf):.1f}x)")

# Nonuniform grid
coords = [np.sort(np.random.default_rng(0).uniform(0, 1, s))
          for s in v.shape]
buf = mgard_tpu.compress(v, 1e-3, coordinates=coords)
out = mgard_tpu.decompress(buf)
print(f"nonuni : max err {np.abs(out-v).max():.2e} <= 1e-3")
