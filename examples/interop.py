"""Interop with the reference MGARD implementations.

Every artifact class the reference ecosystem produces or consumes is
covered (STATUS.md #7/#27/#33/#34):

* CPU-format ``MGARD`` buffers  — read + write (bit-compatible Huffman);
* ``mgard-x`` compressed buffers — read (L-inf/s-norm, ABS/REL,
  reorder 0/1, MaxDim/Block dd) + write (L-inf/s-norm, ABS/REL);
* ``mdr-x`` refactored directories — read + progressive reconstruct;
* the reference port's ZFP fixed-rate streams — read + write,
  bit-compatible.

Run on CPU: JAX_PLATFORMS=cpu python examples/interop.py
"""

import math

import numpy as np

import mgard_tpu
from mgard_tpu.io import mgard_compat

x = np.linspace(0, 1, 33)
v = (np.sin(3 * x)[:, None, None] * np.cos(2 * x)[None, :, None]
     * (1 + x)[None, None, :]).astype(np.float64)

# --- reference CPU format -------------------------------------------------
buf = mgard_compat.compress_mgard(v, 1e-4)          # bytes `mgard` decodes
out = mgard_tpu.decompress(buf)                     # magic-dispatched
print(f"CPU format: {v.nbytes} -> {len(buf)} bytes, "
      f"err {np.abs(out - v).max():.2e}")

# --- mgard-x format -------------------------------------------------------
v32 = v.astype(np.float32)
for kwargs in (dict(), dict(s=0.0), dict(mode="rel")):
    xbuf = mgard_compat.compress_mgard_x(v32, 1e-3, **kwargs)
    xout = mgard_tpu.decompress(xbuf)               # same entry point
    print(f"mgard-x {kwargs or '{L-inf abs}'}: {len(xbuf)} bytes, "
          f"err {np.abs(xout.astype(np.float64) - v32).max():.2e}")

# --- ZFP fixed-rate streams ----------------------------------------------
from mgard_tpu.models.zfp_stream import zfp_decode, zfp_encode

rate = 12
# strides="reference" reproduces the port's bytes bit-for-bit (including
# its ld-as-stride addressing, which only covers a sliver of a 3-D
# array — see models/zfp_stream.py); "correct" is the true row-major
# zfp layout, which is what you want for actual data.
zbuf = zfp_encode(v32, rate, strides="correct")
zout = zfp_decode(zbuf, v32.shape, np.float32, rate, strides="correct")
print(f"zfp rate {rate}: {len(zbuf)} bytes, "
      f"err {np.abs(zout - v32).max():.2e}")

# --- mdr-x refactored artifacts ------------------------------------------
# (requires a directory written by the reference tool:
#    mdr-x -z -i data.bin -o artifact -dt s -dim 3 33 33 33 -d serial)
# from mgard_tpu.io.mdrx_compat import mdrx_reconstruct
# out = mdrx_reconstruct("artifact", tol=1e-3)
print("mdr-x artifacts: see io/mdrx_compat.py / tests/test_mdrx_artifacts.py")
