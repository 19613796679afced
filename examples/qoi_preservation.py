"""Quantity-of-interest preservation (counterpart of examples/qoi)."""

import jax

# np.outer below yields float64; f64 compression rides the int64
# quantization + 64-bitplane codec, which needs x64 enabled.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mgard_tpu
from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.models.qoi import QuantityOfInterest, compress_qoi

shape = (65, 65)
x = np.linspace(0, 1, 65)
v = np.outer(np.sin(3 * x), np.cos(2 * x))

h = Hierarchy(shape)
qoi = QuantityOfInterest(h, lambda u: jnp.mean(u))  # any linear functional
print(f"||Q||_0 operator norm: {qoi.norm(0.0):.4f}")

tol = 1e-6
buf = compress_qoi(v, qoi, tol, s=0.0)
out = mgard_tpu.decompress(buf)
print(f"QoI drift: {abs(v.mean() - out.mean()):.2e} <= {tol:.0e} "
      f"(ratio {v.nbytes/len(buf):.1f}x)")
