"""Error-bounded compression on unstructured meshes.

Counterpart of the reference's unstructured MultilevelCoefficientQuantizer
(include/unstructured/MultilevelCoefficientQuantizer.tpp:9-45) wired into
the TPU bitplane lossless codec.  Per-node quantum on level ``l``:

    q(node) = 2 tol / sqrt(R_est * R_ind * 2^{2sl} * mu(node) * ndof)

where ``mu`` is the total measure of elements containing the node and
``R_est``/``R_ind`` are the reliability constants of the estimator and
indicator bounds (reference s_quantum).  Rounding matches the structured
quantizer: trunc(copysign(0.5 + |x/q|, x)).
"""

from __future__ import annotations

import math
import struct
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bitplane
from .hierarchy import UniformMeshHierarchy

_MAGIC = b"MGTU"


def _quanta(hier: UniformMeshHierarchy, s: float,
            tol: float) -> np.ndarray:
    """Per-coefficient quantum vector over the level-ordered dof."""
    _, rel_est = hier.estimator_bounds(s)
    _, rel_ind = hier.indicator_bounds()
    N = hier.ndof()
    q = np.zeros(N)
    for l in range(hier.L + 1):
        lo = hier.ndof(l - 1) if l else 0
        hi = hier.ndof(l)
        mu = hier.meshes[l].containing_elements_measure()[lo:hi]
        factor = (rel_est * rel_ind * np.exp2(2 * s * l) * mu * N)
        q[lo:hi] = 2.0 * tol / np.sqrt(factor)
    return q


def compress(hier: UniformMeshHierarchy, u, s: float,
             tolerance: float) -> bytes:
    """Compress nodal values ``u`` on the finest mesh with an s-norm
    error bound.  The mesh itself is not stored (like the reference's
    in-memory API, the caller keeps the hierarchy)."""
    if math.isinf(s):
        raise ValueError("unstructured compression controls the s-norm; "
                         "pass a finite s (reference estimators.cpp:70)")
    u = jnp.asarray(u, dtype=jnp.float64)
    coeffs = hier.decompose(u)
    q = jnp.asarray(_quanta(hier, s, tolerance))
    scaled = coeffs / q
    ints = jnp.trunc(jnp.copysign(0.5 + jnp.abs(scaled), scaled)
                     ).astype(jnp.int32)
    if int(jnp.max(jnp.abs(scaled))) >= 2 ** 31 - 1:
        raise OverflowError("tolerance too small for data range")
    exps, words, count = bitplane.encode_pergroup(ints)
    exp_full = np.asarray(exps)
    nz = np.nonzero(exp_full)[0]
    exp_np = exp_full[:int(nz[-1]) + 1].tobytes() if len(nz) else b""
    word_np = np.asarray(words)[: int(count)].astype("<u4").tobytes()
    head = _MAGIC + struct.pack(
        "<ddqII", float(s), float(tolerance), hier.ndof(),
        len(exp_np), len(word_np))
    return head + exp_np + word_np


def decompress(hier: UniformMeshHierarchy, buf: bytes) -> np.ndarray:
    if buf[:4] != _MAGIC:
        raise ValueError("not an unstructured-mgard-tpu buffer")
    s, tol, n, n_exp, n_words = struct.unpack_from("<ddqII", buf, 4)
    off = 4 + struct.calcsize("<ddqII")
    if n != hier.ndof():
        raise ValueError("hierarchy/buffer dof mismatch")
    ngroups = bitplane.num_chunks(n) * bitplane.CHUNK_GROUPS
    exps = np.zeros(ngroups, dtype=np.uint8)
    exps[:n_exp] = np.frombuffer(buf[off:off + n_exp], dtype=np.uint8)
    words = np.frombuffer(
        buf[off + n_exp:off + n_exp + n_words], dtype="<u4")
    cap = bitplane.max_words(n)
    full = np.zeros(cap, dtype=np.uint32)
    full[: len(words)] = words
    ints = bitplane.decode_pergroup(
        jnp.asarray(exps), jnp.asarray(full), n)
    q = jnp.asarray(_quanta(hier, s, tol))
    coeffs = ints.astype(jnp.float64) * q
    return np.asarray(hier.recompose(coeffs))
