"""TPU-native lossless codec for quantized coefficients.

Grouped bitplane coding with per-group exponents — the role Huffman+deflate
plays in the reference (include/compressors.hpp, src/compressors.cpp:316-512),
re-designed for the TPU's execution model:

  * values are processed in groups of 32; each group is bit-transposed so
    that bitplane ``b`` of the 32 magnitudes becomes one ``uint32`` word
    (the same primitive as the reference MDR GroupedBPEncoder,
    include/mgard-x/MDR-X/BitplaneEncoder/GroupedBPEncoderGPU.hpp:44-120);
  * a group with max magnitude needing ``e`` bits emits ``1 + e`` words
    (sign word, then bitplanes MSB -> LSB); an all-zero group emits nothing;
  * the variable-length streams are concatenated *word-aligned*, so the
    "condense" step is a single big gather driven by a cumsum of per-group
    counts — no bit-granularity shifting, no serial dependence, no atomics.

Everything is static-shaped and jittable: the encoder writes into a
fixed-capacity word buffer and returns the true word count as a scalar
(the reference handles variable output the same way via its
``OutputTooLargeFailure`` pattern).

Storing planes MSB-first makes the stream *progressively truncatable* per
group, which is exactly the primitive MDR needs for multiresolution
retrieval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "encode", "decode", "GROUP", "max_words", "encoded_nbytes",
]

GROUP = 32  # values per group == bits per word


def max_words(n: int) -> int:
    """Capacity of the word buffer for ``n`` values (worst case 33/32)."""
    ngroups = -(-n // GROUP)
    return ngroups * (GROUP + 1)


def encoded_nbytes(exponents, count):
    """Total payload bytes given encoder outputs."""
    return exponents.size + 4 * count


def _pow2_lanes(dtype=jnp.uint32):
    return jnp.asarray(
        np.asarray([1 << i for i in range(GROUP)], dtype=np.uint32),
        dtype=dtype)


def _bit_transpose(m: jax.Array) -> jax.Array:
    """(ngroups, 32) uint32 magnitudes -> (ngroups, 32) plane words.

    Output[:, b] has bit i = bit b of value i of the group.
    """
    lanes = _pow2_lanes()
    planes = []
    for b in range(GROUP):
        bits = (m >> np.uint32(b)) & np.uint32(1)
        planes.append(jnp.sum(bits * lanes, axis=-1, dtype=jnp.uint32))
    return jnp.stack(planes, axis=-1)


def _bit_untranspose(planes: jax.Array) -> jax.Array:
    """Inverse of :func:`_bit_transpose`."""
    ngroups = planes.shape[0]
    out = jnp.zeros((ngroups, GROUP), dtype=jnp.uint32)
    for b in range(GROUP):
        word = planes[:, b]
        bits = (word[:, None] >> _pow2_lanes_log()) & np.uint32(1)
        out = out | (bits << np.uint32(b))
    return out


def _pow2_lanes_log():
    return jnp.asarray(np.arange(GROUP, dtype=np.uint32))


def _group_exponent(m: jax.Array) -> jax.Array:
    """Bits needed for the max magnitude of each group: (ngroups,) int32."""
    gmax = jnp.max(m, axis=-1)
    # Integer bit-length (floor(log2)+1) via 5-step binary search — exact
    # for the full uint32 range, no float roundoff.
    x = jnp.maximum(gmax, np.uint32(1))
    e = jnp.zeros_like(gmax, dtype=jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        big = x >= (np.uint32(1) << np.uint32(shift))
        e = e + jnp.where(big, shift, 0).astype(jnp.int32)
        x = jnp.where(big, x >> np.uint32(shift), x)
    e = e + 1  # floor(log2) + 1 bits
    return jnp.where(gmax == 0, 0, e)


def encode(q: jax.Array):
    """Encode an int32 vector.

    Returns ``(exponents uint8 (ngroups,), words uint32 (max_words,),
    count int32 scalar)``.  Only ``words[:count]`` is meaningful.
    """
    n = q.shape[0]
    ngroups = -(-n // GROUP)
    pad = ngroups * GROUP - n
    if pad:
        q = jnp.concatenate([q, jnp.zeros(pad, dtype=q.dtype)])
    qg = q.reshape(ngroups, GROUP)
    m = jnp.abs(qg).astype(jnp.uint32)
    neg = (qg < 0).astype(jnp.uint32)

    sign_word = jnp.sum(neg * _pow2_lanes(), axis=-1, dtype=jnp.uint32)
    planes = _bit_transpose(m)  # (ngroups, 32), LSB-first along axis 1

    e = _group_exponent(m)  # (ngroups,)
    counts = jnp.where(e > 0, e + 1, 0)
    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1]

    # Per-group padded layout: [sign, plane_{e-1}, ..., plane_0, junk...]
    # i.e. slot k of group g (k >= 1) holds plane (e_g - k), MSB first.
    slot = jnp.arange(GROUP + 1, dtype=jnp.int32)[None, :]       # (1, 33)
    plane_idx = e[:, None] - slot                                # e-k
    plane_idx_c = jnp.clip(plane_idx, 0, GROUP - 1)
    gathered = jnp.take_along_axis(planes, plane_idx_c, axis=1)  # (g, 33)
    padded = jnp.concatenate([sign_word[:, None], gathered[:, 1:]], axis=1)

    # Condense: out[j] = padded[g(j), j - offsets[g(j)] ] for j < total.
    cap = ngroups * (GROUP + 1)
    marks = jnp.zeros(cap + 1, dtype=jnp.int32).at[offsets].add(
        1, indices_are_sorted=True)
    gid = jnp.cumsum(marks[:-1]) - 1                             # (cap,)
    gid = jnp.clip(gid, 0, ngroups - 1)
    j = jnp.arange(cap, dtype=jnp.int32)
    slot_of_j = j - offsets[gid]
    src = gid * (GROUP + 1) + jnp.clip(slot_of_j, 0, GROUP)
    words = jnp.take(padded.reshape(-1), src)
    words = jnp.where(j < total, words, np.uint32(0))
    return e.astype(jnp.uint8), words, total.astype(jnp.int32)


def decode(exponents: jax.Array, words: jax.Array, n: int) -> jax.Array:
    """Decode back to an int32 vector of length ``n``.

    ``exponents``: (ngroups,) uint8; ``words``: uint32 buffer whose first
    ``sum(counts)`` entries are the condensed stream (extra tail entries are
    ignored, so a zero-padded buffer is fine).
    """
    ngroups = exponents.shape[0]
    e = exponents.astype(jnp.int32)
    counts = jnp.where(e > 0, e + 1, 0)
    offsets = jnp.cumsum(counts) - counts

    cap_words = words.shape[0]
    sign_idx = jnp.clip(offsets, 0, cap_words - 1)
    sign_word = jnp.where(e > 0, jnp.take(words, sign_idx), np.uint32(0))

    # plane b (LSB-index) of group g lives at offsets[g] + 1 + (e_g - 1 - b)
    b = jnp.arange(GROUP, dtype=jnp.int32)[None, :]
    idx = offsets[:, None] + e[:, None] - b
    valid = (b < e[:, None])
    idx_c = jnp.clip(idx, 0, cap_words - 1)
    planes = jnp.where(valid, jnp.take(words, idx_c), np.uint32(0))

    m = _bit_untranspose(planes)  # (ngroups, 32)
    neg = (sign_word[:, None] >> _pow2_lanes_log()) & np.uint32(1)
    vals = m.astype(jnp.int32)
    vals = jnp.where(neg == 1, -vals, vals)
    return vals.reshape(-1)[:n]
