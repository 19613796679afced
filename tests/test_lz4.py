"""LZ4 second-stage tests (reference include/mgard-x/Lossless/LZ4.hpp).

The native codec (native/mgard_lz4.cpp) emits standard LZ4
*block format*; `_py_lz4_block_decode` below is an independent
pure-Python decoder written from the format document so the C++
encoder's conformance is checked against something other than its own
decoder.
"""

import numpy as np
import pytest

from mgard_tpu.io.lz4_native import lz4_compress, lz4_decompress


def _py_lz4_block_decode(src: bytes, raw_len: int) -> bytes:
    """Reference decoder for LZ4 block format (doc/lz4_Block_format.md)."""
    out = bytearray()
    i = 0
    while i < len(src):
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i >= len(src):
            break
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        assert 0 < offset <= len(out)
        mlen = token & 15
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        for _ in range(mlen):  # may overlap
            out.append(out[-offset])
    assert len(out) == raw_len
    return bytes(out)


@pytest.mark.parametrize("n", [0, 1, 11, 100, (1 << 15) - 3, 1 << 15,
                               (1 << 15) + 1, 3 * (1 << 15) + 777])
def test_roundtrip_sizes(n):
    rng = np.random.default_rng(n or 1)
    # mixed compressibility: runs + random tail
    data = (np.repeat(rng.integers(0, 4, n // 2 + 1, dtype=np.uint8), 2)
            [:n // 2 * 2].tobytes()
            + rng.integers(0, 256, n - n // 2 * 2, dtype=np.uint8)
            .tobytes())
    assert lz4_decompress(lz4_compress(data)) == data


def test_incompressible_stored():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 1 << 16, dtype=np.uint8).tobytes()
    comp = lz4_compress(data)
    assert lz4_decompress(comp) == data
    # stored blocks keep the overhead to the framing table only
    assert len(comp) <= len(data) + 12 + 4 * 2 + 16


def test_compressible_shrinks():
    data = b"the quick brown fox " * 4096
    comp = lz4_compress(data)
    assert len(comp) < len(data) // 10
    assert lz4_decompress(comp) == data


def test_block_format_conformance():
    """The native encoder's per-block output decodes with an independent
    pure-Python LZ4 block-format decoder."""
    import struct

    data = (b"abcabcabcabc0123456789" * 700)[: (1 << 14)]
    comp = lz4_compress(data)
    raw_len, block_size = struct.unpack_from("<QI", comp, 0)
    nblocks = -(-raw_len // block_size)
    lens = struct.unpack_from(f"<{nblocks}I", comp, 12)
    off = 12 + 4 * nblocks
    assert nblocks == 1 and lens[0] < len(data)  # actually compressed
    assert _py_lz4_block_decode(comp[off:off + lens[0]],
                                raw_len) == data


def test_corrupt_detected_or_differs():
    """LZ4 block format carries no checksum, so corruption either trips
    the structural checks (bad offset/length) or yields different bytes
    — it must never crash.  (Containers add CRC32 over the section, so
    the public API still detects it: io/format.py read_container.)"""
    data = b"hello world, hello world, hello" * 99
    comp = bytearray(lz4_compress(data))
    for pos in (12 + 4, len(comp) // 2, len(comp) - 1):
        bad = bytearray(comp)
        bad[pos] ^= 0xFF
        try:
            out = lz4_decompress(bytes(bad))
        except ValueError:
            continue
        assert out != data


def test_lz4_multiblock_and_f64():
    """The LZ4 stage flows through domain decomposition (one lossless
    id pinned for the container) and the f64 wide codec (grouped ->
    chunked adaption)."""
    import mgard_tpu
    from mgard_tpu.config import Config, Lossless

    x = np.linspace(0, 1, 48, dtype=np.float32)
    v = (np.sin(3 * x)[:, None, None] * np.cos(2 * x)[None, :, None]
         * x[None, None, :]).astype(np.float32).copy()
    cfg = Config(lossless=Lossless.BITPLANE_LZ4,
                 max_block_bytes=v.nbytes // 3)   # force multiblock
    buf = mgard_tpu.compress(v, 1e-3, config=cfg)
    from mgard_tpu.io import format as fmt
    header, _ = fmt.read_container(buf)
    assert header.dd_nblocks > 1
    out = mgard_tpu.decompress(buf)
    assert np.max(np.abs(out - v)) <= 1e-3

    v64 = v.astype(np.float64)
    buf64 = mgard_tpu.compress(
        v64, 1e-9, config=Config(lossless=Lossless.BITPLANE_GROUP_LZ4))
    out64 = mgard_tpu.decompress(buf64)
    assert out64.dtype == np.float64
    assert np.max(np.abs(out64 - v64)) <= 1e-9


@pytest.mark.parametrize("lossless_name", ["BITPLANE_LZ4",
                                           "BITPLANE_GROUP_LZ4"])
def test_e2e_lz4_stage(lossless_name):
    """Public-API round-trip with the LZ4 second stage; bound holds and
    smooth data shrinks versus the stage-less codec."""
    import mgard_tpu
    from mgard_tpu.config import Config, Lossless

    x = np.linspace(0, 1, 65, dtype=np.float32)
    v = np.sin(2 * np.pi * x)[:, None] * np.cos(np.pi * x)[None, :]
    v = np.broadcast_to(v[..., None], (65, 65, 17)).copy()
    buf = mgard_tpu.compress(
        v, 1e-3, config=Config(lossless=Lossless[lossless_name]))
    out = mgard_tpu.decompress(buf)
    assert np.max(np.abs(out - v)) <= 1e-3
    plain = mgard_tpu.compress(
        v, 1e-3, config=Config(lossless=Lossless.BITPLANE,
                               adapt_lossless=False))
    assert len(buf) < len(plain)


def test_decompress_rejects_bad_framing():
    """ADVICE round-4: the framing header is untrusted — block_size=0
    raises ValueError (not ZeroDivisionError) and an absurd raw_len is
    rejected before allocation when the caller passes its cap."""
    import struct

    import pytest

    from mgard_tpu.io.lz4_native import lz4_compress, lz4_decompress

    good = lz4_compress(b"hello world" * 100)
    bad_bs = struct.pack("<QI", 1100, 0) + good[12:]
    with pytest.raises(ValueError, match="block_size"):
        lz4_decompress(bad_bs)
    huge = struct.pack("<QI", 1 << 60, 1 << 15) + good[12:]
    with pytest.raises(ValueError, match="cap"):
        lz4_decompress(huge, max_output_size=1 << 20)
    # the cap passes through on honest payloads
    assert lz4_decompress(good, max_output_size=1100) == b"hello world" * 100


def test_third_party_lz4_decodes_our_blocks():
    """ADVICE round-4: validate true third-party interop when the
    python-lz4 package is present (skips otherwise) — every framed
    block must decode with stock liblz4, not just our own decoder."""
    import struct

    lz4block = pytest.importorskip("lz4.block")

    from mgard_tpu.io.lz4_native import lz4_compress

    rng = np.random.default_rng(0)
    data = (np.repeat(rng.integers(0, 50, 5000), 7)
            .astype(np.uint8).tobytes())
    buf = lz4_compress(data)
    raw_len, block_size = struct.unpack_from("<QI", buf, 0)
    nblocks = -(-raw_len // block_size)
    lens = struct.unpack_from(f"<{nblocks}I", buf, 12)
    off = 12 + 4 * nblocks
    out = b""
    pos = 0
    for clen in lens:
        raw_n = min(block_size, raw_len - pos)
        blk = buf[off:off + clen]
        if clen == raw_n:
            out += blk
        else:
            out += lz4block.decompress(blk, uncompressed_size=raw_n)
        off += clen
        pos += raw_n
    assert out == data
