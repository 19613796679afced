"""ctypes binding for the LZ4 block-format codec.

The C++ source lives in native/mgard_lz4.cpp (self-contained encoder +
decoder producing standard LZ4 block-format streams) and is compiled on
first use like the Huffman codec (io/huffman_native.py).

Framing mirrors the reference's batched-LZ4 stage (nvcomp chunks of
``lz4_block_size``, include/mgard-x/Lossless/LZ4.hpp:19-29, default
1 << 15 from src/mgard-x/Config/Config.cpp:23): the payload is split
into fixed-size blocks, each LZ4-compressed independently, preceded by
a little-endian table::

    <u8 raw_len> <u4 block_size> <u4 comp_len[0]> ... <u4 comp_len[n-1]>

with ``n = ceil(raw_len / block_size)`` implicit.  A ``comp_len`` equal
to the block's raw size marks a stored (incompressible) block, copied
verbatim — LZ4 block format cannot represent data it cannot shrink.
"""

from __future__ import annotations

import ctypes
import pathlib
import struct
import subprocess
import threading

BLOCK_SIZE = 1 << 15

_LOCK = threading.Lock()
_LIB = None

_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / \
    "mgard_lz4.cpp"
_SO = _SRC.with_suffix(".so")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.mlz4_bound.restype = ctypes.c_size_t
        lib.mlz4_bound.argtypes = [ctypes.c_size_t]
        lib.mlz4_encode.restype = ctypes.c_long
        lib.mlz4_encode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_void_p, ctypes.c_size_t]
        lib.mlz4_decode.restype = ctypes.c_long
        lib.mlz4_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_void_p, ctypes.c_size_t]
        _LIB = lib
        return lib


def lz4_compress(data: bytes, block_size: int = BLOCK_SIZE) -> bytes:
    lib = _load()
    n = len(data)
    nblocks = -(-n // block_size) if n else 0
    lens = []
    chunks = []
    cap = int(lib.mlz4_bound(block_size))
    dst = ctypes.create_string_buffer(cap)
    for i in range(nblocks):
        raw = data[i * block_size:(i + 1) * block_size]
        rc = lib.mlz4_encode(raw, len(raw), dst, cap)
        if 0 < rc < len(raw):
            lens.append(rc)
            chunks.append(dst.raw[:rc])
        else:                      # incompressible: store verbatim
            lens.append(len(raw))
            chunks.append(raw)
    head = struct.pack("<QI", n, block_size)
    table = struct.pack(f"<{nblocks}I", *lens)
    return head + table + b"".join(chunks)


def lz4_decompress(buf: bytes, max_output_size: int = 0) -> bytes:
    """Decode a framed LZ4 payload.  The framing header is untrusted
    (reachable via direct calls that bypass the container CRC):
    ``block_size`` must be positive and, when the caller passes
    ``max_output_size`` (the stream capacity its own header implies),
    the claimed ``raw_len`` is validated BEFORE any allocation —
    mirroring the zstd path's max_output_size cap."""
    lib = _load()
    raw_len, block_size = struct.unpack_from("<QI", buf, 0)
    if block_size <= 0:
        raise ValueError("corrupt LZ4 framing: block_size must be > 0")
    if max_output_size and raw_len > max_output_size:
        raise ValueError(
            f"LZ4 framing claims {raw_len} bytes, over the caller's "
            f"{max_output_size}-byte cap")
    nblocks = -(-raw_len // block_size) if raw_len else 0
    if 12 + 4 * nblocks > len(buf):
        raise ValueError("truncated LZ4 block table")
    off = 12
    lens = struct.unpack_from(f"<{nblocks}I", buf, off)
    off += 4 * nblocks
    out = bytearray(raw_len)
    pos = 0
    for i, clen in enumerate(lens):
        raw_n = min(block_size, raw_len - pos)
        blk = buf[off:off + clen]
        if clen == raw_n:          # stored block
            out[pos:pos + raw_n] = blk
        else:
            dst = (ctypes.c_char * raw_n).from_buffer(out, pos)
            rc = lib.mlz4_decode(blk, clen, dst, raw_n)
            if rc != raw_n:
                raise ValueError(
                    f"corrupt LZ4 block {i}: decoded {rc} of {raw_n}")
        off += clen
        pos += raw_n
    if pos != raw_len:
        raise ValueError("truncated LZ4 payload")
    return bytes(out)
