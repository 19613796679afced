"""Interoperability with the reference MGARD self-describing format.

Reads and writes buffers in the reference *CPU* container layout
(include/format.hpp:28-63): ``MGARD`` magic, big-endian header size and
CRC32, a proto3 ``mgard.pb.Header`` (src/mgard.proto), then the
Huffman+zlib/zstd payload produced by ``compress_memory_huffman``
(src/compressors.cpp:421-512).

``decompress_mgard`` decodes buffers produced by the reference `mgard`
CLI/library; ``compress_mgard`` produces buffers the reference can decode.
The multigrid math runs on our JAX pyramid kernels; only the
(de)quantization ordering is adapted to the reference's shuffled
(level-major, raster-within-level) layout via host-precomputed
permutations.
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import Dict, Tuple

import numpy as np

from ..hierarchy import Hierarchy
from . import protowire

MAGIC = b"MGARD"

# --- mgard.pb schema (field numbers from src/mgard.proto) -----------------

SCHEMAS: Dict[str, Dict] = {
    "VersionNumber": {
        "major_": (1, "varint"), "minor_": (2, "varint"),
        "patch_": (3, "varint"),
    },
    "CartesianGridTopology": {
        "dimension": (1, "varint"), "shape": (2, "repeated_varint"),
    },
    "ExplicitCubeGeometry": {"coordinates": (2, "repeated_double")},
    "Domain": {
        "topology": (1, "varint"),
        "cartesian_grid_topology": (2, "message:CartesianGridTopology"),
        "geometry": (3, "varint"),
        "explicit_cube_geometry": (4, "message:ExplicitCubeGeometry"),
        "explicit_cube_filename": (5, "string"),
    },
    "Dataset": {"type": (1, "varint"), "dimension": (2, "varint")},
    "ErrorControl": {
        "mode": (1, "varint"), "norm": (2, "varint"), "s": (3, "double"),
        "norm_of_original_data": (4, "double"), "tolerance": (5, "double"),
    },
    "DomainDecomposition": {
        "method": (1, "varint"), "decomposition_dimension": (2, "varint"),
        "decomposition_size": (3, "varint"),
    },
    "FunctionDecomposition": {
        "transform": (1, "varint"), "hierarchy": (2, "varint"),
        "L_target": (3, "varint"),
    },
    "Quantization": {
        "method": (1, "varint"), "bin_widths": (2, "varint"),
        "type": (3, "varint"), "big_endian": (4, "varint"),
    },
    "BitplaneEncoding": {
        "method": (1, "varint"), "type": (2, "varint"),
        "number_bitplanes": (3, "varint"), "big_endian": (4, "varint"),
    },
    "Encoding": {
        "preprocessor": (1, "varint"), "compressor": (2, "varint"),
        "huffman_dictionary_size": (3, "varint"),
        "huffman_block_size": (4, "varint"),
    },
    "Device": {"backend": (1, "varint")},
    "Header": {
        "mgard_version": (2, "message:VersionNumber"),
        "file_format_version": (3, "message:VersionNumber"),
        "domain": (4, "message:Domain"),
        "dataset": (5, "message:Dataset"),
        "error_control": (6, "message:ErrorControl"),
        "domain_decomposition": (7, "message:DomainDecomposition"),
        "function_decomposition": (8, "message:FunctionDecomposition"),
        "quantization": (9, "message:Quantization"),
        "bitplane_encoding": (10, "message:BitplaneEncoding"),
        "encoding": (11, "message:Encoding"),
        "device": (12, "message:Device"),
    },
}

# enum values (mgard.proto)
CPU_HUFFMAN_ZLIB = 1
CPU_HUFFMAN_ZSTD = 2
DATASET_FLOAT, DATASET_DOUBLE = 0, 1
NORM_L_INFINITY, NORM_S_NORM = 0, 1


def read_container(buf: bytes) -> Tuple[Dict, bytes]:
    """Parse an MGARD buffer -> (header message dict, payload bytes)."""
    if buf[:5] != MAGIC:
        raise ValueError("not an MGARD buffer (bad magic)")
    (hdr_size,) = struct.unpack_from(">Q", buf, 5)
    (crc,) = struct.unpack_from(">I", buf, 13)
    hdr = buf[17:17 + hdr_size]
    if (zlib.crc32(hdr) & 0xFFFFFFFF) != crc:
        raise ValueError("MGARD header CRC mismatch")
    header = protowire.decode_message(SCHEMAS["Header"], SCHEMAS, hdr)
    return header, buf[17 + hdr_size:]


def write_container(header: Dict, payload: bytes) -> bytes:
    hdr = protowire.encode_message(SCHEMAS["Header"], SCHEMAS, header)
    out = bytearray()
    out += MAGIC
    out += struct.pack(">Q", len(hdr))
    out += struct.pack(">I", zlib.crc32(hdr) & 0xFFFFFFFF)
    out += hdr
    out += payload
    return bytes(out)


# --- shuffled-order quantization bridge ------------------------------------

def _shuffled_maps(hier: Hierarchy):
    """Host tables bridging our pyramid layout and the reference's
    shuffled vector: returns (block_order_fine_idx -> shuffled perm,
    per-node quantum weight info in shuffled order)."""
    from ..ops.transform import block_specs

    # fine flat index of every node, in our block-serialization order
    ours = []
    levels = []
    vol_parts = []
    for (l, r, bs, pos) in block_specs(hier):
        fine_pos = []
        volw = []
        for d in range(hier.ndim):
            fine = hier.level_indices(l, d)[np.asarray(pos[d])]
            fine_pos.append(fine)
            if hier.shape[d] > 1:
                volw.append(hier.dims[d][l].volumes[np.asarray(pos[d])])
            else:
                volw.append(np.ones(len(pos[d])))
        grid = np.meshgrid(*fine_pos, indexing="ij")
        flat = np.zeros(bs, dtype=np.int64)
        for d in range(hier.ndim):
            flat = flat * hier.shape[d] + grid[d]
        ours.append(flat.ravel())
        levels.append(np.full(flat.size, l, dtype=np.int64))
        vol = np.ones(bs)
        for d in range(hier.ndim):
            shp = [1] * hier.ndim
            shp[d] = len(volw[d])
            vol = vol * volw[d].reshape(shp)
        vol_parts.append(vol.ravel())
    ours_fine = np.concatenate(ours)
    ours_level = np.concatenate(levels)
    ours_vol = np.concatenate(vol_parts)

    shuffled_fine = hier.shuffle_permutation()  # shuffled[i] = fine idx
    pos_of_fine = np.empty(hier.ndof(), dtype=np.int64)
    pos_of_fine[ours_fine] = np.arange(hier.ndof())
    ours_to_shuffled = pos_of_fine[shuffled_fine]
    return ours_to_shuffled, ours_level[ours_to_shuffled], \
        ours_vol[ours_to_shuffled]


def _quanta_shuffled(hier: Hierarchy, s: float, tol: float):
    """Per-node quantum, shuffled order (reference
    TensorMultilevelCoefficientQuantizer.tpp:12-55)."""
    perm, lvl, vol = _shuffled_maps(hier)
    if math.isinf(s):
        d = hier.effective_ndim
        q = (2.0 * tol) / ((hier.L + 1) * (1 + 3.0 ** d))
        return perm, np.full(hier.ndof(), q)
    q = (2.0 * tol) / (np.exp2(s * lvl) * np.sqrt(hier.ndof() * vol))
    return perm, q


def _pyramid_coeffs_block_order(hier: Hierarchy, v: np.ndarray) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from ..ops import transform

    f = jax.jit(lambda x: transform.flatten_pyramid(
        hier, transform.decompose(hier, x)))
    return np.asarray(f(jnp.asarray(v)))


def _recompose_from_block_order(hier: Hierarchy, flat: np.ndarray,
                                dtype) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from ..ops import transform

    f = jax.jit(lambda x: transform.recompose(
        hier, transform.unflatten_pyramid(hier, x)))
    return np.asarray(f(jnp.asarray(flat.astype(dtype))))


# --- public API -------------------------------------------------------------

def compress_mgard(data: np.ndarray, tolerance: float, s: float = math.inf,
                   coordinates=None, zstd: bool = True) -> bytes:
    """Compress into the reference CPU format (decodable by `mgard`)."""
    from .huffman_native import huffman_encode

    data = np.asarray(data)
    hier = Hierarchy(data.shape, coordinates=coordinates,
                     placement="reference")
    flat = _pyramid_coeffs_block_order(hier, data).astype(np.float64)
    perm, quanta = _quanta_shuffled(hier, s, tolerance)
    shuffled = flat[perm]
    scaled = shuffled / quanta
    q = np.trunc(np.copysign(0.5 + np.abs(scaled), scaled)).astype(np.int64)

    if zstd:
        # CPU_HUFFMAN_ZSTD: Huffman stream, zstd-packed, 3-size preamble
        # (reference compress_memory_huffman, src/compressors.cpp:421-512)
        import zstandard
        tree, hit, hit_bits, miss = huffman_encode(q)
        inner = tree + hit + miss
        packed = zstandard.ZstdCompressor(level=1).compress(inner)
        payload = struct.pack("<QQQ", len(tree), hit_bits,
                              len(miss)) + packed
        compressor = CPU_HUFFMAN_ZSTD
    else:
        # CPU_HUFFMAN_ZLIB: despite the name, plain zlib over the raw
        # int64 stream (reference compress(), src/compressors.cpp:664-665)
        payload = zlib.compress(q.tobytes(), 9)
        compressor = CPU_HUFFMAN_ZLIB

    header = {
        "mgard_version": {"major_": 1, "minor_": 6, "patch_": 0},
        "file_format_version": {"major_": 1, "minor_": 0, "patch_": 0},
        "domain": {
            "topology": 0,
            "cartesian_grid_topology": {
                "dimension": data.ndim,
                "shape": list(data.shape),
            },
            "geometry": 0 if coordinates is None else 1,
            **({"explicit_cube_geometry": {
                "coordinates": list(np.concatenate(coordinates))}}
               if coordinates is not None else {}),
        },
        "dataset": {
            "type": DATASET_FLOAT if data.dtype == np.float32
            else DATASET_DOUBLE,
            "dimension": 1,
        },
        "error_control": {
            "mode": 0,
            "norm": NORM_L_INFINITY if math.isinf(s) else NORM_S_NORM,
            **({} if math.isinf(s) else {"s": s}),
            "tolerance": tolerance,
        },
        "function_decomposition": {"transform": 0, "hierarchy": 0},
        "quantization": {"method": 1, "bin_widths": 0, "type": 3,
                         "big_endian": 0},
        "encoding": {"preprocessor": 1, "compressor": compressor},
        "device": {"backend": 0},
    }
    return write_container(header, payload)


def decompress_mgard(buf: bytes) -> np.ndarray:
    """Decompress a reference CPU-format buffer."""
    from .huffman_native import huffman_decode

    header, payload = read_container(bytes(buf))

    domain = header["domain"]
    topo = domain["cartesian_grid_topology"]
    shape = tuple(int(x) for x in topo["shape"])
    coordinates = None
    if domain.get("geometry") == 1:
        coords_flat = np.asarray(
            domain["explicit_cube_geometry"]["coordinates"])
        coordinates, off = [], 0
        for n in shape:
            coordinates.append(coords_flat[off:off + n])
            off += n
    dtype = (np.float32 if header["dataset"]["type"] == DATASET_FLOAT
             else np.float64)
    ec = header["error_control"]
    s = math.inf if ec["norm"] == NORM_L_INFINITY else ec["s"]
    tol = ec["tolerance"]
    if ec["mode"] == 1:  # RELATIVE
        tol = tol * ec["norm_of_original_data"]

    compressor = header["encoding"]["compressor"]
    if header["quantization"].get("type", 3) != 3:
        raise NotImplementedError("only INT64_T quantization supported")

    hier = Hierarchy(shape, coordinates=coordinates,
                     placement="reference")
    ndof = hier.ndof()

    if compressor == CPU_HUFFMAN_ZSTD:
        import zstandard
        tree_size, hit_bits, miss_size = struct.unpack_from(
            "<QQQ", payload, 0)
        inner_size = tree_size + hit_bits // 8 + 4 + miss_size
        inner = zstandard.ZstdDecompressor().decompress(
            payload[24:], max_output_size=inner_size)
        tree = inner[:tree_size]
        hit = inner[tree_size:tree_size + hit_bits // 8 + 4]
        miss = inner[tree_size + hit_bits // 8 + 4:]
        q = huffman_decode(tree, hit, hit_bits, miss, ndof)
    elif compressor == CPU_HUFFMAN_ZLIB:
        # plain zlib over raw int64 (src/compressors.cpp:686-688)
        q = np.frombuffer(zlib.decompress(payload), dtype="<i8").copy()
    else:
        raise NotImplementedError(f"compressor {compressor}")

    perm, quanta = _quanta_shuffled(hier, s, tol)
    shuffled = q.astype(np.float64) * quanta
    flat = np.empty(ndof)
    flat[perm] = shuffled
    return _recompose_from_block_order(hier, flat, dtype).astype(dtype)
