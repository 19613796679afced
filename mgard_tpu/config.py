"""Configuration knobs (counterpart of mgard_x::Config,
include/mgard-x/Config/Config.h:10-42 + defaults Config.cpp:14-47)."""

from __future__ import annotations

import dataclasses
import enum


class Lossless(enum.IntEnum):
    """Lossless back end for the quantized coefficient stream."""
    BITPLANE = 0        # TPU-native chunked bitplane codec (fastest)
    BITPLANE_ZSTD = 1   # chunked bitplane + host zstd second stage
    HUFFMAN_ZLIB = 2    # reference-compatible CPU Huffman + zlib (host)
    HUFFMAN_ZSTD = 3    # reference-compatible CPU Huffman + zstd (host)
    NONE = 4            # raw quantized int32 stream
    BITPLANE_GROUP = 5  # per-32-value-group exponents (best on-chip ratio)
    BITPLANE_GROUP_ZSTD = 6  # per-group + host zstd second stage
    BITPLANE_LZ4 = 7    # chunked bitplane + host LZ4 second stage
    #                     (reference Lossless::Huffman_LZ4 analog,
    #                     include/mgard-x/Lossless/LZ4.hpp:7-9)
    BITPLANE_GROUP_LZ4 = 8   # per-group + host LZ4 second stage

    @property
    def grouped(self) -> bool:
        """Per-32-value-group exponent variants."""
        return self in (Lossless.BITPLANE_GROUP,
                        Lossless.BITPLANE_GROUP_ZSTD,
                        Lossless.BITPLANE_GROUP_LZ4)

    @property
    def chunked(self) -> bool:
        """Per-chunk exponent variants (PYRAMID_SEG-capable)."""
        return self in (Lossless.BITPLANE, Lossless.BITPLANE_ZSTD,
                        Lossless.BITPLANE_LZ4)

    @property
    def second_stage(self):
        """Host second-stage codec applied to the bitplane sections:
        'zstd', 'lz4', or None."""
        if self in (Lossless.BITPLANE_ZSTD, Lossless.BITPLANE_GROUP_ZSTD):
            return "zstd"
        if self in (Lossless.BITPLANE_LZ4, Lossless.BITPLANE_GROUP_LZ4):
            return "lz4"
        return None


class Decomposition(enum.IntEnum):
    MULTIDIM = 0        # all dims per level (reference MultiDim default)
    SINGLEDIM = 1       # one dim at a time (reference Types.h:19)
    HYBRID = 2          # block-local levels then global (reference
    #                     HybridHierarchyCompressor.h:31-86).  On the wire
    #                     values >= 2 encode 1 + num_local_levels so the
    #                     header stays one byte.


class Layout(enum.IntEnum):
    """Quantized-coefficient stream layout."""
    FINE = 0          # fine-grid physical order (reference reorder=0);
                      # decode is one even reshape + stride-2 slices
    LEVEL_BLOCKS = 1  # region-blocked level-major (reference reorder=1)
    PYRAMID = 2       # dense level arrays concatenated coarsest-first
                      # (level-major like reorder=1, but parent positions
                      # stay as explicit zeros).  ~14% more raw values in
                      # 3-D, but the fine-grid gather/scatter assembly
                      # disappears from BOTH sides (encode skips
                      # pyramid_to_fine, decode unflattens with free
                      # slices) and chunks become level-pure, which the
                      # per-chunk exponents reward with a better ratio.
    PYRAMID_SEG = 3   # PYRAMID with each level padded to whole codec
                      # chunks (zero tails emit no stream rows).  Every
                      # level then feeds the bitplane codec directly —
                      # quantize+zigzag fuse into the codec kernel and
                      # the levels condense into one shared buffer, with
                      # no 1-D stream concatenation on either side.
                      # Default; non-bitplane losslesses and f64 fall
                      # back to the identical-bytes PYRAMID stream.


class ErrorMode(enum.IntEnum):
    ABS = 0
    REL = 1


@dataclasses.dataclass
class Config:
    lossless: Lossless = Lossless.BITPLANE
    decomposition: Decomposition = Decomposition.MULTIDIM
    # Block-local levels for Decomposition.HYBRID (reference
    # config.num_local_refactoring_level, Config.cpp:40).
    num_local_levels: int = 1
    layout: Layout = Layout.PYRAMID_SEG
    # Small domains upgrade BITPLANE -> per-group variants for ratio; the
    # multiblock path pins one choice for all blocks (the container header
    # records a single lossless id) by turning adaptation off.
    adapt_lossless: bool = True
    zstd_level: int = 1
    # Reinterpret lopsided shapes as balanced grids before compressing
    # (reference config.adjust_shape, ShapeAdjustment.hpp:43-77).
    adjust_shape: bool = False
    # Device-memory cap driving domain decomposition (reference
    # config.max_memory_footprint); 0 = auto-detect from the backend.
    max_memory_footprint: int = 0
    # Variable domain decomposition (reference
    # domain_decomposition_type::Variable + domain_decomposition_sizes):
    # explicit slab sizes along dd_dim; None = MaxDim uniform slabs
    # chosen by plan_blocks.
    dd_sizes: object = None
    dd_dim: int = 0
    # Domain-decomposition method (reference
    # domain_decomposition_type, Types.h:50): "maxdim" splits the
    # largest dim into slabs; "block" splits every dim into uniform N-D
    # blocks of edge <= block_edge (engages when that yields > 1 block).
    dd_method: str = "maxdim"
    # Threshold (bytes of input) above which compress() splits the domain
    # into blocks (reference DomainDecomposer triggers on the device-memory
    # footprint estimate, DomainDecomposer.hpp:72-89).
    max_block_bytes: int = 2 << 30
    # Target log2 block edge when domain decomposition engages.
    block_edge: int = 256
    # Codec chunk width (groups per chunk) for NEW containers; 0 = the
    # process default (env / autotune-seeded).  A per-workload tuned
    # value from the autotune table lands here via Config.tuned — safe
    # to vary freely because containers record their width and decode
    # honors the recorded value (round-5 self-describability).
    chunk_groups: int = 0
    log_level: int = 0

    def __post_init__(self):
        if self.log_level:
            from .utils import log as _log
            _log.level = self.log_level

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @classmethod
    def tuned(cls, shape, dtype) -> "Config":
        """Config from the autotune table for this (device, dtype, size)
        — the reference's AutoTuner-consulting Config path
        (include/mgard-x/Config/Config.h + AutoTuner tables).  Falls
        back to defaults when no entry exists.  Import-wide runtime
        knobs (codec chunk width, Pallas block sizes, matmul cap) are
        applied separately at import by utils.autotune.apply_tuned()."""
        from .utils import autotune
        cfg = autotune.lookup(shape, dtype)
        return cfg if cfg is not None else cls()
