"""Command-line interface (counterpart of the reference `mgard` and
`mgard-x` executables, src/cli/executable.cpp:13-50 and
src/mgard-x/Executables/mgard-x.cpp:336-411).

Usage:
    python -m mgard_tpu compress   -i in.bin -o out.mgardtpu \
        --shape 512 512 512 --dtype float32 --tolerance 1e-3 [--smoothness S]
        [--mode abs|rel] [--lossless bitplane|bitplane-zstd]
    python -m mgard_tpu decompress -i in.mgardtpu -o out.bin
    python -m mgard_tpu inspect    -i in.mgardtpu
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def _build_parser():
    p = argparse.ArgumentParser(prog="mgard-tpu")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("compress", help="compress a raw binary array")
    c.add_argument("--input", "-i", required=True)
    c.add_argument("--output", "-o", required=True)
    c.add_argument("--shape", nargs="+", type=int, required=True)
    c.add_argument("--dtype", choices=["float32", "float64"],
                   default="float32")
    c.add_argument("--tolerance", "-e", type=float, required=True)
    c.add_argument("--smoothness", "-s", type=float, default=math.inf,
                   help="s-norm parameter; inf = L-infinity (default)")
    c.add_argument("--mode", "-m", choices=["abs", "rel"], default="abs")
    c.add_argument("--lossless", "-l",
                   choices=["bitplane", "bitplane-zstd"], default="bitplane")

    d = sub.add_parser("decompress", help="decompress a .mgardtpu container")
    d.add_argument("--input", "-i", required=True)
    d.add_argument("--output", "-o", required=True)

    s = sub.add_parser("inspect", help="print container header")
    s.add_argument("--input", "-i", required=True)
    return p


def main(argv=None):
    args = _build_parser().parse_args(argv)

    if args.command == "compress":
        import mgard_tpu
        from mgard_tpu.config import Config, Lossless

        data = np.fromfile(args.input, dtype=np.dtype(args.dtype))
        n_expected = int(np.prod(args.shape))
        if data.size != n_expected:
            sys.exit(f"error: file has {data.size} elements, "
                     f"shape needs {n_expected}")
        data = data.reshape(args.shape)
        lossless = (Lossless.BITPLANE_ZSTD if args.lossless == "bitplane-zstd"
                    else Lossless.BITPLANE)
        buf = mgard_tpu.compress(data, args.tolerance, s=args.smoothness,
                                 mode=args.mode,
                                 config=Config(lossless=lossless))
        with open(args.output, "wb") as f:
            f.write(buf)
        print(f"{data.nbytes} -> {len(buf)} bytes "
              f"(ratio {data.nbytes / len(buf):.2f}x)")
    elif args.command == "decompress":
        import mgard_tpu

        buf = open(args.input, "rb").read()
        out = mgard_tpu.decompress(buf)
        out.tofile(args.output)
        print(f"wrote {out.nbytes} bytes, shape {out.shape}, {out.dtype}")
    elif args.command == "inspect":
        from mgard_tpu.io import format as fmt

        buf = open(args.input, "rb").read()
        header, sections = fmt.read_container(buf)
        print(f"dtype       : {header.dtype}")
        print(f"shape       : {header.shape}")
        print(f"uniform grid: {header.uniform}")
        print(f"error mode  : {'abs' if header.error_mode == 0 else 'rel'}")
        print(f"s           : {header.s}")
        print(f"tolerance   : {header.tolerance}")
        print(f"norm        : {header.norm}")
        print(f"lossless    : {header.lossless}")
        print(f"levels      : {header.n_levels}")
        print(f"sections    : {list(header.section_sizes)} bytes")


if __name__ == "__main__":
    main()
