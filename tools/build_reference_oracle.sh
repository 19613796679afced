#!/bin/sh
# Build the reference MGARD CPU library out-of-tree and link the oracle
# driver used by tests/test_reference_oracle.py.
set -e
BUILD=${1:-/tmp/mgard_build}
if [ ! -f "$BUILD/lib/libmgard.so" ]; then
  cmake -S /root/reference -B "$BUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release \
    -DMGARD_ENABLE_CLI=OFF -DMGARD_ENABLE_SERIAL=OFF \
    -DMGARD_ENABLE_OPENMP=OFF -DBUILD_TESTING=OFF \
    -DMGARD_ENABLE_UNSTRUCTURED=OFF
  ninja -C "$BUILD" mgard-library
fi
g++ -O2 -std=c++17 -o /tmp/mgard_oracle \
  "$(dirname "$0")/../native/mgard_oracle.cpp" \
  -I/root/reference/include -I"$BUILD/include" \
  -L"$BUILD/lib" -lmgard -Wl,-rpath,"$BUILD/lib" -lprotobuf -lz -lzstd
echo "oracle at /tmp/mgard_oracle"

# Optionally also build the mgard-x serial executable for live X-interop
# tests (tests/test_mgardx_interop.py); golden fixtures in tests/data/
# keep the decode path covered when this build is absent.
# `with-mdr` additionally builds the reference mdr-x executable (MDR
# progressive refactoring) for the live artifact-interop tests
# (tests/test_mdrx_artifacts.py).
if [ "$2" = "with-mdr" ] && [ ! -f /tmp/mgard_build_mdr/bin/mdr-x ]; then
  cmake -S /root/reference -B /tmp/mgard_build_mdr -G Ninja \
    -DCMAKE_BUILD_TYPE=Release -DMGARD_ENABLE_CLI=OFF \
    -DMGARD_ENABLE_SERIAL=ON -DMGARD_ENABLE_OPENMP=OFF \
    -DBUILD_TESTING=OFF -DMGARD_ENABLE_UNSTRUCTURED=OFF \
    -DMGARD_ENABLE_MDR=ON
  ninja -C /tmp/mgard_build_mdr mdr-x
fi
if [ "$2" = "with-x" ]; then
  if [ ! -f /tmp/mgard_build_x/bin/mgard-x ]; then
    cmake -S /root/reference -B /tmp/mgard_build_x -G Ninja \
      -DCMAKE_BUILD_TYPE=Release -DMGARD_ENABLE_CLI=OFF \
      -DMGARD_ENABLE_SERIAL=ON -DMGARD_ENABLE_OPENMP=OFF \
      -DBUILD_TESTING=OFF -DMGARD_ENABLE_UNSTRUCTURED=OFF
    ninja -C /tmp/mgard_build_x mgard-x
  fi
  # The SERIAL build finds libzstd, so its libmgard carries the
  # CPU_HUFFMAN_ZSTD path; link a second oracle against it to cover
  # the zstd Huffman parity tests (test_reference_oracle.py).
  if [ ! -f /tmp/mgard_oracle_zstd ]; then
    g++ -O2 -std=c++17 -o /tmp/mgard_oracle_zstd \
      "$(dirname "$0")/../native/mgard_oracle.cpp" \
      -DMGARD_ZSTD -I/root/reference/include -I/tmp/mgard_build_x/include \
      -L/tmp/mgard_build_x/lib -lmgard \
      -Wl,-rpath,/tmp/mgard_build_x/lib -lprotobuf -lz -lzstd
    echo "zstd oracle at /tmp/mgard_oracle_zstd"
  fi
fi
