// Golden-oracle driver linking the *reference* MGARD CPU library (built
// out-of-tree from /root/reference).  Used only by parity tests: our codec
// must produce buffers this oracle decodes, and decode buffers it produces.
//
// Usage:
//   mgard_oracle compress   <raw_in> <buf_out> <dtype> <tol> <s|inf> d0 [d1 d2]
//   mgard_oracle decompress <buf_in> <raw_out>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <array>
#include <fstream>
#include <limits>
#include <string>
#include <vector>

#include "compress.hpp"

namespace {

std::vector<char> read_file(const char *path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  f.seekg(0, std::ios::end);
  std::vector<char> data(f.tellg());
  f.seekg(0);
  f.read(data.data(), data.size());
  return data;
}

void write_file(const char *path, const void *data, std::size_t n) {
  std::ofstream f(path, std::ios::binary);
  f.write(static_cast<const char *>(data), n);
}

template <std::size_t N, typename Real>
int do_compress(const char *in, const char *out, double tol, double s,
                const std::array<std::size_t, N> &shape) {
  std::vector<char> raw = read_file(in);
  const mgard::TensorMeshHierarchy<N, Real> hierarchy(shape);
  std::vector<Real> v(hierarchy.ndof());
  std::memcpy(v.data(), raw.data(), v.size() * sizeof(Real));
  const mgard::CompressedDataset<N, Real> compressed = mgard::compress(
      hierarchy, v.data(), static_cast<Real>(s), static_cast<Real>(tol));
  std::ofstream f(out, std::ios::binary);
  compressed.write(f);  // self-describing container (header + payload)
  return 0;
}

template <typename Real>
int dispatch_compress(int ndim, const char *in, const char *out, double tol,
                      double s, const std::vector<std::size_t> &dims) {
  switch (ndim) {
  case 1:
    return do_compress<1, Real>(in, out, tol, s, {dims[0]});
  case 2:
    return do_compress<2, Real>(in, out, tol, s, {dims[0], dims[1]});
  case 3:
    return do_compress<3, Real>(in, out, tol, s, {dims[0], dims[1], dims[2]});
  default:
    std::fprintf(stderr, "unsupported ndim %d\n", ndim);
    return 2;
  }
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 3) { std::fprintf(stderr, "bad usage\n"); return 2; }
  const std::string mode = argv[1];
  if (mode == "decompress") {
    std::vector<char> buf = read_file(argv[2]);
    const mgard::MemoryBuffer<const unsigned char> out =
        mgard::decompress(buf.data(), buf.size());
    write_file(argv[3], out.data.get(), out.size);
    return 0;
  }
  if (mode == "compress") {
    if (argc < 8) { std::fprintf(stderr, "bad usage\n"); return 2; }
    const std::string dtype = argv[4];
    const double tol = std::atof(argv[5]);
    const double s = (std::string(argv[6]) == "inf")
                         ? std::numeric_limits<double>::infinity()
                         : std::atof(argv[6]);
    std::vector<std::size_t> dims;
    for (int i = 7; i < argc; ++i) dims.push_back(std::atoll(argv[i]));
    if (dtype == "float32") {
      return dispatch_compress<float>(dims.size(), argv[2], argv[3], tol, s,
                                      dims);
    }
    return dispatch_compress<double>(dims.size(), argv[2], argv[3], tol, s,
                                     dims);
  }
  std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 2;
}
