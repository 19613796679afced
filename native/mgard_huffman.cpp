// Reference-compatible CPU Huffman codec for quantized coefficients.
//
// Produces bit-identical streams to the reference CPU back end
// (src/compressors.cpp:316-419 huffman_encoding / :183-272
// huffman_decoding in CODARcode/MGARD): dictionary of nql = 131072
// symbols centered on zero, out-of-range values escaped through symbol 0
// with the raw value in a side channel, MSB-first bit packing into 32-bit
// words, and a {symbol, frequency} table from which the decoder rebuilds
// the tree.
//
// Tie-breaking parity: the reference builds its tree with a
// std::priority_queue ordered only by count.  We use the same container,
// comparator semantics and push order, so on the same standard library the
// merge order — and therefore every codeword — matches exactly.
//
// Built as a plain C shared library (no pybind11); Python binds via ctypes.

#include <cstdint>
#include <cstdlib>
#include <cstring>

#include <memory>
#include <queue>
#include <vector>

namespace {

constexpr int kDict = 32768 * 4;  // nql

struct Node {
  int symbol;       // 0..kDict-1, or -1 for internal
  std::uint64_t count;
  Node *left = nullptr;
  Node *right = nullptr;
};

struct CountGreater {
  bool operator()(Node const *a, Node const *b) const {
    return a->count > b->count;  // min-heap on count, ties by heap order
  }
};

struct Code {
  std::uint32_t bits = 0;
  std::uint32_t length = 0;
};

// Depth-first code assignment: left appends 0, right appends 1.
void assign_codes(Node *node, std::uint32_t bits, std::uint32_t length,
                  std::vector<Code> &codes) {
  if (!node->left && !node->right) {
    codes[node->symbol] = Code{bits, length};
    return;
  }
  if (node->left) assign_codes(node->left, bits << 1, length + 1, codes);
  if (node->right) assign_codes(node->right, (bits << 1) | 1u, length + 1, codes);
}

Node *build_tree(const std::uint64_t *freq, std::vector<Node> &pool) {
  std::priority_queue<Node *, std::vector<Node *>, CountGreater> heap;
  pool.clear();
  pool.reserve(2 * kDict);
  for (int s = 0; s < kDict; ++s) {
    if (freq[s]) {
      pool.push_back(Node{s, freq[s]});
    }
  }
  // Pointers into `pool` stay valid: reserve() above covers all internal
  // nodes too (at most leaves-1 more).
  for (auto &n : pool) heap.push(&n);
  if (heap.empty()) return nullptr;
  while (heap.size() > 1) {
    Node *a = heap.top(); heap.pop();
    Node *b = heap.top(); heap.pop();
    pool.push_back(Node{-1, a->count + b->count, a, b});
    heap.push(&pool.back());
  }
  return heap.top();
}

}  // namespace

extern "C" {

// Encode n int64 values.  Outputs (all allocated with malloc; caller frees
// via mh_free):
//   *tree_out / *tree_size   : {u64 symbol, u64 freq} pairs, nonzero only
//   *hit_out  / *hit_bits    : MSB-first packed codeword stream; the
//                              buffer is hit_bits/8 rounded up to a word
//                              boundary plus 4 bytes (reference layout)
//   *miss_out / *miss_size   : int32 escaped values (symbol + kDict/2
//                              pre-shift applied), miss_size in bytes
// Returns 0 on success.
int mh_encode(const std::int64_t *data, std::size_t n,
              unsigned char **tree_out, std::size_t *tree_size,
              unsigned char **hit_out, std::size_t *hit_bits,
              unsigned char **miss_out, std::size_t *miss_size) {
  std::vector<std::uint64_t> freq(kDict, 0);
  std::vector<std::int64_t> shifted(n);
  for (std::size_t i = 0; i < n; ++i) {
    const std::int64_t v = data[i] + kDict / 2;
    shifted[i] = v;
    if (v > 0 && v < kDict) {
      ++freq[v];
    } else {
      ++freq[0];
    }
  }

  std::vector<Node> pool;
  Node *root = build_tree(freq.data(), pool);
  std::vector<Code> codes(kDict);
  if (root) assign_codes(root, 0, 0, codes);

  // hit stream: reference allocates n * sizeof(int) bytes zeroed
  const std::size_t hit_cap = n * sizeof(int);
  auto *hit = static_cast<unsigned char *>(std::malloc(hit_cap ? hit_cap : 4));
  std::memset(hit, 0, hit_cap ? hit_cap : 4);
  auto *words = reinterpret_cast<std::uint32_t *>(hit);

  std::size_t nmiss = 0;
  for (std::size_t i = 0; i < n; ++i) {
    if (!(shifted[i] > 0 && shifted[i] < kDict)) ++nmiss;
  }
  auto *miss = static_cast<std::int32_t *>(
      std::malloc(nmiss ? nmiss * sizeof(std::int32_t) : 4));

  std::size_t bitpos = 0;
  std::size_t mi = 0;
  for (std::size_t i = 0; i < n; ++i) {
    const std::int64_t v = shifted[i];
    Code c;
    if (v > 0 && v < kDict) {
      c = codes[v];
    } else {
      c = codes[0];
      miss[mi++] = static_cast<std::int32_t>(v);
    }
    const std::size_t used = bitpos % 32;
    if (32 - used < c.length) {
      const std::size_t rshift = c.length - (32 - used);
      words[bitpos / 32] |= c.bits >> rshift;
      words[bitpos / 32 + 1] |= c.bits << (32 - rshift);
      bitpos += c.length;
    } else if (c.length > 0) {
      words[bitpos / 32] |= c.bits << (32 - used - c.length);
      bitpos += c.length;
    }
  }

  // frequency table as {symbol, count} u64 pairs
  std::size_t nonzero = 0;
  for (int s = 0; s < kDict; ++s) nonzero += freq[s] != 0;
  auto *cft = static_cast<std::uint64_t *>(
      std::malloc(nonzero ? 2 * nonzero * sizeof(std::uint64_t) : 8));
  std::size_t off = 0;
  for (int s = 0; s < kDict; ++s) {
    if (freq[s]) {
      cft[2 * off] = static_cast<std::uint64_t>(s);
      cft[2 * off + 1] = freq[s];
      ++off;
    }
  }

  *tree_out = reinterpret_cast<unsigned char *>(cft);
  *tree_size = 2 * nonzero * sizeof(std::uint64_t);
  *hit_out = hit;
  *hit_bits = bitpos;
  *miss_out = reinterpret_cast<unsigned char *>(miss);
  *miss_size = nmiss * sizeof(std::int32_t);
  return 0;
}

// Decode n int64 values from the three sections.
int mh_decode(const unsigned char *tree, std::size_t tree_size,
              const unsigned char *hit, std::size_t hit_bits,
              const unsigned char *miss, std::size_t miss_size,
              std::int64_t *out, std::size_t n) {
  std::vector<std::uint64_t> freq(kDict, 0);
  const auto *cft = reinterpret_cast<const std::uint64_t *>(tree);
  const std::size_t pairs = tree_size / (2 * sizeof(std::uint64_t));
  for (std::size_t j = 0; j < pairs; ++j) {
    const std::uint64_t s = cft[2 * j];
    if (s < kDict) freq[s] = cft[2 * j + 1];
  }
  std::vector<Node> pool;
  Node *root = build_tree(freq.data(), pool);
  if (!root && n) return 1;

  const auto *words = reinterpret_cast<const std::uint32_t *>(hit);
  const auto *miss32 = reinterpret_cast<const std::int32_t *>(miss);
  std::size_t bitpos = 0;
  std::size_t mi = 0;
  const std::size_t nmiss = miss_size / sizeof(std::int32_t);
  for (std::size_t i = 0; i < n; ++i) {
    Node *node = root;
    while (node->left) {
      if (bitpos >= hit_bits + 64) return 2;  // corrupt stream guard
      const std::uint32_t w = words[bitpos / 32];
      const std::uint32_t bit = (w >> (31 - bitpos % 32)) & 1u;
      node = bit ? node->right : node->left;
      ++bitpos;
    }
    if (node->symbol != 0) {
      out[i] = static_cast<std::int64_t>(node->symbol) - kDict / 2;
    } else {
      if (mi >= nmiss) return 3;
      out[i] = static_cast<std::int64_t>(miss32[mi++]) - kDict / 2;
    }
  }
  return 0;
}

void mh_free(void *p) { std::free(p); }

}  // extern "C"
