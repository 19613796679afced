// LZ4 block-format codec (encode + decode), self-contained.
//
// Role: the reference's LZ4 second lossless stage
// (include/mgard-x/Lossless/LZ4.hpp:7-9) wraps nvcomp's batched LZ4 on
// GPU; this file provides the same stage for the TPU stack as a host
// codec producing standard LZ4 *block format* output
// (https://github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md), so
// streams are decodable by any stock LZ4 library.  The implementation
// is written fresh from the format description: a greedy matcher over a
// 4-byte hash table, token/extended-length sequence emission, and the
// end-of-block rules (last 5 bytes are literals; no match starts within
// the last 12 bytes).
//
// Exposed C ABI (ctypes-bound by mgard_tpu/io/lz4_native.py):
//   mlz4_bound(n)                 worst-case compressed size
//   mlz4_encode(src,n,dst,cap)    -> compressed length, or -1 if cap
//   mlz4_decode(src,n,dst,cap)    -> decompressed length, or -1 on
//                                    malformed input / overflow
#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr int MINMATCH = 4;
constexpr int MFLIMIT = 12;   // no match may start in the last 12 bytes
constexpr int LASTLITERALS = 5;
constexpr int HASH_LOG = 16;

inline uint32_t read32(const uint8_t *p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint32_t hash4(uint32_t v) {
  return (v * 2654435761u) >> (32 - HASH_LOG);
}

} // namespace

extern "C" {

size_t mlz4_bound(size_t n) { return n + n / 255 + 16; }

long mlz4_encode(const uint8_t *src, size_t n, uint8_t *dst, size_t cap) {
  const uint8_t *ip = src;
  const uint8_t *const iend = src + n;
  const uint8_t *const mflimit = (n >= MFLIMIT) ? iend - MFLIMIT : src;
  const uint8_t *anchor = src;
  uint8_t *op = dst;
  uint8_t *const oend = dst + cap;

  uint32_t table[1 << HASH_LOG];
  std::memset(table, 0, sizeof(table));

  auto emit = [&](const uint8_t *lit, size_t lit_len, size_t match_len,
                  size_t offset) -> bool {
    // token + extended literal length
    size_t need = 1 + lit_len / 255 + 1 + lit_len + 2 + match_len / 255 + 1;
    if (op + need > oend)
      return false;
    uint8_t *token = op++;
    if (lit_len >= 15) {
      *token = 15 << 4;
      size_t rest = lit_len - 15;
      while (rest >= 255) {
        *op++ = 255;
        rest -= 255;
      }
      *op++ = static_cast<uint8_t>(rest);
    } else {
      *token = static_cast<uint8_t>(lit_len << 4);
    }
    std::memcpy(op, lit, lit_len);
    op += lit_len;
    if (match_len == 0)
      return true; // final literals-only sequence
    op[0] = static_cast<uint8_t>(offset & 0xFF);
    op[1] = static_cast<uint8_t>(offset >> 8);
    op += 2;
    size_t mlcode = match_len - MINMATCH;
    if (mlcode >= 15) {
      *token |= 15;
      size_t rest = mlcode - 15;
      while (rest >= 255) {
        *op++ = 255;
        rest -= 255;
      }
      *op++ = static_cast<uint8_t>(rest);
    } else {
      *token |= static_cast<uint8_t>(mlcode);
    }
    return true;
  };

  if (n >= MFLIMIT) {
    while (ip < mflimit) {
      uint32_t h = hash4(read32(ip));
      size_t cand = table[h];
      table[h] = static_cast<uint32_t>(ip - src);
      const uint8_t *match = src + cand;
      if (match < ip && ip - match <= 0xFFFF &&
          read32(match) == read32(ip)) {
        // extend the match forward (stop LASTLITERALS short of the end)
        const uint8_t *const matchlimit = iend - LASTLITERALS;
        size_t mlen = MINMATCH;
        while (ip + mlen < matchlimit && match[mlen] == ip[mlen])
          ++mlen;
        if (!emit(anchor, static_cast<size_t>(ip - anchor), mlen,
                  static_cast<size_t>(ip - match)))
          return -1;
        // seed the table inside the match so nearby repeats are found
        const uint8_t *p = ip + 1;
        const uint8_t *stop = ip + mlen < mflimit ? ip + mlen : mflimit;
        for (; p < stop; p += 3)
          table[hash4(read32(p))] = static_cast<uint32_t>(p - src);
        ip += mlen;
        anchor = ip;
      } else {
        ++ip;
      }
    }
  }
  // trailing literals
  if (!emit(anchor, static_cast<size_t>(iend - anchor), 0, 0))
    return -1;
  return static_cast<long>(op - dst);
}

long mlz4_decode(const uint8_t *src, size_t n, uint8_t *dst, size_t cap) {
  const uint8_t *ip = src;
  const uint8_t *const iend = src + n;
  uint8_t *op = dst;
  uint8_t *const oend = dst + cap;

  while (ip < iend) {
    uint8_t token = *ip++;
    size_t lit_len = token >> 4;
    if (lit_len == 15) {
      uint8_t b;
      do {
        if (ip >= iend)
          return -1;
        b = *ip++;
        lit_len += b;
      } while (b == 255);
    }
    if (ip + lit_len > iend || op + lit_len > oend)
      return -1;
    std::memcpy(op, ip, lit_len);
    ip += lit_len;
    op += lit_len;
    if (ip >= iend)
      break; // final sequence carries literals only
    if (ip + 2 > iend)
      return -1;
    size_t offset = ip[0] | (static_cast<size_t>(ip[1]) << 8);
    ip += 2;
    if (offset == 0 || offset > static_cast<size_t>(op - dst))
      return -1;
    size_t mlen = (token & 15);
    if (mlen == 15) {
      uint8_t b;
      do {
        if (ip >= iend)
          return -1;
        b = *ip++;
        mlen += b;
      } while (b == 255);
    }
    mlen += MINMATCH;
    if (op + mlen > oend)
      return -1;
    const uint8_t *mp = op - offset;
    for (size_t i = 0; i < mlen; ++i) // byte copy: offsets may overlap
      op[i] = mp[i];
    op += mlen;
  }
  return static_cast<long>(op - dst);
}

} // extern "C"
