// Native decoder for the lane-parallel TPU rANS payload (ops/tpurans.py).
//
// The TPU encodes (rustyhgi_tpu/ops/tpurans.py: lockstep rANS lanes in one
// lax.scan, M = 2^14, u32 states, u16 word renorm); the host decodes.  The
// Python/NumPy decoder is the portable mirror; this one is the fast path —
// a flat scalar sweep the compiler vectorizes where profitable.  Both must
// produce identical bytes AND identical accept/reject decisions on
// malformed input (tests/test_tpurans.py).
//
// Payload layout (little-endian):
//   u32 n | u32 L | u16 freq[256] | u16 counts[L] | u32 state[L] |
//   per lane, counts[l] u16 words in decode order, lane-major.
//
// Return codes: 0 ok; negative = malformed (distinct per check so the
// Python binding can raise a precise ValueError).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kScaleBits = 14;
constexpr uint32_t kM = 1u << kScaleBits;
constexpr uint32_t kStateL = 1u << 16;
constexpr uint32_t kMinLanes = 128, kMaxLanes = 8192;

inline uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
inline uint16_t rd16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

}  // namespace

extern "C" int rans_tpu_decode(const uint8_t* payload, uint64_t payload_len,
                               uint8_t* out, uint64_t out_len) {
  if (payload_len < 8) return -1;  // truncated header
  const uint64_t n = rd32(payload);
  const uint64_t L = rd32(payload + 4);
  if (n != out_len) return -2;  // size does not match declared
  if (n == 0) return L == 0 ? 0 : -3;
  if (L < kMinLanes || L > kMaxLanes || (L & (L - 1))) return -3;  // lanes
  const uint64_t T = (n + L - 1) / L;
  const uint64_t hdr = 8 + 512 + 2 * L + 4 * L;
  if (payload_len < hdr) return -1;

  const uint8_t* pf = payload + 8;
  uint32_t freq[256];
  uint64_t sum = 0;
  for (int s = 0; s < 256; ++s) {
    freq[s] = rd16(pf + 2 * s);
    sum += freq[s];
  }
  if (sum != kM) return -4;  // invalid frequency table
  uint32_t cum[257];
  cum[0] = 0;
  for (int s = 0; s < 256; ++s) cum[s + 1] = cum[s] + freq[s];
  std::vector<uint8_t> slot2sym(kM);
  for (int s = 0; s < 256; ++s)
    std::memset(slot2sym.data() + cum[s], s, freq[s]);

  const uint8_t* pc = payload + 8 + 512;
  const uint8_t* ps = pc + 2 * L;
  std::vector<uint32_t> x(L);
  std::vector<uint64_t> ptr(L), end(L);
  uint64_t total = 0;
  for (uint64_t l = 0; l < L; ++l) {
    const uint64_t c = rd16(pc + 2 * l);
    if (c > T) return -5;  // lane count exceeds symbol rows
    ptr[l] = total;
    total += c;
    end[l] = total;
    x[l] = rd32(ps + 4 * l);
  }
  if (payload_len < hdr + 2 * total) return -1;  // truncated body
  const uint8_t* body = payload + hdr;

  for (uint64_t t = 0; t < T; ++t) {
    uint8_t* row = out + t * L;
    const uint64_t rows = (t + 1) * L <= n ? L : 0;  // full rows direct
    for (uint64_t l = 0; l < L; ++l) {
      uint32_t xs = x[l];
      const uint32_t slot = xs & (kM - 1);
      const uint8_t s = slot2sym[slot];
      if (rows || t * L + l < n) row[l] = s;
      xs = freq[s] * (xs >> kScaleBits) + slot - cum[s];
      if (xs < kStateL) {
        if (ptr[l] >= end[l]) return -6;  // stream underrun
        xs = (xs << 16) | rd16(body + 2 * ptr[l]);
        ++ptr[l];
      }
      x[l] = xs;
    }
  }
  for (uint64_t l = 0; l < L; ++l) {
    if (ptr[l] != end[l]) return -7;  // trailing words
    if (x[l] != kStateL) return -8;   // state mismatch (corrupt stream)
  }
  return 0;
}
