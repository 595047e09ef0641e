// Static order-0 byte-wise rANS entropy coder.
//
// The framework's native entropy stage (SURVEY.md §7 step 8): the reference
// has exactly one statistical coder — a single raw-DEFLATE stream over the
// residual plane (reference: src/archive.rs:36-38).  This rANS coder is the
// high-throughput alternative for the native .thgi container: ~10-30x
// faster than DEFLATE-9 on the host, and smaller on high-entropy residual
// planes; the container picks whichever of {DEFLATE, rANS} is smaller per
// archive.  The frequency table can also be supplied externally, enabling
// the multi-host "shared coder tables" path where a psum'd global histogram
// parameterizes every host's coder identically.
//
// Classic single-state byte-renormalizing rANS:
//   state x (u32), lower bound L = 1<<23, probability scale M = 1<<14.
//   Encoding runs over symbols in reverse and emits bytes backward;
//   decoding reads forward.  (This is the standard public-domain rANS
//   construction after Duda's paper; implemented from scratch here.)
//
// Stream layout produced by rans_compress:
//   u16 LE freq[256]   (normalized to sum 1<<14; 512 bytes)
//   u32 LE stream length S
//   S bytes of rANS stream (decoder reads them forward)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kScaleBits = 14;
constexpr uint32_t kM = 1u << kScaleBits;
constexpr uint32_t kL = 1u << 23;  // renormalization lower bound

// Normalize raw counts to sum exactly kM, every present symbol >= 1.
void normalize_freqs(const uint64_t* counts, uint64_t total, uint16_t* freq) {
  if (total == 0) {  // degenerate: empty input, pick uniform
    for (int i = 0; i < 256; ++i) freq[i] = kM / 256;
    freq[0] += kM % 256;
    return;
  }
  uint32_t assigned = 0;
  int max_sym = 0;
  uint64_t max_count = 0;
  for (int i = 0; i < 256; ++i) {
    if (counts[i] == 0) {
      freq[i] = 0;
      continue;
    }
    uint64_t f = ((__uint128_t)counts[i] * kM) / total;
    if (f == 0) f = 1;
    freq[i] = (uint16_t)f;
    assigned += (uint32_t)f;
    if (counts[i] > max_count) {
      max_count = counts[i];
      max_sym = i;
    }
  }
  // Fix the rounding drift on the most frequent symbol (always large
  // enough to absorb it without going to 0).
  int32_t drift = (int32_t)kM - (int32_t)assigned;
  int32_t nf = (int32_t)freq[max_sym] + drift;
  if (nf < 1) {  // pathological: steal from any symbol with slack
    freq[max_sym] = 1;
    drift = nf - 1;
    for (int i = 0; i < 256 && drift != 0; ++i) {
      if (i == max_sym || freq[i] == 0) continue;
      int32_t take = (int32_t)freq[i] - 1;
      if (take <= 0) continue;
      int32_t d = drift < 0 ? (take < -drift ? take : -drift) : 0;
      freq[i] -= (uint16_t)d;
      drift += d;
    }
  } else {
    freq[max_sym] = (uint16_t)nf;
  }
}

}  // namespace

extern "C" {

// Compute a raw byte histogram (u64[256]) — exposed so Python can build
// shared tables from device-side psum'd histograms instead.
void rans_histogram(const uint8_t* in, uint64_t n, uint64_t* counts) {
  std::memset(counts, 0, 256 * sizeof(uint64_t));
  for (uint64_t i = 0; i < n; ++i) counts[in[i]]++;
}

// Compress n bytes.  out must have capacity >= rans_worst_size(n).
// freq_in: optional externally-shared u16[256] table summing to 1<<14
// (pass null to derive from the input).  Returns compressed size, or 0 on
// insufficient capacity.
uint64_t rans_compress(const uint8_t* in, uint64_t n, uint8_t* out,
                       uint64_t out_cap, const uint16_t* freq_in) {
  uint16_t freq[256];
  if (freq_in) {
    std::memcpy(freq, freq_in, sizeof(freq));
  } else {
    uint64_t counts[256];
    rans_histogram(in, n, counts);
    normalize_freqs(counts, n, freq);
  }
  uint32_t cum[257];
  cum[0] = 0;
  for (int i = 0; i < 256; ++i) cum[i + 1] = cum[i] + freq[i];

  const uint64_t header = 512 + 4;
  if (out_cap < header) return 0;

  // Encode backward into a scratch tail.
  std::vector<uint8_t> scratch(n + 16);
  uint8_t* end = scratch.data() + scratch.size();
  uint8_t* ptr = end;
  uint32_t x = kL;
  for (uint64_t i = n; i-- > 0;) {
    const uint8_t s = in[i];
    const uint32_t f = freq[s];
    // f >= 1 for every symbol present in `in` when the table was derived
    // from it; with an external table a zero-freq symbol is unencodable.
    const uint32_t x_max = ((kL >> kScaleBits) << 8) * f;
    while (x >= x_max) {
      *--ptr = (uint8_t)(x & 0xFF);
      x >>= 8;
    }
    x = ((x / f) << kScaleBits) + (x % f) + cum[s];
  }
  // Flush the final state big-endian so the decoder's forward read
  // (ptr[0]<<24 | ... | ptr[3]) reconstructs it exactly.
  ptr -= 4;
  ptr[0] = (uint8_t)(x >> 24);
  ptr[1] = (uint8_t)(x >> 16);
  ptr[2] = (uint8_t)(x >> 8);
  ptr[3] = (uint8_t)x;

  const uint64_t stream = (uint64_t)(end - ptr);
  if (out_cap < header + stream) return 0;
  for (int i = 0; i < 256; ++i) {
    out[2 * i] = (uint8_t)(freq[i] & 0xFF);
    out[2 * i + 1] = (uint8_t)(freq[i] >> 8);
  }
  out[512] = (uint8_t)(stream & 0xFF);
  out[513] = (uint8_t)((stream >> 8) & 0xFF);
  out[514] = (uint8_t)((stream >> 16) & 0xFF);
  out[515] = (uint8_t)((stream >> 24) & 0xFF);
  std::memcpy(out + header, ptr, stream);
  return header + stream;
}

uint64_t rans_worst_size(uint64_t n) {
  // 512B table + 4B length + state flush + worst-case ~1.3x expansion pad.
  return 512 + 4 + 16 + n + n / 2;
}

// Decompress exactly n bytes into out.  Returns 0 on success, nonzero on
// malformed input.
int rans_decompress(const uint8_t* in, uint64_t in_size, uint8_t* out,
                    uint64_t n) {
  if (in_size < 516) return 1;
  uint16_t freq[256];
  uint32_t cum[257];
  cum[0] = 0;
  for (int i = 0; i < 256; ++i) {
    freq[i] = (uint16_t)(in[2 * i] | (in[2 * i + 1] << 8));
    cum[i + 1] = cum[i] + freq[i];
  }
  if (cum[256] != kM) return 2;
  const uint64_t stream =
      in[512] | (in[513] << 8) | (in[514] << 16) | ((uint64_t)in[515] << 24);
  if (516 + stream > in_size) return 3;

  // Slot -> symbol lookup (16K entries).
  std::vector<uint8_t> slot2sym(kM);
  for (int s = 0; s < 256; ++s)
    for (uint32_t j = cum[s]; j < cum[s + 1]; ++j) slot2sym[j] = (uint8_t)s;

  const uint8_t* ptr = in + 516;
  const uint8_t* pend = ptr + stream;
  if (ptr + 4 > pend) return 4;
  uint32_t x = ((uint32_t)ptr[0] << 24) | ((uint32_t)ptr[1] << 16) |
               ((uint32_t)ptr[2] << 8) | ptr[3];
  ptr += 4;
  for (uint64_t i = 0; i < n; ++i) {
    const uint32_t slot = x & (kM - 1);
    const uint8_t s = slot2sym[slot];
    out[i] = s;
    x = freq[s] * (x >> kScaleBits) + slot - cum[s];
    while (x < kL) {
      if (ptr >= pend) {
        if (i + 1 == n && x >= 1) break;  // final symbol may leave x low
        return 5;
      }
      x = (x << 8) | *ptr++;
    }
  }
  return 0;
}

}  // extern "C"
