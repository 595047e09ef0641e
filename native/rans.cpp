// Static order-0 byte-wise rANS entropy coder, 8-way interleaved.
//
// The framework's native entropy stage (SURVEY.md §7 step 8): the reference
// has exactly one statistical coder — a single raw-DEFLATE stream over the
// residual plane (reference: src/archive.rs:36-38).  This rANS coder is the
// high-throughput alternative for the native .thgi container: much faster
// than DEFLATE-9 on the host and smaller on high-entropy residual planes;
// the container picks whichever of {DEFLATE, rANS} is smaller per archive.
// The frequency table can also be supplied externally, enabling the
// multi-host "shared coder tables" path where a psum'd global histogram
// parameterizes every host's coder identically.
//
// Construction: classic byte-renormalizing rANS (after Duda's paper;
// implemented from scratch) with W = 8 independent states interleaved
// round-robin over symbol positions to break the serial div/renorm
// dependency chain — symbol i uses state i mod 8.  Encoding runs over
// symbols in reverse emitting bytes backward; decoding reads forward.
//   state x (u32), lower bound L = 1<<23, probability scale M = 1<<14.
//
// Stream layout produced by rans_compress:
//   u16 LE freq[256]   (normalized to sum 1<<14; 512 bytes)
//   u8  ways           (interleave width, currently always 8)
//   u32 LE stream length S
//   S bytes of rANS stream: 8 state flushes (4B big-endian each, state 0
//   first) followed by the interleaved renorm bytes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kScaleBits = 14;
constexpr uint32_t kM = 1u << kScaleBits;
constexpr uint32_t kL = 1u << 23;  // renormalization lower bound
constexpr uint32_t kWays = 8;

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
  // 4 sub-histograms to break the store-forwarding dependency.
  uint64_t h[4][256];
  std::memset(h, 0, sizeof(h));
  uint64_t i = 0;
  for (; i + 4 <= n; i += 4) {
    h[0][in[i]]++;
    h[1][in[i + 1]]++;
    h[2][in[i + 2]]++;
    h[3][in[i + 3]]++;
  }
  for (; i < n; ++i) h[0][in[i]]++;
  for (int s = 0; s < 256; ++s)
    counts[s] = h[0][s] + h[1][s] + h[2][s] + h[3][s];
}

uint64_t rans_worst_size(uint64_t n) {
  // table + ways + length + 8 state flushes + worst-case expansion pad.
  return 512 + 1 + 4 + 4 * kWays + 16 + n + n / 2;
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

  const uint64_t header = 512 + 1 + 4;
  if (out_cap < header + 4 * kWays) return 0;

  // Per-symbol encoder tables with exact reciprocal multipliers, so the
  // hot loop is division-free (q = x/f via a 32x32->64 multiply).
  struct EncSym {
    uint32_t rcp_freq;
    uint32_t bias;
    uint32_t cmpl_freq;
    uint32_t x_max;
    uint8_t rcp_shift;
  };
  EncSym syms[256];
  for (int s = 0; s < 256; ++s) {
    const uint32_t f = freq[s];
    EncSym& e = syms[s];
    e.x_max = ((kL >> kScaleBits) << 8) * f;
    e.cmpl_freq = kM - f;
    if (f < 2) {
      // f == 1: q = x-1 via multiply by 2^32-1; bias absorbs the off-by-one.
      e.rcp_freq = ~0u;
      e.rcp_shift = 0;
      e.bias = cum[s] + kM - 1;
    } else {
      uint32_t shift = 0;
      while (f > (1u << shift)) shift++;
      e.rcp_freq =
          (uint32_t)(((((uint64_t)1) << (shift + 31)) + f - 1) / f);
      e.rcp_shift = (uint8_t)(shift - 1);
      e.bias = cum[s];
    }
  }

  // Encode backward into a scratch tail (symbol i uses state i mod kWays).
  // The 8 states live in distinct locals inside an unrolled loop so their
  // multiply chains overlap; only the output pointer serializes.
  // The scratch is thread-local and grown geometrically: a fresh 10s-of-MB
  // allocation per call would be page-fault-bound (~100 MB/s on this VM).
  static thread_local std::vector<uint8_t> scratch;
  if (scratch.size() < n + 4 * kWays + 16) scratch.resize(n + 4 * kWays + 16);
  uint8_t* end = scratch.data() + scratch.size();
  uint8_t* ptr = end;
  uint32_t x[kWays];
  for (uint32_t w = 0; w < kWays; ++w) x[w] = kL;

  auto put = [&](uint32_t& xs, uint8_t s) {
    const EncSym& e = syms[s];
    while (xs >= e.x_max) {
      *--ptr = (uint8_t)(xs & 0xFF);
      xs >>= 8;
    }
    const uint32_t q =
        (uint32_t)(((uint64_t)xs * e.rcp_freq) >> 32) >> e.rcp_shift;
    xs = xs + e.bias + q * e.cmpl_freq;
  };

  uint64_t i = n;
  while (i % kWays) {
    --i;
    put(x[i % kWays], in[i]);
  }
  while (i) {
    uint32_t x7 = x[7], x6 = x[6], x5 = x[5], x4 = x[4];
    uint32_t x3 = x[3], x2 = x[2], x1 = x[1], x0 = x[0];
    do {
      const uint8_t* p = in + i - kWays;
      put(x7, p[7]);
      put(x6, p[6]);
      put(x5, p[5]);
      put(x4, p[4]);
      put(x3, p[3]);
      put(x2, p[2]);
      put(x1, p[1]);
      put(x0, p[0]);
      i -= kWays;
    } while (i);
    x[7] = x7; x[6] = x6; x[5] = x5; x[4] = x4;
    x[3] = x3; x[2] = x2; x[1] = x1; x[0] = x0;
  }
  // Flush the final states big-endian, state 0 at the lowest address, so
  // the decoder's forward read reconstructs them in order.
  for (int w = kWays - 1; w >= 0; --w) {
    ptr -= 4;
    ptr[0] = (uint8_t)(x[w] >> 24);
    ptr[1] = (uint8_t)(x[w] >> 16);
    ptr[2] = (uint8_t)(x[w] >> 8);
    ptr[3] = (uint8_t)x[w];
  }

  const uint64_t stream = (uint64_t)(end - ptr);
  if (out_cap < header + stream) return 0;
  for (int i = 0; i < 256; ++i) {
    out[2 * i] = (uint8_t)(freq[i] & 0xFF);
    out[2 * i + 1] = (uint8_t)(freq[i] >> 8);
  }
  out[512] = (uint8_t)kWays;
  out[513] = (uint8_t)(stream & 0xFF);
  out[514] = (uint8_t)((stream >> 8) & 0xFF);
  out[515] = (uint8_t)((stream >> 16) & 0xFF);
  out[516] = (uint8_t)((stream >> 24) & 0xFF);
  std::memcpy(out + header, ptr, stream);
  return header + stream;
}

// Decompress exactly n bytes into out.  Returns 0 on success, nonzero on
// malformed input.
int rans_decompress(const uint8_t* in, uint64_t in_size, uint8_t* out,
                    uint64_t n) {
  const uint64_t header = 512 + 1 + 4;
  if (in_size < header) return 1;
  uint16_t freq[256];
  uint32_t cum[257];
  cum[0] = 0;
  for (int i = 0; i < 256; ++i) {
    freq[i] = (uint16_t)(in[2 * i] | (in[2 * i + 1] << 8));
    cum[i + 1] = cum[i] + freq[i];
  }
  if (cum[256] != kM) return 2;
  if (in[512] != kWays) return 6;
  const uint64_t stream =
      in[513] | (in[514] << 8) | (in[515] << 16) | ((uint64_t)in[516] << 24);
  if (header + stream > in_size) return 3;

  // Slot -> (symbol, freq, cum) lookup (16K entries, 4B each).
  struct Entry {
    uint8_t sym;
    uint8_t pad;
    uint16_t freq;
  };
  static thread_local std::vector<Entry> tab(kM);
  static thread_local std::vector<uint16_t> cumtab(kM);
  for (int s = 0; s < 256; ++s)
    for (uint32_t j = cum[s]; j < cum[s + 1]; ++j) {
      tab[j].sym = (uint8_t)s;
      tab[j].freq = freq[s];
      cumtab[j] = (uint16_t)cum[s];
    }

  const uint8_t* ptr = in + header;
  const uint8_t* pend = ptr + stream;
  if (ptr + 4 * kWays > pend) return 4;
  uint32_t x[kWays];
  for (uint32_t w = 0; w < kWays; ++w) {
    x[w] = ((uint32_t)ptr[0] << 24) | ((uint32_t)ptr[1] << 16) |
           ((uint32_t)ptr[2] << 8) | ptr[3];
    ptr += 4;
  }
  auto get = [&](uint32_t& xs, uint8_t* o) -> bool {
    const uint32_t slot = xs & (kM - 1);
    const Entry e = tab[slot];
    *o = e.sym;
    xs = e.freq * (xs >> kScaleBits) + slot - cumtab[slot];
    while (xs < kL) {
      if (ptr >= pend) return false;
      xs = (xs << 8) | *ptr++;
    }
    return true;
  };

  uint64_t i = 0;
  const uint64_t main_n = n - (n % kWays);
  if (main_n) {
    uint32_t x0 = x[0], x1 = x[1], x2 = x[2], x3 = x[3];
    uint32_t x4 = x[4], x5 = x[5], x6 = x[6], x7 = x[7];
    for (; i < main_n; i += kWays) {
      uint8_t* o = out + i;
      if (!(get(x0, o) && get(x1, o + 1) && get(x2, o + 2) &&
            get(x3, o + 3) && get(x4, o + 4) && get(x5, o + 5) &&
            get(x6, o + 6) && get(x7, o + 7)))
        return 5;
    }
    x[0] = x0; x[1] = x1; x[2] = x2; x[3] = x3;
    x[4] = x4; x[5] = x5; x[6] = x6; x[7] = x7;
  }
  for (; i < n; ++i)
    if (!get(x[i % kWays], out + i)) return 5;
  return 0;
}

}  // extern "C"
