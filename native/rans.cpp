// Static order-0 rANS entropy coder: independent word-renormalized
// streams.
//
// The framework's native entropy stage (SURVEY.md §7 step 8): the reference
// has exactly one statistical coder — a single raw-DEFLATE stream over the
// residual plane (reference: src/archive.rs:36-38).  This rANS coder is the
// high-throughput alternative for the native .thgi container; the container
// picks whichever of {DEFLATE, rANS} is smaller per archive.  The frequency
// table can also be supplied externally, enabling the multi-host "shared
// coder tables" path where a psum'd global histogram parameterizes every
// host's coder identically.
//
// Construction (after Duda's rANS; implemented from scratch), shaped by two
// measured bottlenecks on the way here:
//   * byte renormalization lost ~8 cycles/symbol to a ~50%-taken branch ->
//     word renorm (u16 granularity, lower bound L = 1<<16) guarantees AT
//     MOST ONE emission per symbol, making emit/refill branchless;
//   * a single interleaved output stream serializes all states through one
//     pointer whose advance depends on each symbol's table load -> each of
//     each state owns an INDEPENDENT stream, so the dependency chains
//     (slot -> 64KB-table load -> multiply -> refill) overlap fully.
// W = 4 states balances chain overlap against x86-64 register pressure
// (8 states + 8 stream pointers spill; 4 + 4 fit).  Symbol i belongs to
// state i mod 4.  Encoding runs over symbols in reverse, emitting backward
// into per-state buffers; decoding reads each stream forward.
// State x (u32) in [1<<16, 1<<32), scale M = 1<<14.
//
// Stream layout produced by rans_compress:
//   u16 LE freq[256]    (normalized to sum 1<<14; 512 bytes)
//   u8  variant         (0xC0 flag = per-state word streams | ways = 4)
//   u32 LE total stream length S
//   u32 LE per-state stream lengths [4]
//   4 concatenated per-state streams, each: 4-byte big-endian final state
//   flush followed by that state's renorm words (u16 LE), read forward.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kScaleBits = 14;
constexpr uint32_t kM = 1u << kScaleBits;
constexpr uint32_t kWordL = 1u << 16;  // word-renorm lower bound
constexpr uint32_t kWays = 4;
constexpr uint8_t kVariant = 0xC0 | kWays;  // per-state word streams

// Normalize raw counts to sum exactly kM, every present symbol >= 1 and
// every symbol <= kM-1 (the word-renorm threshold f << 18 must fit u32).
void normalize_freqs(const uint64_t* counts, uint64_t total, uint16_t* freq) {
  if (total == 0) {  // degenerate: empty input, pick uniform
    for (int i = 0; i < 256; ++i) freq[i] = kM / 256;
    freq[0] += kM % 256;
    return;
  }
  int32_t assigned = 0;
  int max_sym = 0;
  uint64_t max_count = 0;
  for (int i = 0; i < 256; ++i) {
    if (counts[i] == 0) {
      freq[i] = 0;
      continue;
    }
    uint64_t f = ((__uint128_t)counts[i] * kM) / total;
    if (f == 0) f = 1;
    if (f > kM - 1) f = kM - 1;
    freq[i] = (uint16_t)f;
    assigned += (int32_t)f;
    if (counts[i] > max_count) {
      max_count = counts[i];
      max_sym = i;
    }
  }
  int32_t drift = (int32_t)kM - assigned;
  int32_t nf = (int32_t)freq[max_sym] + drift;
  if (nf >= 1 && nf <= (int32_t)kM - 1) {
    freq[max_sym] = (uint16_t)nf;
    return;
  }
  // Pathological drift: spread over symbols with slack.  A single-symbol
  // input lands here (cap left drift = +1): grant the spare slot to a
  // symbol the encoder can never emit.
  for (int i = 0; i < 256 && drift != 0; ++i) {
    int32_t f = (int32_t)freq[i];
    int32_t room_up = (int32_t)kM - 1 - f;
    int32_t room_dn = f > 0 ? f - 1 : 0;
    int32_t d;
    if (drift > 0) {
      d = drift < room_up ? drift : room_up;
      if (f == 0 && drift > 0) d = drift < (int32_t)kM - 1 ? drift : (int32_t)kM - 1;
    } else {
      d = drift > -room_dn ? drift : -room_dn;
    }
    freq[i] = (uint16_t)(f + d);
    drift -= d;
  }
}

struct EncSym {
  uint32_t rcp_freq;
  uint32_t bias;
  uint32_t cmpl_freq;
  uint32_t x_max;
  uint8_t rcp_shift;
};

void build_enc_table(const uint16_t* freq, const uint32_t* cum, EncSym* syms) {
  for (int s = 0; s < 256; ++s) {
    const uint32_t f = freq[s];
    EncSym& e = syms[s];
    // f <= kM - 1 (normalize caps), so f << 18 fits in uint32.
    e.x_max = ((kWordL >> kScaleBits) << 16) * f;
    e.cmpl_freq = kM - f;
    if (f < 2) {
      // f == 1: q = x-1 via multiply by 2^32-1; bias absorbs the
      // off-by-one: (x-1)*(M-1) + x + start + M-1 == x*M + start.
      e.rcp_freq = ~0u;
      e.rcp_shift = 0;
      e.bias = cum[s] + kM - 1;
    } else {
      uint32_t shift = 0;
      while (f > (1u << shift)) shift++;
      e.rcp_freq = (uint32_t)(((((uint64_t)1) << (shift + 31)) + f - 1) / f);
      e.rcp_shift = (uint8_t)(shift - 1);
      e.bias = cum[s];
    }
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
  // header + per-state lengths + state flushes + <=2 bytes/symbol worst.
  return 512 + 1 + 4 + 4 * kWays + 4 * kWays + 16 + 2 * n;
}

// Compress n bytes.  out must have capacity >= rans_worst_size(n).
// freq_in: optional externally-shared u16[256] table summing to 1<<14
// (pass null to derive from the input).  Returns compressed size, or 0 on
// insufficient capacity.
uint64_t rans_compress(const uint8_t* __restrict in, uint64_t n,
                       uint8_t* __restrict out, uint64_t out_cap,
                       const uint16_t* freq_in) {
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
  EncSym syms[256];
  build_enc_table(freq, cum, syms);

  const uint64_t header = 512 + 1 + 4 + 4 * kWays;
  if (out_cap < header + 4 * kWays) return 0;

  // Per-state scratch tails.  thread_local and grown geometrically: fresh
  // multi-MB allocations per call are page-fault-bound (~100 MB/s here).
  const uint64_t per_state_cap = 2 * (n / kWays + 1) + 16;
  static thread_local std::vector<uint8_t> scratch;
  if (scratch.size() < kWays * per_state_cap)
    scratch.resize(kWays * per_state_cap);
  uint8_t* ends[kWays];
  uint8_t* ptrs[kWays];
  for (uint32_t w = 0; w < kWays; ++w) {
    ends[w] = scratch.data() + (w + 1) * per_state_cap;
    ptrs[w] = ends[w];
  }
  uint32_t x[kWays];
  for (uint32_t w = 0; w < kWays; ++w) x[w] = kWordL;

  // Branchless word renorm into the state's own stream: the u16 is stored
  // unconditionally (buffers have headroom), the pointer only moves when
  // renormalization actually happened.
  auto put = [&syms](uint32_t& xs, uint8_t*& p, uint8_t s) {
    const EncSym e = syms[s];
    const uint32_t ren = xs >= e.x_max;
    p[-2] = (uint8_t)xs;
    p[-1] = (uint8_t)(xs >> 8);
    p -= 2 * ren;
    xs = ren ? xs >> 16 : xs;
    const uint32_t q =
        (uint32_t)(((uint64_t)xs * e.rcp_freq) >> 32) >> e.rcp_shift;
    xs = xs + e.bias + q * e.cmpl_freq;
  };

  uint64_t i = n;
  while (i % kWays) {
    --i;
    put(x[i % kWays], ptrs[i % kWays], in[i]);
  }
  if (i) {
    uint32_t x0 = x[0], x1 = x[1], x2 = x[2], x3 = x[3];
    uint8_t *p0 = ptrs[0], *p1 = ptrs[1], *p2 = ptrs[2], *p3 = ptrs[3];
    do {
      const uint8_t* __restrict s = in + i - kWays;
      put(x3, p3, s[3]);
      put(x2, p2, s[2]);
      put(x1, p1, s[1]);
      put(x0, p0, s[0]);
      i -= kWays;
    } while (i);
    x[0] = x0; x[1] = x1; x[2] = x2; x[3] = x3;
    ptrs[0] = p0; ptrs[1] = p1; ptrs[2] = p2; ptrs[3] = p3;
  }

  // Assemble: header, per-state lengths, then each stream prefixed by its
  // 4-byte big-endian state flush.
  uint64_t total = 0;
  uint32_t lens[kWays];
  for (uint32_t w = 0; w < kWays; ++w) {
    lens[w] = (uint32_t)(ends[w] - ptrs[w]) + 4;
    total += lens[w];
  }
  if (out_cap < header + total) return 0;
  for (int s = 0; s < 256; ++s) {
    out[2 * s] = (uint8_t)(freq[s] & 0xFF);
    out[2 * s + 1] = (uint8_t)(freq[s] >> 8);
  }
  out[512] = kVariant;
  out[513] = (uint8_t)(total & 0xFF);
  out[514] = (uint8_t)((total >> 8) & 0xFF);
  out[515] = (uint8_t)((total >> 16) & 0xFF);
  out[516] = (uint8_t)((total >> 24) & 0xFF);
  uint8_t* o = out + 517;
  for (uint32_t w = 0; w < kWays; ++w) {
    o[0] = (uint8_t)(lens[w] & 0xFF);
    o[1] = (uint8_t)((lens[w] >> 8) & 0xFF);
    o[2] = (uint8_t)((lens[w] >> 16) & 0xFF);
    o[3] = (uint8_t)((lens[w] >> 24) & 0xFF);
    o += 4;
  }
  for (uint32_t w = 0; w < kWays; ++w) {
    o[0] = (uint8_t)(x[w] >> 24);
    o[1] = (uint8_t)(x[w] >> 16);
    o[2] = (uint8_t)(x[w] >> 8);
    o[3] = (uint8_t)x[w];
    o += 4;
    const uint64_t len = (uint64_t)(ends[w] - ptrs[w]);
    std::memcpy(o, ptrs[w], len);
    o += len;
  }
  return header + total;
}

// Decompress exactly n bytes into out.  Returns 0 on success, nonzero on
// malformed input.
int rans_decompress(const uint8_t* __restrict in, uint64_t in_size,
                    uint8_t* __restrict out, uint64_t n) {
  const uint64_t header = 512 + 1 + 4 + 4 * kWays;
  if (in_size < header) return 1;
  uint16_t freq[256];
  uint32_t cum[257];
  cum[0] = 0;
  for (int i = 0; i < 256; ++i) {
    freq[i] = (uint16_t)(in[2 * i] | (in[2 * i + 1] << 8));
    cum[i + 1] = cum[i] + freq[i];
  }
  if (cum[256] != kM) return 2;
  if (in[512] != kVariant) return 6;
  const uint64_t total =
      in[513] | (in[514] << 8) | (in[515] << 16) | ((uint64_t)in[516] << 24);
  if (header + total > in_size) return 3;
  uint64_t lens[kWays];
  uint64_t lens_sum = 0;
  for (uint32_t w = 0; w < kWays; ++w) {
    const uint8_t* q = in + 517 + 4 * w;
    lens[w] = q[0] | (q[1] << 8) | (q[2] << 16) | ((uint64_t)q[3] << 24);
    if (lens[w] < 4) return 4;
    lens_sum += lens[w];
  }
  if (lens_sum != total) return 4;

  // Slot -> (symbol, freq) and slot -> cum lookups (16K entries).
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
  const Entry* __restrict tabp = tab.data();
  const uint16_t* __restrict cump = cumtab.data();

  // Copy the streams into padded thread-local storage so the branchless
  // refill's unconditional 2-byte load can never read past the caller's
  // buffer.
  static thread_local std::vector<uint8_t> inbuf;
  if (inbuf.size() < total + 16) inbuf.resize(total + 16);
  std::memcpy(inbuf.data(), in + header, total);
  std::memset(inbuf.data() + total, 0, 16);

  const uint8_t* ptrs[kWays];
  const uint8_t* pends[kWays];
  uint32_t x[kWays];
  {
    const uint8_t* q = inbuf.data();
    for (uint32_t w = 0; w < kWays; ++w) {
      x[w] = ((uint32_t)q[0] << 24) | ((uint32_t)q[1] << 16) |
             ((uint32_t)q[2] << 8) | q[3];
      ptrs[w] = q + 4;
      pends[w] = q + lens[w];
      q += lens[w];
    }
  }

  // Branchless word refill from the state's own stream: the per-state
  // chains (slot -> table load -> multiply -> refill) proceed in parallel.
  auto get = [tabp, cump](uint32_t& xs, const uint8_t*& p, uint8_t* o) {
    const uint32_t slot = xs & (kM - 1);
    const Entry e = tabp[slot];
    *o = e.sym;
    xs = e.freq * (xs >> kScaleBits) + slot - cump[slot];
    const uint32_t need = xs < kWordL;
    const uint32_t word = (uint32_t)p[0] | ((uint32_t)p[1] << 8);
    xs = need ? (xs << 16) | word : xs;
    p += 2 * need;
  };

  uint64_t i = 0;
  const uint64_t main_n = n - (n % kWays);
  if (main_n) {
    uint32_t x0 = x[0], x1 = x[1], x2 = x[2], x3 = x[3];
    const uint8_t *p0 = ptrs[0], *p1 = ptrs[1], *p2 = ptrs[2], *p3 = ptrs[3];
    for (; i < main_n; i += kWays) {
      uint8_t* o = out + i;
      get(x0, p0, o);
      get(x1, p1, o + 1);
      get(x2, p2, o + 2);
      get(x3, p3, o + 3);
    }
    x[0] = x0; x[1] = x1; x[2] = x2; x[3] = x3;
    ptrs[0] = p0; ptrs[1] = p1; ptrs[2] = p2; ptrs[3] = p3;
  }
  for (; i < n; ++i) get(x[i % kWays], ptrs[i % kWays], out + i);

  // Malformed streams can only over-consume into the zero padding; detect
  // it after the fact instead of per symbol.
  for (uint32_t w = 0; w < kWays; ++w)
    if (ptrs[w] > pends[w]) return 5;
  return 0;
}

}  // extern "C"
