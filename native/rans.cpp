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
//     pointer whose advance depends on each symbol's table load -> each
//     state owns an INDEPENDENT stream, so the dependency chains
//     (slot -> 64KB-table load -> multiply -> refill) overlap fully —
//     and, with per-lane stream offsets, vectorize cleanly.
// W = 16 states: symbol i belongs to state i mod 16.  The scalar paths
// process the states in four groups of four (4 states + 4 stream pointers
// fit x86-64 registers; state groups are independent, so group-at-a-time
// passes are legal for both directions), and the AVX-512 paths process
// all 16 lanes at once with per-lane stream offsets (no compress/expand
// needed — each lane refills from its own stream).  Encoding runs over
// symbols in reverse, emitting backward into per-state buffers; decoding
// reads each stream forward.  State x (u32) in [1<<16, 1<<32), M = 1<<14.
//
// Stream layout produced by rans_compress:
//   u16 LE freq[256]    (normalized to sum 1<<14; 512 bytes)
//   u8  variant         (0xC0 flag = per-state word streams | ways = 16)
//   u32 LE total stream length S
//   u32 LE per-state stream lengths [16]
//   16 concatenated per-state streams, each: 4-byte big-endian final state
//   flush followed by that state's renorm words (u16 LE), read forward.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr uint32_t kScaleBits = 14;
constexpr uint32_t kM = 1u << kScaleBits;
constexpr uint32_t kWordL = 1u << 16;  // word-renorm lower bound
constexpr uint32_t kWays = 16;
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

// Encode-path quotient q = xs / f (f == 1 intentionally yields xs - 1;
// its bias absorbs the off-by-one — see build_enc_table).  The 32-bit
// ceil reciprocal is exact only for xs < 2^31 (Alverson bound);
// word-renorm states reach f << 18, which crosses 2^31 when f > 2^13 (a
// >50%-probable symbol — the norm for quantized residual planes),
// overshooting q by one for rare states.  One corrective step restores
// q == xs / f exactly; no overflow (xs + f < 2^32 since
// xs < f << 18 <= 2^32 - 2^18).  The f == 1 path is untouched
// (q * 1 > xs is false).  The AVX-512 encode loop mirrors this fixup.
inline uint32_t enc_quotient(uint32_t xs, const EncSym& e) {
  uint32_t q = (uint32_t)(((uint64_t)xs * e.rcp_freq) >> 32) >> e.rcp_shift;
  q -= (q * (kM - e.cmpl_freq) > xs);
  return q;
}

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

bool simd_disabled() {
  static const bool disabled = std::getenv("RUSTYHGI_NO_SIMD") != nullptr;
  return disabled;
}

}  // namespace

extern "C" {

// Test hook: the encode-path quotient for one (state, freq) pair, through
// the exact table construction and fixup the encoder uses.  Lets the test
// suite verify q == x / f at the analytically-worst states (the Alverson
// reciprocal's failure points above 2^31) without having to luck into
// them through a full encode.
uint32_t rans_encode_quotient(uint32_t x, uint32_t f) {
  uint16_t freq[256] = {0};
  uint32_t cum[257] = {0};
  freq[0] = (uint16_t)f;
  EncSym syms[256];
  build_enc_table(freq, cum, syms);
  return enc_quotient(x, syms[0]);
}

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
    xs = xs + e.bias + enc_quotient(xs, e) * e.cmpl_freq;
  };

  uint64_t i = n;
  while (i % kWays) {
    --i;
    put(x[i % kWays], ptrs[i % kWays], in[i]);
  }
  const uint64_t main_n = i;
  bool simd_done = false;
#if defined(__AVX512F__)
  if (main_n && !simd_disabled() && n < (1ull << 30)) {
    // All 16 states at once.  Per-symbol tables packed for 32-bit
    // gathers: rcp_freq alone; bias | cmpl_freq << 16 (bias < 2^15,
    // cmpl < 2^15); rcp_shift alone.  x_max is not gathered — it is
    // derived in-register as f << 18 with f = M - cmpl.
    alignas(64) uint32_t t_rcp[256], t_bc[256], t_sh[256];
    for (int s2 = 0; s2 < 256; ++s2) {
      t_rcp[s2] = syms[s2].rcp_freq;
      t_bc[s2] = syms[s2].bias | (syms[s2].cmpl_freq << 16);
      t_sh[s2] = syms[s2].rcp_shift;
    }
    uint8_t* sbase = scratch.data();
    alignas(64) uint32_t x_a[kWays], offs_a[kWays];
    for (uint32_t w = 0; w < kWays; ++w) {
      x_a[w] = x[w];
      offs_a[w] = (uint32_t)(ptrs[w] - sbase);
    }
    __m512i vx = _mm512_load_si512(x_a);
    __m512i voffs = _mm512_load_si512(offs_a);
    const __m512i vM = _mm512_set1_epi32((int)kM);
    const __m512i vlow16 = _mm512_set1_epi32(0xFFFF);
    const __m512i vlow15 = _mm512_set1_epi32(0x7FFF);
    const __m512i vtwo = _mm512_set1_epi32(2);
    const __m512i vfour = _mm512_set1_epi32(4);
    const __m512i oddmask32 =
        _mm512_set1_epi64((long long)0xFFFFFFFF00000000ull);
    (void)oddmask32;
    for (uint64_t j = main_n; j > 0; j -= kWays) {
      const __m512i sym = _mm512_cvtepu8_epi32(
          _mm_loadu_si128((const __m128i*)(in + j - kWays)));
      const __m512i rcp = _mm512_i32gather_epi32(sym, (const int*)t_rcp, 4);
      const __m512i bc = _mm512_i32gather_epi32(sym, (const int*)t_bc, 4);
      const __m512i sh = _mm512_i32gather_epi32(sym, (const int*)t_sh, 4);
      const __m512i bias = _mm512_and_epi32(bc, vlow15);
      const __m512i cmpl = _mm512_srli_epi32(bc, 16);
      const __m512i f = _mm512_sub_epi32(vM, cmpl);
      const __m512i xmax = _mm512_slli_epi32(f, 18);
      // Branchless word renorm: store the u16 (as the high half of a
      // 32-bit word at offs-4 — the two clobbered low bytes are the next
      // positions this lane will write) and bump the offset when needed.
      const __mmask16 ren = _mm512_cmpge_epu32_mask(vx, xmax);
      _mm512_mask_i32scatter_epi32(
          sbase, ren, _mm512_sub_epi32(voffs, vfour),
          _mm512_slli_epi32(vx, 16), 1);
      voffs = _mm512_mask_sub_epi32(voffs, ren, voffs, vtwo);
      vx = _mm512_mask_blend_epi32(ren, vx, _mm512_srli_epi32(vx, 16));
      // q = mulhi32(x, rcp) >> shift  (two vpmuludq + odd-lane blend)
      const __m512i lo64 = _mm512_mul_epu32(vx, rcp);
      const __m512i hi64 = _mm512_mul_epu32(
          _mm512_srli_epi64(vx, 32), _mm512_srli_epi64(rcp, 32));
      const __m512i mulhi_even = _mm512_srli_epi64(lo64, 32);
      const __m512i mulhi =
          _mm512_mask_mov_epi32(mulhi_even, (__mmask16)0xAAAA, hi64);
      __m512i q = _mm512_srlv_epi32(mulhi, sh);
      // Same one-step overshoot fixup as the scalar path (see put()):
      // the reciprocal estimate can exceed x / f by one for states
      // >= 2^31 with f > 2^13.
      const __mmask16 over = _mm512_cmp_epu32_mask(
          _mm512_mullo_epi32(q, f), vx, _MM_CMPINT_NLE);
      q = _mm512_mask_sub_epi32(q, over, q, _mm512_set1_epi32(1));
      vx = _mm512_add_epi32(
          _mm512_add_epi32(vx, bias), _mm512_mullo_epi32(q, cmpl));
    }
    _mm512_store_si512(x_a, vx);
    _mm512_store_si512(offs_a, voffs);
    for (uint32_t w = 0; w < kWays; ++w) {
      x[w] = x_a[w];
      ptrs[w] = sbase + offs_a[w];
    }
    simd_done = true;
  }
#endif
  // Four passes, four states each: states are independent, so encoding
  // one group over the whole input before the next preserves each
  // state's required reverse order while keeping registers unspilled.
  if (main_n && !simd_done) {
    for (uint32_t base = 0; base < kWays; base += 4) {
      uint32_t x0 = x[base], x1 = x[base + 1];
      uint32_t x2 = x[base + 2], x3 = x[base + 3];
      uint8_t *p0 = ptrs[base], *p1 = ptrs[base + 1];
      uint8_t *p2 = ptrs[base + 2], *p3 = ptrs[base + 3];
      for (uint64_t j = main_n; j > 0; j -= kWays) {
        const uint8_t* __restrict s = in + j - kWays + base;
        put(x3, p3, s[3]);
        put(x2, p2, s[2]);
        put(x1, p1, s[1]);
        put(x0, p0, s[0]);
      }
      x[base] = x0; x[base + 1] = x1; x[base + 2] = x2; x[base + 3] = x3;
      ptrs[base] = p0; ptrs[base + 1] = p1;
      ptrs[base + 2] = p2; ptrs[base + 3] = p3;
    }
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
  static thread_local std::vector<uint16_t> cumtab(kM + 2);  // +2: SIMD 4B gather at slot kM-1
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
  // Padding covers both the branchless 2-byte refill and the SIMD path's
  // 4-byte gathers, including a malformed stream walking a lane's offset
  // past its end (bounded by 2 bytes/symbol; detected after the loop).
  static thread_local std::vector<uint8_t> inbuf;
  const uint64_t inbuf_need = total + 2 * (n / kWays) + 64;
  if (inbuf.size() < inbuf_need) inbuf.resize(inbuf_need);
  std::memcpy(inbuf.data(), in + header, total);
  std::memset(inbuf.data() + total, 0, inbuf_need - total);

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

  const uint64_t main_n = n - (n % kWays);
  bool simd_done = false;
#if defined(__AVX512F__)
  if (main_n && !simd_disabled()) {
    // All 16 lanes at once: table lookups via 32-bit gathers (the Entry
    // struct is already sym | freq<<16 as a little-endian u32), refill
    // via per-lane offset gathers from the padded stream buffer.
    const uint8_t* base = inbuf.data();
    alignas(64) uint32_t x_a[kWays], offs_a[kWays];
    for (uint32_t w = 0; w < kWays; ++w) {
      x_a[w] = x[w];
      offs_a[w] = (uint32_t)(ptrs[w] - base);
    }
    __m512i vx = _mm512_load_si512(x_a);
    __m512i voffs = _mm512_load_si512(offs_a);
    const __m512i vslotmask = _mm512_set1_epi32((int)(kM - 1));
    const __m512i vlow8 = _mm512_set1_epi32(0xFF);
    const __m512i vlow16 = _mm512_set1_epi32(0xFFFF);
    const __m512i vwordl = _mm512_set1_epi32((int)kWordL);
    const __m512i vtwo = _mm512_set1_epi32(2);
    for (uint64_t i = 0; i < main_n; i += kWays) {
      const __m512i slot = _mm512_and_epi32(vx, vslotmask);
      const __m512i e1 =
          _mm512_i32gather_epi32(slot, (const int*)tabp, 4);
      const __m512i cum = _mm512_and_epi32(
          _mm512_i32gather_epi32(slot, (const int*)cump, 2), vlow16);
      const __m512i sym = _mm512_and_epi32(e1, vlow8);
      const __m512i freq = _mm512_srli_epi32(e1, 16);
      vx = _mm512_add_epi32(
          _mm512_sub_epi32(
              _mm512_mullo_epi32(freq, _mm512_srli_epi32(vx, kScaleBits)),
              cum),
          slot);
      _mm512_mask_cvtepi32_storeu_epi8(out + i, 0xFFFF, sym);
      const __mmask16 need = _mm512_cmplt_epu32_mask(vx, vwordl);
      __m512i word = _mm512_mask_i32gather_epi32(
          _mm512_setzero_si512(), need, voffs, (const int*)base, 1);
      word = _mm512_and_epi32(word, vlow16);
      const __m512i refilled =
          _mm512_or_epi32(_mm512_slli_epi32(vx, 16), word);
      vx = _mm512_mask_blend_epi32(need, vx, refilled);
      voffs = _mm512_mask_add_epi32(voffs, need, voffs, vtwo);
    }
    _mm512_store_si512(x_a, vx);
    _mm512_store_si512(offs_a, voffs);
    for (uint32_t w = 0; w < kWays; ++w) {
      x[w] = x_a[w];
      ptrs[w] = base + offs_a[w];
    }
    simd_done = true;
  }
#endif
  if (main_n && !simd_done) {
    for (uint32_t base = 0; base < kWays; base += 4) {
      uint32_t x0 = x[base], x1 = x[base + 1];
      uint32_t x2 = x[base + 2], x3 = x[base + 3];
      const uint8_t *p0 = ptrs[base], *p1 = ptrs[base + 1];
      const uint8_t *p2 = ptrs[base + 2], *p3 = ptrs[base + 3];
      for (uint64_t j = 0; j < main_n; j += kWays) {
        uint8_t* o = out + j + base;
        get(x0, p0, o);
        get(x1, p1, o + 1);
        get(x2, p2, o + 2);
        get(x3, p3, o + 3);
      }
      x[base] = x0; x[base + 1] = x1; x[base + 2] = x2; x[base + 3] = x3;
      ptrs[base] = p0; ptrs[base + 1] = p1;
      ptrs[base + 2] = p2; ptrs[base + 3] = p3;
    }
  }
  for (uint64_t i = main_n; i < n; ++i)
    get(x[i % kWays], ptrs[i % kWays], out + i);

  // Malformed streams can only over-consume into the zero padding; detect
  // it after the fact instead of per symbol.
  for (uint32_t w = 0; w < kWays; ++w)
    if (ptrs[w] > pends[w]) return 5;
  return 0;
}

}  // extern "C"
