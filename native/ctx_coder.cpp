// Context-adaptive binary range coder for subband residual planes.
//
// Bit-identical C++ twin of the Python specification in
// rustyhgi_tpu/ops/ctxcoder.py (see that module's docstring for the
// model: zigzag bit-trees, (level-group x 2D-activity) contexts,
// anchor delta coding, carryless Subbotin range coder).  Streams
// produced by either implementation decode with the other; the test
// suite cross-validates them byte-for-byte.
//
// The piece table is (h, w, group) u32 triples in payload order:
// anchors (group 0, delta-coded), then per pyramid level (coarsest
// first) its three residual quads (group min(level+1, 4)).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kProbBits = 12;
constexpr uint16_t kProbInit = 1u << (kProbBits - 1);

constexpr uint32_t kTop = 1u << 24;
constexpr uint32_t kBot = 1u << 16;
constexpr uint32_t kGroups = 5;
constexpr uint32_t kActBuckets = 5;
constexpr uint32_t kContexts = kGroups * kActBuckets;

inline uint32_t act_bucket(uint32_t act) {
  if (act < 1) return 0;
  if (act < 3) return 1;
  if (act < 8) return 2;
  if (act < 20) return 3;
  return 4;
}

inline uint32_t zigzag(uint32_t v) {
  return v < 128 ? v * 2 : (256 - v) * 2 - 1;
}

inline uint32_t unzigzag(uint32_t z) {
  return (z & 1) == 0 ? z >> 1 : (256 - ((z + 1) >> 1)) & 255;
}

struct Models {
  // [context][tree node 1..255]
  uint16_t p[kContexts][256];
  Models() {
    for (auto& row : p)
      for (auto& v : row) v = kProbInit;
  }
};

struct Encoder {
  uint32_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint8_t* out;
  uint64_t pos = 0, cap;
  uint32_t shift;
  bool overflow = false;

  Encoder(uint8_t* o, uint64_t c, uint32_t adapt_shift)
      : out(o), cap(c), shift(adapt_shift) {}

  inline void emit() {
    if (pos < cap)
      out[pos] = static_cast<uint8_t>(low >> 24);
    else
      overflow = true;
    ++pos;
    low <<= 8;
    range <<= 8;
  }

  inline void renorm() {
    for (;;) {
      if ((low ^ (low + range)) < kTop) {
        // top byte settled; ship it
      } else if (range < kBot) {
        // truncate range to the next 2**16 boundary so the byte ships
        range = (0u - low) & (kBot - 1);
      } else {
        return;
      }
      emit();
    }
  }

  inline void encode(uint16_t* probs, uint32_t idx, uint32_t bit) {
    // Branchless on the (data-dependent, unpredictable) bit: both
    // outcomes are computed and mask-selected, which measures ~1.6x
    // faster than the branching form on this 2-core host — the bit
    // branch mispredicts ~50% on residual data.  Arithmetic is
    // IDENTICAL to the branching spec (ops/ctxcoder.py): streams stay
    // bit-exact both ways.
    uint32_t p = probs[idx];
    uint32_t bound = (range >> kProbBits) * p;
    uint32_t m = 0u - bit;  // 0 or 0xFFFFFFFF
    low += bound & m;
    range = (bound & ~m) | ((range - bound) & m);
    uint32_t p0 = p + (((1u << kProbBits) - p) >> shift);
    uint32_t p1 = p - (p >> shift);
    probs[idx] = static_cast<uint16_t>((p0 & ~m) | (p1 & m));
    renorm();
  }

  inline void tree_encode(uint16_t* probs, uint32_t z) {
    uint32_t node = 1;
    for (int k = 7; k >= 0; --k) {
      uint32_t bit = (z >> k) & 1;
      encode(probs, node, bit);
      node = (node << 1) | bit;
    }
  }

  void flush() {
    for (int i = 0; i < 4; ++i) emit();
  }
};

struct Decoder {
  uint32_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;
  const uint8_t* in;
  uint64_t pos = 0, len;
  uint32_t shift;

  Decoder(const uint8_t* i, uint64_t l, uint32_t adapt_shift)
      : in(i), len(l), shift(adapt_shift) {
    for (int k = 0; k < 4; ++k) code = (code << 8) | next();
  }

  inline uint8_t next() { return pos < len ? in[pos++] : 0; }

  inline void renorm() {
    for (;;) {
      if ((low ^ (low + range)) < kTop) {
      } else if (range < kBot) {
        range = (0u - low) & (kBot - 1);
      } else {
        return;
      }
      code = (code << 8) | next();
      low <<= 8;
      range <<= 8;
    }
  }

  inline uint32_t decode(uint16_t* probs, uint32_t idx) {
    // Branchless mirror of Encoder::encode (same ~1.6x win: the decoded
    // bit is data-dependent and mispredicts as a branch).
    uint32_t p = probs[idx];
    uint32_t bound = (range >> kProbBits) * p;
    uint32_t bit = (code - low) >= bound ? 1u : 0u;  // compiles to setcc
    uint32_t m = 0u - bit;
    low += bound & m;
    range = (bound & ~m) | ((range - bound) & m);
    uint32_t p0 = p + (((1u << kProbBits) - p) >> shift);
    uint32_t p1 = p - (p >> shift);
    probs[idx] = static_cast<uint16_t>((p0 & ~m) | (p1 & m));
    renorm();
    return bit;
  }

  inline uint32_t tree_decode(uint16_t* probs) {
    uint32_t node = 1;
    for (int k = 0; k < 8; ++k) node = (node << 1) | decode(probs, node);
    return node & 0xFF;
  }
};

}  // namespace

extern "C" {

uint64_t ctx_worst_size(uint64_t n) {
  // Adaptive coding can transiently expand; 2n + slack is far beyond any
  // sustainable adversarial rate, and the encoder still checks capacity.
  return 2 * n + 4096;
}

// Returns the compressed size, or 0 if `cap` was insufficient.
uint64_t ctx_compress(const uint8_t* payload, uint64_t n_pieces,
                      const uint32_t* pieces, uint8_t* out, uint64_t cap,
                      uint32_t adapt_shift) {
  Models models;
  Encoder enc(out, cap, adapt_shift);
  const uint8_t* plane = payload;
  std::vector<uint16_t> prev_z;
  for (uint64_t pi = 0; pi < n_pieces; ++pi) {
    const uint32_t h = pieces[3 * pi], w = pieces[3 * pi + 1],
                   group = pieces[3 * pi + 2];
    prev_z.assign(w, 0);
    for (uint32_t y = 0; y < h; ++y) {
      uint32_t left_z = 0;
      const uint8_t* row = plane + static_cast<uint64_t>(y) * w;
      for (uint32_t x = 0; x < w; ++x) {
        uint32_t v = row[x];
        uint32_t sym;
        if (group == 0) {
          uint32_t pred = x ? row[x - 1] : (y ? row[static_cast<int64_t>(x) - w] : 128u);
          sym = (v - pred) & 255u;
        } else {
          sym = v;
        }
        uint32_t z = zigzag(sym);
        uint32_t ctx = group * kActBuckets + act_bucket(left_z + prev_z[x]);
        enc.tree_encode(models.p[ctx], z);
        prev_z[x] = static_cast<uint16_t>(z);
        left_z = z;
      }
    }
    plane += static_cast<uint64_t>(h) * w;
  }
  enc.flush();
  return enc.overflow ? 0 : enc.pos;
}

int ctx_decompress(const uint8_t* src, uint64_t src_len, uint64_t n_pieces,
                   const uint32_t* pieces, uint8_t* out_payload,
                   uint32_t adapt_shift) {
  Models models;
  Decoder dec(src, src_len, adapt_shift);
  uint8_t* plane = out_payload;
  std::vector<uint16_t> prev_z;
  for (uint64_t pi = 0; pi < n_pieces; ++pi) {
    const uint32_t h = pieces[3 * pi], w = pieces[3 * pi + 1],
                   group = pieces[3 * pi + 2];
    prev_z.assign(w, 0);
    for (uint32_t y = 0; y < h; ++y) {
      uint32_t left_z = 0;
      uint8_t* row = plane + static_cast<uint64_t>(y) * w;
      for (uint32_t x = 0; x < w; ++x) {
        uint32_t ctx = group * kActBuckets + act_bucket(left_z + prev_z[x]);
        uint32_t z = dec.tree_decode(models.p[ctx]);
        uint32_t sym = unzigzag(z);
        if (group == 0) {
          uint32_t pred = x ? row[x - 1] : (y ? row[static_cast<int64_t>(x) - w] : 128u);
          row[x] = static_cast<uint8_t>((pred + sym) & 255u);
        } else {
          row[x] = static_cast<uint8_t>(sym);
        }
        prev_z[x] = static_cast<uint16_t>(z);
        left_z = z;
      }
    }
    plane += static_cast<uint64_t>(h) * w;
  }
  return 0;
}

}  // extern "C"
