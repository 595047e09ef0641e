// Scalar C++ HGI codec.
//
// Role in this framework (see SURVEY.md §6): the reference is Rust and the
// Rust toolchain is absent in this environment, so this module is the
// measured stand-in for the reference binary's single-threaded scalar
// performance (-O3, same algorithmic structure: one pass per pixel per
// level), as well as a fast host-side oracle for golden tests on large
// images.  It implements the documented semantics of SURVEY.md §3.5-3.6:
// anchor lattice, two-phase level traversal, Crossed 4-corner prediction
// with OOB-as-0 and the exact integer rounding tree, linear max-error
// quantizer LUT, mod-256 residuals, overflow fixup, in-loop reconstruction.
//
// Exposed via a C ABI for ctypes (rustyhgi_tpu/ops/native.py).

#include <cstdint>
#include <cstring>

namespace {

inline uint8_t predict_crossed(const uint8_t* im, uint32_t w, uint32_t h,
                               uint32_t x, uint32_t y, uint32_t step) {
  const uint32_t mask = step - 1;
  const uint32_t x0 = x & ~mask;
  const uint32_t y0 = y & ~mask;
  auto px = [&](uint32_t xx, uint32_t yy) -> uint32_t {
    return (xx < w && yy < h) ? im[(uint64_t)yy * w + xx] : 0u;
  };
  const uint32_t tl = px(x0, y0);
  const uint32_t tr = px(x0 + step, y0);
  const uint32_t bl = px(x0, y0 + step);
  const uint32_t br = px(x0 + step, y0 + step);
  auto avg = [](uint32_t a, uint32_t b) { return (a + b + 1) >> 1; };
  return (uint8_t)((avg(tl, tr) + avg(bl, br) + avg(tl, bl) + avg(tr, br)) >> 2);
}

// Per-pixel encode body (closed loop: writes reconstruction back into im).
inline void encode_pixel(uint8_t* im, uint8_t* grid, const uint8_t* lut,
                         uint32_t w, uint32_t h, uint32_t x, uint32_t y,
                         uint32_t step) {
  const uint64_t idx = (uint64_t)y * w + x;
  const uint32_t pred = predict_crossed(im, w, h, x, y, step);
  const uint32_t actual = im[idx];
  const uint32_t diff = (actual - pred) & 0xFF;
  uint32_t q = lut[diff];
  const bool overflow = pred + q > 255;
  const bool overflow_expected = pred + diff > 255;
  if (overflow != overflow_expected) q = diff;  // lossless fixup
  grid[idx] = (uint8_t)q;
  im[idx] = (uint8_t)((pred + q) & 0xFF);
}

inline void decode_pixel(uint8_t* im, const uint8_t* grid, uint32_t w,
                         uint32_t h, uint32_t x, uint32_t y, uint32_t step) {
  const uint64_t idx = (uint64_t)y * w + x;
  const uint32_t pred = predict_crossed(im, w, h, x, y, step);
  im[idx] = (uint8_t)((pred + grid[idx]) & 0xFF);
}

// Two-phase sweep of one refinement level (spacing semantics of the
// traversal in SURVEY.md §3.5): phase A = coarse rows, midpoint columns;
// phase B = new rows at fine spacing, all fine columns.
template <typename F>
inline void traverse_level(uint32_t level, uint32_t levels, uint32_t w,
                           uint32_t h, F&& f) {
  const uint32_t e = levels - level;
  const uint32_t step = 1u << e;
  const uint32_t substep = 1u << (e - 1);
  uint32_t line = 0;
  while (line < h) {
    for (uint32_t col = substep; col < w; col += step) f(col, line);
    line += substep;
    if (line >= h) break;
    for (uint32_t col = 0; col < w; col += substep) f(col, line);
    line += substep;
  }
}

}  // namespace

extern "C" {

// Encode one plane.  image: uint8[h*w] row-major input, CLOBBERED with the
// reconstruction.  grid: uint8[h*w] output residual plane.  error is the
// linear quantizer max-error (0/10/20/30; any value accepted).
void hgi_encode_plane(uint8_t* image, uint8_t* grid, uint32_t w, uint32_t h,
                      uint32_t levels, uint32_t error) {
  uint8_t lut[256];
  const uint32_t scale = 2 * error + 1;
  for (uint32_t i = 0; i < 256; ++i)
    lut[i] = (uint8_t)((((i + error) / scale) * scale) & 0xFF);

  const uint32_t astep = 1u << levels;
  for (uint32_t y = 0; y < h; y += astep)
    for (uint32_t x = 0; x < w; x += astep)
      grid[(uint64_t)y * w + x] = image[(uint64_t)y * w + x];

  for (uint32_t level = 0; level < levels; ++level) {
    const uint32_t step = 1u << (levels - level);
    traverse_level(level, levels, w, h, [&](uint32_t x, uint32_t y) {
      encode_pixel(image, grid, lut, w, h, x, y, step);
    });
  }
}

// Decode one plane.  grid: uint8[h*w] residual plane.  image: output.
void hgi_decode_plane(const uint8_t* grid, uint8_t* image, uint32_t w,
                      uint32_t h, uint32_t levels) {
  std::memset(image, 0, (uint64_t)w * h);
  const uint32_t astep = 1u << levels;
  for (uint32_t y = 0; y < h; y += astep)
    for (uint32_t x = 0; x < w; x += astep)
      image[(uint64_t)y * w + x] = grid[(uint64_t)y * w + x];

  for (uint32_t level = 0; level < levels; ++level) {
    const uint32_t step = 1u << (levels - level);
    traverse_level(level, levels, w, h, [&](uint32_t x, uint32_t y) {
      decode_pixel(image, grid, w, h, x, y, step);
    });
  }
}

}  // extern "C"
