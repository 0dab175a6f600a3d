// Host-side image preprocessing (SURVEY.md §2.4, §7.3.7).
//
// The reference family does its host-side image work inside OpenCV's C++
// core; this is the build's native equivalent for the pieces that sit on
// the host half of the double-buffered H->D feed (BASELINE.json:5):
//   - RGB -> grayscale (BT.601, matches cv2.cvtColor COLOR_RGB2GRAY)
//   - 2x box downscale (pre-LSD pyramid level)
//   - u8 -> f32 convert (+ optional normalize) into a caller-provided
//     pinned/packed buffer, so jax.device_put DMAs straight out of it.
//
// Decode stays in the PNG library; these loops are the ones profiling shows
// between decode and device_put on a 2-vCPU host. Compiled on first use by
// runtime/host_preproc.py (g++ -O3 -march=native -shared), ctypes-bound —
// no pybind11 dependency. Every function has a NumPy fallback with
// identical semantics (tests/unit/test_host_preproc.py asserts parity).

#include <cstdint>
#include <cstddef>

extern "C" {

// rgb (h, w, 3) u8 -> gray (h, w) u8, BT.601 integer arithmetic
// (exactly round(0.299 r + 0.587 g + 0.114 b) via 15-bit fixed point).
void rgb_to_gray_u8(const uint8_t* rgb, uint8_t* gray,
                    int64_t h, int64_t w) {
  const int64_t n = h * w;
  for (int64_t i = 0; i < n; ++i) {
    const uint32_t r = rgb[3 * i + 0];
    const uint32_t g = rgb[3 * i + 1];
    const uint32_t b = rgb[3 * i + 2];
    gray[i] = static_cast<uint8_t>((9798 * r + 19235 * g + 3735 * b + 16384) >> 15);
  }
}

// gray (h, w) u8 -> (h/2, w/2) u8 via 2x2 box mean (round-half-up).
void downscale2x_u8(const uint8_t* src, uint8_t* dst,
                    int64_t h, int64_t w) {
  const int64_t oh = h / 2, ow = w / 2;
  for (int64_t y = 0; y < oh; ++y) {
    const uint8_t* r0 = src + (2 * y) * w;
    const uint8_t* r1 = r0 + w;
    uint8_t* out = dst + y * ow;
    for (int64_t x = 0; x < ow; ++x) {
      const uint32_t s = r0[2 * x] + r0[2 * x + 1] + r1[2 * x] + r1[2 * x + 1];
      out[x] = static_cast<uint8_t>((s + 2) >> 2);
    }
  }
}

// u8 -> f32 with scale (1.0 keeps 0..255; 1/255 normalizes).
void u8_to_f32(const uint8_t* src, float* dst, int64_t n, float scale) {
  for (int64_t i = 0; i < n; ++i) dst[i] = scale * static_cast<float>(src[i]);
}

// Pack a batch of b gray u8 frames into one contiguous f32 block
// (b, h, w) — the host half of the double-buffered feed: one device_put
// of the packed block instead of b small transfers.
void pack_frames_f32(const uint8_t* const* frames, float* dst,
                     int64_t b, int64_t h, int64_t w, float scale) {
  const int64_t n = h * w;
  for (int64_t k = 0; k < b; ++k) {
    const uint8_t* src = frames[k];
    float* out = dst + k * n;
    for (int64_t i = 0; i < n; ++i) out[i] = scale * static_cast<float>(src[i]);
  }
}

}  // extern "C"
