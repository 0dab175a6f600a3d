// Native image decode + threaded batch loader (SURVEY.md §2.4, §7.3.7).
//
// The reference family decodes frames through OpenCV's C++ imgcodecs; this
// is the build's native equivalent for the host half of the double-buffered
// H->D feed (BASELINE.json:5 "double-buffered host I/O"). On a 2-vCPU host
// the PNG decode is the frontend's host bottleneck (SURVEY.md §7.3.7), so
// it runs here — C++ with zlib inflate and a std::thread pool — instead of
// through Python-level cv2 calls, and lands frames directly into one
// contiguous caller-provided block so jax.device_put DMAs straight out of
// it with no Python-side copies.
//
// Scope: 8-bit non-interlaced PNG, color types 0 (gray), 2 (RGB),
// 3 (palette), 4 (gray+alpha), 6 (RGBA) — everything KITTI odometry and
// EuRoC ASL ship. Anything else returns an error and the Python binding
// (runtime/imageio.py) falls back to cv2 with identical output semantics.
//
// Compiled on first use by runtime/imageio.py (g++ -O3 -march=native -lz),
// ctypes-bound — no pybind11 dependency.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// Error codes surfaced to Python (negative = failure).
enum {
  OK = 0,
  ERR_IO = -1,          // file open/read failed
  ERR_SIGNATURE = -2,   // not a PNG
  ERR_FORMAT = -3,      // malformed chunk structure
  ERR_UNSUPPORTED = -4, // bit depth / color type / interlace out of scope
  ERR_INFLATE = -5,     // zlib failure
  ERR_SHAPE = -6,       // decoded size != caller-provided h, w
  ERR_ALLOC = -7,       // allocation failure (caught; never crosses the ABI)
};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngHeader {
  uint32_t w = 0, h = 0;
  uint8_t depth = 0, color = 0, interlace = 0;
  int channels = 0;
};

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  out->resize(size_t(n));
  size_t got = n ? std::fread(out->data(), 1, size_t(n), f) : 0;
  std::fclose(f);
  return got == size_t(n);
}

const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};

int parse_header(const uint8_t* buf, size_t n, PngHeader* hdr) {
  if (n < 33 || std::memcmp(buf, kSig, 8) != 0) return ERR_SIGNATURE;
  // First chunk must be IHDR.
  if (be32(buf + 8) != 13 || std::memcmp(buf + 12, "IHDR", 4) != 0)
    return ERR_FORMAT;
  const uint8_t* d = buf + 16;
  hdr->w = be32(d);
  hdr->h = be32(d + 4);
  hdr->depth = d[8];
  hdr->color = d[9];
  hdr->interlace = d[12];
  static const int kChannels[7] = {1, 0, 3, 1, 2, 0, 4};
  if (hdr->color > 6 || kChannels[hdr->color] == 0) return ERR_UNSUPPORTED;
  hdr->channels = kChannels[hdr->color];
  if (hdr->depth != 8 || hdr->interlace != 0) return ERR_UNSUPPORTED;
  // Cap accepted dimensions well below anything a dataset frame needs:
  // a crafted IHDR claiming 2^24 x 2^24 would otherwise drive multi-GB
  // allocations before any data validation.
  if (hdr->w == 0 || hdr->h == 0 || hdr->w > (1u << 16) || hdr->h > (1u << 16))
    return ERR_FORMAT;
  return OK;
}

inline uint8_t paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = p > a ? p - a : a - p;
  const int pb = p > b ? p - b : b - p;
  const int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// Reverse PNG scanline filters in place over `raw` (h rows of
// 1 filter byte + stride pixel bytes each).
int unfilter(uint8_t* raw, uint32_t h, size_t stride, int bpp) {
  std::vector<uint8_t> zero(stride, 0);
  const uint8_t* prev = zero.data();
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t* row = raw + size_t(y) * (stride + 1);
    const uint8_t ft = row[0];
    uint8_t* cur = row + 1;
    switch (ft) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t x = size_t(bpp); x < stride; ++x) cur[x] += cur[x - bpp];
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x) cur[x] += prev[x];
        break;
      case 3:  // Average
        for (int x = 0; x < bpp; ++x) cur[x] += prev[x] >> 1;
        for (size_t x = size_t(bpp); x < stride; ++x)
          cur[x] += uint8_t((uint32_t(cur[x - bpp]) + prev[x]) >> 1);
        break;
      case 4:  // Paeth
        for (int x = 0; x < bpp; ++x) cur[x] += paeth(0, prev[x], 0);
        for (size_t x = size_t(bpp); x < stride; ++x)
          cur[x] += paeth(cur[x - bpp], prev[x], prev[x - bpp]);
        break;
      default:
        return ERR_FORMAT;
    }
    prev = cur;
  }
  return OK;
}

// BT.601 integer grayscale, identical to _preproc.cpp rgb_to_gray_u8 and
// to the cv2.cvtColor convention the fallback path uses.
inline uint8_t gray601(uint32_t r, uint32_t g, uint32_t b) {
  return uint8_t((9798 * r + 19235 * g + 3735 * b + 16384) >> 15);
}

int decode_gray(const uint8_t* buf, size_t n, uint8_t* out,
                int64_t oh, int64_t ow) {
  PngHeader hdr;
  int rc = parse_header(buf, n, &hdr);
  if (rc != OK) return rc;
  if (int64_t(hdr.h) != oh || int64_t(hdr.w) != ow) return ERR_SHAPE;

  // Walk chunks: concatenate IDAT payloads, grab PLTE for palette images.
  std::vector<uint8_t> idat;
  idat.reserve(n);
  const uint8_t* plte = nullptr;
  size_t plte_n = 0;
  size_t off = 33;  // past signature + IHDR
  while (off + 12 <= n) {
    const uint32_t len = be32(buf + off);
    if (off + 12 + len > n) return ERR_FORMAT;
    const uint8_t* type = buf + off + 4;
    const uint8_t* data = buf + off + 8;
    if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), data, data + len);
    } else if (std::memcmp(type, "PLTE", 4) == 0) {
      plte = data;
      plte_n = len;
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    off += 12 + len;
  }
  if (idat.empty()) return ERR_FORMAT;
  if (hdr.color == 3 && (plte == nullptr || plte_n % 3 != 0)) return ERR_FORMAT;

  const int bpp = hdr.channels;
  const size_t stride = size_t(hdr.w) * size_t(bpp);
  std::vector<uint8_t> raw(size_t(hdr.h) * (stride + 1));
  uLongf raw_n = uLongf(raw.size());
  if (::uncompress(raw.data(), &raw_n, idat.data(), uLong(idat.size())) != Z_OK ||
      raw_n != raw.size())
    return ERR_INFLATE;

  rc = unfilter(raw.data(), hdr.h, stride, bpp);
  if (rc != OK) return rc;

  for (uint32_t y = 0; y < hdr.h; ++y) {
    const uint8_t* px = raw.data() + size_t(y) * (stride + 1) + 1;
    uint8_t* dst = out + size_t(y) * hdr.w;
    switch (hdr.color) {
      case 0:  // gray
        std::memcpy(dst, px, hdr.w);
        break;
      case 2:  // RGB
        for (uint32_t x = 0; x < hdr.w; ++x)
          dst[x] = gray601(px[3 * x], px[3 * x + 1], px[3 * x + 2]);
        break;
      case 3:  // palette
        for (uint32_t x = 0; x < hdr.w; ++x) {
          const size_t i = size_t(px[x]) * 3;
          if (i + 2 >= plte_n) return ERR_FORMAT;
          dst[x] = gray601(plte[i], plte[i + 1], plte[i + 2]);
        }
        break;
      case 4:  // gray + alpha
        for (uint32_t x = 0; x < hdr.w; ++x) dst[x] = px[2 * x];
        break;
      case 6:  // RGBA
        for (uint32_t x = 0; x < hdr.w; ++x)
          dst[x] = gray601(px[4 * x], px[4 * x + 1], px[4 * x + 2]);
        break;
      default:
        return ERR_UNSUPPORTED;
    }
  }
  return OK;
}

}  // namespace

extern "C" {

// C++ exceptions (std::bad_alloc from the buffer vectors) must never cross
// the extern "C" / ctypes boundary — that std::terminate()s the whole Python
// process. Every entry point catches and returns ERR_ALLOC instead, letting
// the Python side fall back to its cv2 path.

// Reads just the IHDR of `path`; writes (h, w). Returns OK or an error code.
int png_peek(const char* path, int64_t* h, int64_t* w) {
  try {
    std::vector<uint8_t> buf;
    if (!read_file(path, &buf)) return ERR_IO;
    PngHeader hdr;
    const int rc = parse_header(buf.data(), buf.size(), &hdr);
    if (rc != OK) return rc;
    *h = hdr.h;
    *w = hdr.w;
    return OK;
  } catch (...) {
    return ERR_ALLOC;
  }
}

// Decodes one PNG to grayscale into out (h, w) u8. Returns OK or error.
int png_decode_gray_file(const char* path, uint8_t* out,
                         int64_t h, int64_t w) {
  try {
    std::vector<uint8_t> buf;
    if (!read_file(path, &buf)) return ERR_IO;
    return decode_gray(buf.data(), buf.size(), out, h, w);
  } catch (...) {
    return ERR_ALLOC;
  }
}

// Threaded batch decode: `count` files, all (h, w), into one contiguous
// (count, h, w) u8 block. nthreads workers pull file indices off an atomic
// counter (read + inflate + unfilter all inside the pool). Returns the
// number of failures (0 = every frame decoded); failed slots are
// zero-filled and per-slot status lands in `status` (len count, may be
// null) so the caller can re-decode stragglers through its fallback.
int64_t png_decode_batch(const char* const* paths, int64_t count,
                         uint8_t* out, int64_t h, int64_t w,
                         int64_t nthreads, int32_t* status) {
  try {
  if (count <= 0) return 0;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > count) nthreads = count;
  std::atomic<int64_t> next(0), failures(0);
  const int64_t frame = h * w;
  auto worker = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= count) return;
      uint8_t* dst = out + i * frame;
      int rc;
      try {
        rc = png_decode_gray_file(paths[i], dst, h, w);
      } catch (...) {
        rc = ERR_ALLOC;  // worker threads must not leak exceptions either
      }
      if (status) status[i] = rc;
      if (rc != OK) {
        std::memset(dst, 0, size_t(frame));
        failures.fetch_add(1);
      }
    }
  };
  if (nthreads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(size_t(nthreads));
    for (int64_t t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
  } catch (...) {
    return count;  // report everything failed; caller falls back per frame
  }
}

}  // extern "C"
