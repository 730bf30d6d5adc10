// srio — native IO runtime for ml_super_resolution_tpu.
//
// The reference framework's ingest was a Python/PIL loop (SURVEY §2a "Data
// pipeline"); the TPU rebuild keeps per-step transforms on device and gives
// the host the one job of turning files into uint8 HR tiles.  This library
// is that host runtime in C++: a dependency-light PNG decoder (zlib only)
// plus a batched random-tile sampler that writes straight into a
// caller-provided buffer (ctypes/numpy — no Python-object churn, no GIL).
//
// Decoder scope (anything else returns an error and the Python wrapper
// falls back to PIL): 8-bit, non-interlaced PNG, color types gray(0),
// RGB(2), palette(3), gray+alpha(4), RGBA(6); output is always RGB8.
//
// Build: g++ -O3 -shared -fPIC srio.cc -o libsrio.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int abs_i(int v) { return v < 0 ? -v : v; }

uint8_t paeth(uint8_t a, uint8_t b, uint8_t c) {
  int p = int(a) + int(b) - int(c);
  int pa = abs_i(p - int(a)), pb = abs_i(p - int(b)), pc = abs_i(p - int(c));
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// xorshift128+ — deterministic tile sampling independent of libc.
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed * 0x9E3779B97F4A7C15ull + 1;
    s1 = (seed ^ 0xDEADBEEFCAFEBABEull) * 0xBF58476D1CE4E5B9ull + 1;
    next();
    next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // unbiased-enough for tile offsets
  uint32_t below(uint32_t n) { return n ? uint32_t(next() % n) : 0; }
};

}  // namespace

extern "C" {

// Error codes.
enum {
  SRIO_OK = 0,
  SRIO_BAD_SIGNATURE = -1,
  SRIO_UNSUPPORTED = -2,   // interlaced / 16-bit / unknown color type
  SRIO_CORRUPT = -3,
  SRIO_ZLIB = -4,
  SRIO_TOO_SMALL = -5,     // out buffer too small
  SRIO_IO = -6,
};

// Parse IHDR only: returns 0 and fills w/h, or error.
int srio_png_info(const uint8_t* data, long len, int* w, int* h) {
  if (len < 33 || memcmp(data, kPngSig, 8) != 0) return SRIO_BAD_SIGNATURE;
  if (be32(data + 8) != 13 || memcmp(data + 12, "IHDR", 4) != 0)
    return SRIO_CORRUPT;
  *w = int(be32(data + 16));
  *h = int(be32(data + 20));
  return SRIO_OK;
}

// Decode a PNG byte buffer to RGB8 (row-major, 3*w*h bytes).
int srio_png_decode(const uint8_t* data, long len, uint8_t* out,
                    long out_cap, int* out_w, int* out_h) {
  int w = 0, h = 0;
  int rc = srio_png_info(data, len, &w, &h);
  if (rc != SRIO_OK) return rc;
  const uint8_t bitdepth = data[24];
  const uint8_t colortype = data[25];
  const uint8_t interlace = data[28];
  if (bitdepth != 8 || interlace != 0) return SRIO_UNSUPPORTED;
  int channels;
  switch (colortype) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 3: channels = 1; break;  // palette index
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return SRIO_UNSUPPORTED;
  }
  if (out_cap < long(3) * w * h) return SRIO_TOO_SMALL;

  // Collect IDAT spans and PLTE.
  const uint8_t* plte = nullptr;
  long plte_len = 0;
  std::vector<uint8_t> idat;
  long pos = 8;
  while (pos + 12 <= len) {
    uint32_t clen = be32(data + pos);
    const uint8_t* ctype = data + pos + 4;
    const uint8_t* cdata = data + pos + 8;
    if (pos + 12 + long(clen) > len) return SRIO_CORRUPT;
    if (memcmp(ctype, "IDAT", 4) == 0) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (memcmp(ctype, "PLTE", 4) == 0) {
      plte = cdata;
      plte_len = clen;
    } else if (memcmp(ctype, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + long(clen);
  }
  if (idat.empty()) return SRIO_CORRUPT;
  if (colortype == 3 && (plte == nullptr || plte_len % 3)) return SRIO_CORRUPT;

  // Inflate the filtered scanline stream.
  const long stride = long(w) * channels;
  std::vector<uint8_t> raw(size_t(h) * (stride + 1));
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return SRIO_ZLIB;
  zs.next_in = idat.data();
  zs.avail_in = uInt(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = uInt(raw.size());
  int zrc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zrc != Z_STREAM_END || zs.avail_out != 0) return SRIO_ZLIB;

  // Defilter in place (prev row = already-defiltered bytes).
  const int bpp = channels;  // bytes per pixel at bitdepth 8
  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    const uint8_t filter = src[0];
    const uint8_t* s = src + 1;
    switch (filter) {
      case 0:
        memcpy(cur.data(), s, stride);
        break;
      case 1:
        for (long i = 0; i < stride; ++i)
          cur[i] = uint8_t(s[i] + (i >= bpp ? cur[i - bpp] : 0));
        break;
      case 2:
        for (long i = 0; i < stride; ++i) cur[i] = uint8_t(s[i] + prev[i]);
        break;
      case 3:
        for (long i = 0; i < stride; ++i) {
          int a = i >= bpp ? cur[i - bpp] : 0;
          cur[i] = uint8_t(s[i] + ((a + prev[i]) >> 1));
        }
        break;
      case 4:
        for (long i = 0; i < stride; ++i) {
          uint8_t a = i >= bpp ? cur[i - bpp] : 0;
          uint8_t c = i >= bpp ? prev[i - bpp] : 0;
          cur[i] = uint8_t(s[i] + paeth(a, prev[i], c));
        }
        break;
      default:
        return SRIO_CORRUPT;
    }
    // Expand to RGB8.
    uint8_t* dst = out + size_t(y) * w * 3;
    switch (colortype) {
      case 0:
        for (int x = 0; x < w; ++x) {
          dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = cur[x];
        }
        break;
      case 2:
        memcpy(dst, cur.data(), size_t(w) * 3);
        break;
      case 3:
        for (int x = 0; x < w; ++x) {
          const int idx = cur[x];
          if (long(idx) * 3 + 2 >= plte_len) return SRIO_CORRUPT;
          dst[3 * x] = plte[3 * idx];
          dst[3 * x + 1] = plte[3 * idx + 1];
          dst[3 * x + 2] = plte[3 * idx + 2];
        }
        break;
      case 4:
        for (int x = 0; x < w; ++x) {
          dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = cur[2 * x];
        }
        break;
      case 6:
        for (int x = 0; x < w; ++x) {
          dst[3 * x] = cur[4 * x];
          dst[3 * x + 1] = cur[4 * x + 1];
          dst[3 * x + 2] = cur[4 * x + 2];
        }
        break;
    }
    prev.swap(cur);
  }
  *out_w = w;
  *out_h = h;
  return SRIO_OK;
}

// Decode a PNG file from disk (convenience; avoids Python file churn).
int srio_png_decode_file(const char* path, uint8_t* out, long out_cap,
                         int* out_w, int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return SRIO_IO;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(len));  // avoid vexing parse
  size_t got = fread(buf.data(), 1, size_t(len), f);
  fclose(f);
  if (long(got) != len) return SRIO_IO;
  return srio_png_decode(buf.data(), len, out, out_cap, out_w, out_h);
}

// Sample `count` random `tile`-square RGB tiles from a decoded RGB image
// (reflect-padding if the image is smaller than the tile) straight into
// `out` (count * tile * tile * 3 bytes).  Deterministic in `seed`.
int srio_sample_tiles(const uint8_t* img, int w, int h, int tile, int count,
                      uint64_t seed, uint8_t* out) {
  if (w <= 0 || h <= 0 || tile <= 0 || count <= 0) return SRIO_CORRUPT;
  Rng rng(seed);
  for (int t = 0; t < count; ++t) {
    const int max_y = h > tile ? h - tile : 0;
    const int max_x = w > tile ? w - tile : 0;
    const int y0 = int(rng.below(uint32_t(max_y + 1)));
    const int x0 = int(rng.below(uint32_t(max_x + 1)));
    uint8_t* dst = out + size_t(t) * tile * tile * 3;
    for (int y = 0; y < tile; ++y) {
      // reflect index for undersized images
      int sy = y0 + y;
      if (sy >= h) sy = h - 2 - (sy - h);
      if (sy < 0) sy = 0;
      const uint8_t* srow = img + (size_t(sy) * w) * 3;
      uint8_t* drow = dst + size_t(y) * tile * 3;
      if (x0 + tile <= w) {
        memcpy(drow, srow + size_t(x0) * 3, size_t(tile) * 3);
      } else {
        for (int x = 0; x < tile; ++x) {
          int sx = x0 + x;
          if (sx >= w) sx = w - 2 - (sx - w);
          if (sx < 0) sx = 0;
          memcpy(drow + size_t(x) * 3, srow + size_t(sx) * 3, 3);
        }
      }
    }
  }
  return SRIO_OK;
}

}  // extern "C"
