// Fast RGBA8 PNG encoder for the frame-dump path (SURVEY.md C10: the
// reference's engine-provided native IO becomes a small C++ runtime piece
// here; the Python writer in engine/io.py stays as the portable fallback).
//
// Build: volq/native/build.sh (g++ + zlib, no other deps).
// ABI: plain C functions consumed via ctypes — no pybind11 required.
//
// Encoding: filter 0 (None) + zlib level 6. Measured on real render
// content, deflate dominates the cost whatever the wrapper (Python's
// zlib is the same C library), and the None filter beats Up/Paeth on
// smooth volumetric gradients (horizontal runs compress better raw).
// This library therefore matches the Python fallback byte-for-byte in
// spirit; it exists as the native IO hook (framing + filtering outside
// the GIL) and the place a pigz-style parallel deflate would land.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char tag[4],
               const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t tag_pos = out.size();
  out.insert(out.end(), tag, tag + 4);
  if (len) out.insert(out.end(), data, data + len);
  uLong crc = crc32(0L, out.data() + tag_pos, static_cast<uInt>(len + 4));
  put_be32(out, static_cast<uint32_t>(crc));
}

}  // namespace

extern "C" {

// Encodes h*w RGBA8 pixels into a PNG. Returns the number of bytes
// written to *out (malloc'd; caller frees via fastpng_free), or -1.
long fastpng_encode(const uint8_t* rgba, int32_t w, int32_t h,
                    uint8_t** out) {
  if (!rgba || !out || w <= 0 || h <= 0) return -1;
  const size_t stride = static_cast<size_t>(w) * 4;

  // raw stream: one filter byte (0 = None) per scanline
  std::vector<uint8_t> raw;
  raw.resize((stride + 1) * h);
  uint8_t* p = raw.data();
  for (int32_t y = 0; y < h; ++y) {
    *p++ = 0;
    std::memcpy(p, rgba + y * stride, stride);
    p += stride;
  }

  uLongf comp_cap = compressBound(static_cast<uLong>(raw.size()));
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(),
                static_cast<uLong>(raw.size()), 6) != Z_OK) {
    return -1;
  }

  std::vector<uint8_t> png;
  png.reserve(comp_cap + 128);
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a,
                                 '\n'};
  png.insert(png.end(), sig, sig + 8);

  uint8_t ihdr[13];
  uint32_t wu = static_cast<uint32_t>(w), hu = static_cast<uint32_t>(h);
  ihdr[0] = wu >> 24; ihdr[1] = wu >> 16; ihdr[2] = wu >> 8; ihdr[3] = wu;
  ihdr[4] = hu >> 24; ihdr[5] = hu >> 16; ihdr[6] = hu >> 8; ihdr[7] = hu;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // color type RGBA
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", comp.data(), comp_cap);
  put_chunk(png, "IEND", nullptr, 0);

  uint8_t* buf = static_cast<uint8_t*>(malloc(png.size()));
  if (!buf) return -1;
  std::memcpy(buf, png.data(), png.size());
  *out = buf;
  return static_cast<long>(png.size());
}

void fastpng_free(uint8_t* p) { free(p); }

}  // extern "C"
