// Native asset-loading hot loops.
//
// The reference implements its entire loader in native code (Rust: the wad
// crate); the Python port keeps load-time semantics but its per-column
// picture decoding and per-pixel blitting loops dominate load time on real
// WADs (~2000 picture lumps in doom2.wad). This module provides C
// implementations, exposed through ctypes (tpu_doom/wad/_native.py) with a
// pure-Python fallback.
//
// Pixel format matches /root/reference/wad/src/image.rs: u16 texels, low
// byte = palette index, high bit set = transparent (0xFFFF decode blank,
// 0xFF00 canvas blank).

#include <cstdint>
#include <cstring>

extern "C" {

// Parse the picture header: whxy = [width, height, x_offset, y_offset].
// Returns 0 on success, <0 on corrupt input.
int picture_header(const uint8_t* buf, int64_t len, int32_t* whxy) {
  if (len < 8) return -1;
  const uint16_t w = static_cast<uint16_t>(buf[0] | (buf[1] << 8));
  const uint16_t h = static_cast<uint16_t>(buf[2] | (buf[3] << 8));
  if (w > 4096 || h > 4096) return -2;
  whxy[0] = w;
  whxy[1] = h;
  whxy[2] = static_cast<int16_t>(buf[4] | (buf[5] << 8));
  whxy[3] = static_cast<int16_t>(buf[6] | (buf[7] << 8));
  return 0;
}

// Decode the column-post RLE body into out (h x w u16, row-major),
// pre-filled by the caller is NOT required; fills blanks with 0xFFFF.
// Returns 0 on success, <0 on corrupt input (mirrors image.rs checks).
int decode_picture(const uint8_t* buf, int64_t len, uint16_t* out, int32_t w,
                   int32_t h) {
  if (len < 8 + 4 * static_cast<int64_t>(w)) return -1;
  for (int64_t i = 0; i < static_cast<int64_t>(w) * h; ++i) out[i] = 0xFFFF;
  for (int32_t col = 0; col < w; ++col) {
    const int64_t dir = 8 + 4 * static_cast<int64_t>(col);
    uint32_t off = static_cast<uint32_t>(buf[dir]) |
                   (static_cast<uint32_t>(buf[dir + 1]) << 8) |
                   (static_cast<uint32_t>(buf[dir + 2]) << 16) |
                   (static_cast<uint32_t>(buf[dir + 3]) << 24);
    if (off >= static_cast<uint64_t>(len)) return -3;
    for (;;) {
      if (off >= static_cast<uint64_t>(len)) return -4;
      const int row_start = buf[off];
      if (row_start == 255) break;
      if (off + 2 >= static_cast<uint64_t>(len)) return -5;
      const int run = buf[off + 1];
      if (row_start + run > h) return -6;
      const uint64_t data_start = off + 3;
      if (data_start + run + 1 > static_cast<uint64_t>(len)) return -7;
      for (int r = 0; r < run; ++r) {
        out[static_cast<int64_t>(row_start + r) * w + col] =
            buf[data_start + r];
      }
      off = static_cast<uint32_t>(data_start + run + 1);
    }
  }
  return 0;
}

// Blit src into dst at (ox, oy) with edge clipping; when
// ignore_transparency == 0, source texels with the high bit set are
// skipped (image.rs:171-252).
void blit_u16(uint16_t* dst, int32_t dw, int32_t dh, const uint16_t* src,
              int32_t sw, int32_t sh, int32_t ox, int32_t oy,
              int32_t ignore_transparency) {
  if (ox >= dw || oy >= dh) return;
  const int32_t x_start = ox < 0 ? -ox : 0;
  const int32_t y_start = oy < 0 ? -oy : 0;
  const int32_t x_end = (dw < sw + ox) ? dw - ox : sw;
  const int32_t y_end = (dh < sh + oy) ? dh - oy : sh;
  if (x_end <= x_start || y_end <= y_start) return;
  for (int32_t y = y_start; y < y_end; ++y) {
    const uint16_t* srow = src + static_cast<int64_t>(y) * sw;
    uint16_t* drow = dst + static_cast<int64_t>(y + oy) * dw + ox;
    if (ignore_transparency) {
      std::memcpy(drow + x_start, srow + x_start,
                  sizeof(uint16_t) * (x_end - x_start));
    } else {
      for (int32_t x = x_start; x < x_end; ++x) {
        const uint16_t s = srow[x];
        if (!(s & 0x8000)) drow[x] = s;
      }
    }
  }
}

}  // extern "C"
