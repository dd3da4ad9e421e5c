// fastio — native ingest for the PIV frame stream.
//
// The throughput target (4,000 x 4 MP pairs < 60 s) needs ~0.5 GB/s of
// sustained read+decode; Python-side decoding holds the GIL and caps the
// prefetcher's thread pool.  This library does batched file read + 8-bit
// BMP decode in C++ threads into a caller-provided contiguous buffer.
// (The reference has no native layer at all — its GPU "native" path is
// torch's kernels; this is the ingest half of the TPU rebuild's runtime.)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libfastio.so fastio.cpp -lpthread
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
inline int32_t rd_i32(const uint8_t* p) { return static_cast<int32_t>(rd_u32(p)); }
inline uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

// Decode an 8-bit uncompressed BMP with a grayscale palette into out[H*W].
// Returns 0 on success, negative error codes otherwise.
int decode_bmp8_into(const uint8_t* buf, int64_t len, uint8_t* out, int64_t H,
                     int64_t W) {
  if (len < 54 || buf[0] != 'B' || buf[1] != 'M') return -1;
  const uint32_t data_offset = rd_u32(buf + 10);
  const uint32_t dib = rd_u32(buf + 14);
  if (dib < 40) return -2;
  const int32_t width = rd_i32(buf + 18);
  const int32_t height = rd_i32(buf + 22);
  const uint16_t bpp = rd_u16(buf + 28);
  const uint32_t compression = rd_u32(buf + 30);
  if (bpp != 8 || compression != 0 || width <= 0) return -3;
  const int64_t h = height > 0 ? height : -static_cast<int64_t>(height);
  if (width != W || h != H) return -4;
  // palette: must be a gray ramp (identity not required; apply the ramp).
  // Bounds-check against the actual file length first — dib and data_offset
  // are both file-controlled, so comparing them only against each other
  // would allow an out-of-bounds read on a corrupt header.
  if (14 + static_cast<uint64_t>(dib) + 1024 > static_cast<uint64_t>(len) ||
      data_offset > static_cast<uint64_t>(len))
    return -5;
  const uint8_t* pal = buf + 14 + dib;
  if (pal + 1024 > buf + data_offset) return -5;
  uint8_t ramp[256];
  bool identity = true;
  for (int i = 0; i < 256; ++i) {
    const uint8_t b = pal[4 * i], g = pal[4 * i + 1], r = pal[4 * i + 2];
    if (b != g || g != r) return -6;  // not grayscale
    ramp[i] = b;
    identity &= (b == i);
  }
  const int64_t stride = (W + 3) & ~int64_t(3);
  if (data_offset + stride * H > static_cast<uint64_t>(len)) return -7;
  const bool flip = height > 0;  // bottom-up rows
  for (int64_t r = 0; r < H; ++r) {
    const uint8_t* src = buf + data_offset + stride * (flip ? (H - 1 - r) : r);
    uint8_t* dst = out + r * W;
    if (identity) {
      std::memcpy(dst, src, static_cast<size_t>(W));
    } else {
      for (int64_t c = 0; c < W; ++c) dst[c] = ramp[src[c]];
    }
  }
  return 0;
}

int read_decode_one(const char* path, uint8_t* out, int64_t H, int64_t W,
                    std::vector<uint8_t>& scratch) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size <= 0) {
    std::fclose(f);
    return -11;
  }
  scratch.resize(static_cast<size_t>(size));
  const size_t got = std::fread(scratch.data(), 1, scratch.size(), f);
  std::fclose(f);
  if (got != scratch.size()) return -12;
  return decode_bmp8_into(scratch.data(), static_cast<int64_t>(got), out, H, W);
}

}  // namespace

extern "C" {

// Probe one file: returns 0 if this library can decode it, else error code.
// On success writes height/width to dims[0..1].
int fastio_probe_bmp8(const char* path, int64_t* dims) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  uint8_t hdr[54];
  const size_t got = std::fread(hdr, 1, sizeof(hdr), f);
  std::fclose(f);
  if (got != sizeof(hdr) || hdr[0] != 'B' || hdr[1] != 'M') return -1;
  const uint16_t bpp = rd_u16(hdr + 28);
  const uint32_t compression = rd_u32(hdr + 30);
  if (bpp != 8 || compression != 0) return -3;
  const int32_t width = rd_i32(hdr + 18);
  const int32_t height = rd_i32(hdr + 22);
  dims[0] = height > 0 ? height : -static_cast<int64_t>(height);
  dims[1] = width;
  return 0;
}

// Batched read+decode: n files -> out[n, H, W] uint8 (caller-allocated),
// status[n] per-file error codes (0 = ok).  Runs on `threads` C++ threads
// with the GIL released by the ctypes caller.
void fastio_read_batch(const char** paths, int64_t n, uint8_t* out, int64_t H,
                       int64_t W, int32_t threads, int32_t* status) {
  if (threads < 1) threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<uint8_t> scratch;
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n) return;
      status[i] = read_decode_one(paths[i], out + i * H * W, H, W, scratch);
    }
  };
  std::vector<std::thread> pool;
  const int nt = static_cast<int>(threads < n ? threads : n);
  pool.reserve(static_cast<size_t>(nt));
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
