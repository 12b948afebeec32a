// housescan-tpu native runtime helpers.
//
// The TPU compute path is JAX/Pallas; this library covers the host-side
// hot loops around it, the way the reference leaned on native code for
// its runtime (PCL tools, GSL, pcd-loader — SURVEY.md section 2b):
//
//   * parse_ascii_floats  — whitespace-separated float parsing for ascii
//     .pcd / planes.txt / .xf (10-40x faster than Python tokenization on
//     multi-million-point clouds)
//   * decode_u16_depth    — uint16-millimeter -> float32-meter frame
//     decode (the Kinect wire format), multithreaded
//   * transform_points    — 4x4 row-vector point transform for export
//     paths that never touch the device
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Parse up to max_out whitespace-separated floats from buf[0..len).
// Returns the number parsed, or (size_t)-1 on malformed input
// (a non-numeric, non-whitespace token).
size_t parse_ascii_floats(const char* buf, size_t len, float* out,
                          size_t max_out) {
  const char* p = buf;
  const char* end = buf + len;
  size_t n = 0;
  while (p < end && n < max_out) {
    // skip whitespace
    while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
      ++p;
    if (p >= end) break;
    if (*p == '#') {  // comment to end of line
      while (p < end && *p != '\n') ++p;
      continue;
    }
    char* next = nullptr;
    float v = strtof(p, &next);
    if (next == p) return (size_t)-1;  // malformed token
    out[n++] = v;
    p = next;
  }
  return n;
}

static void decode_span(const uint16_t* in, float* out, size_t begin,
                        size_t endi, float scale) {
  for (size_t i = begin; i < endi; ++i) out[i] = (float)in[i] * scale;
}

// uint16 -> float32 with scale, using up to n_threads workers.
void decode_u16_depth(const uint16_t* in, float* out, size_t n, float scale,
                      int n_threads) {
  if (n_threads <= 1 || n < (size_t)1 << 16) {
    decode_span(in, out, 0, n, scale);
    return;
  }
  std::vector<std::thread> ts;
  size_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    size_t b = (size_t)t * chunk;
    size_t e = b + chunk < n ? b + chunk : n;
    if (b >= e) break;
    ts.emplace_back(decode_span, in, out, b, e, scale);
  }
  for (auto& t : ts) t.join();
}

// points (n,3) row-vector transform: out = p @ m[:3,:3] + m[3,:3];
// m is 16 floats, row-major, translation in the last ROW (the package
// convention).
void transform_points(const float* pts, size_t n, const float* m,
                      float* out) {
  for (size_t i = 0; i < n; ++i) {
    const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    out[3 * i] = x * m[0] + y * m[4] + z * m[8] + m[12];
    out[3 * i + 1] = x * m[1] + y * m[5] + z * m[9] + m[13];
    out[3 * i + 2] = x * m[2] + y * m[6] + z * m[10] + m[14];
  }
}

// LZF stream codec (the algorithm PCL uses for DATA binary_compressed
// .pcd payloads; ref Main.hs:1320-1345 loads such exports via PCL).
// Stream grammar: a control byte c < 0x20 introduces a literal run of
// c+1 bytes; otherwise a back-reference of length (c >> 5) + 2 (with
// an extension byte when c >> 5 == 7) at distance
// ((c & 0x1f) << 8 | next) + 1. Returns 0 on malformed/overflowing
// input (the Python caller raises).
size_t lzf_decompress(const unsigned char* in, size_t in_len,
                      unsigned char* out, size_t out_len) {
  size_t ip = 0, op = 0;
  while (ip < in_len) {
    unsigned int ctrl = in[ip++];
    if (ctrl < 0x20) {  // literal run
      size_t run = ctrl + 1;
      if (ip + run > in_len || op + run > out_len) return 0;
      for (size_t i = 0; i < run; ++i) out[op++] = in[ip++];
    } else {  // back reference
      size_t len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return 0;
        len += in[ip++];
      }
      len += 2;
      if (ip >= in_len) return 0;
      size_t dist = ((ctrl & 0x1f) << 8 | in[ip++]) + 1;
      if (dist > op || op + len > out_len) return 0;
      const unsigned char* ref = out + op - dist;
      for (size_t i = 0; i < len; ++i) out[op++] = *ref++;  // may overlap
    }
  }
  return op;
}

// Greedy hash-chain LZF compressor (libLZF-style 3-byte hashing).
// Worst case output is in_len + in_len/32 + 16; the caller must size
// `out` accordingly. Returns the compressed size, or 0 if out_cap is
// too small.
size_t lzf_compress(const unsigned char* in, size_t in_len,
                    unsigned char* out, size_t out_cap) {
  const size_t HSIZE = 1 << 14;
  std::vector<size_t> htab(HSIZE, (size_t)-1);
  size_t ip = 0, op = 0;
  size_t lit_start = 0;  // start of the pending literal run

  auto flush_literals = [&](size_t end) -> bool {
    size_t i = lit_start;
    while (i < end) {
      size_t run = end - i;
      if (run > 32) run = 32;
      if (op + 1 + run > out_cap) return false;
      out[op++] = (unsigned char)(run - 1);
      for (size_t k = 0; k < run; ++k) out[op++] = in[i++];
    }
    return true;
  };

  while (ip + 2 < in_len) {
    unsigned int h =
        (((unsigned int)in[ip] << 10) ^ ((unsigned int)in[ip + 1] << 5) ^
         (unsigned int)in[ip + 2]) &
        (HSIZE - 1);
    size_t ref = htab[h];
    htab[h] = ip;
    if (ref != (size_t)-1 && ip - ref <= 0x2000 && ref + 2 < in_len &&
        in[ref] == in[ip] && in[ref + 1] == in[ip + 1] &&
        in[ref + 2] == in[ip + 2]) {
      // extend the match; LZF length field caps at 7 + 255 + 2 = 264
      size_t maxlen = in_len - ip;
      if (maxlen > 264) maxlen = 264;
      size_t len = 3;
      while (len < maxlen && in[ref + len] == in[ip + len]) ++len;
      if (!flush_literals(ip)) return 0;
      size_t dist = ip - ref - 1;
      size_t lcode = len - 2;
      if (lcode < 7) {
        if (op + 2 > out_cap) return 0;
        out[op++] = (unsigned char)((lcode << 5) | (dist >> 8));
        out[op++] = (unsigned char)(dist & 0xff);
      } else {
        if (op + 3 > out_cap) return 0;
        out[op++] = (unsigned char)((7u << 5) | (dist >> 8));
        out[op++] = (unsigned char)(lcode - 7);
        out[op++] = (unsigned char)(dist & 0xff);
      }
      ip += len;
      lit_start = ip;
    } else {
      ++ip;
    }
  }
  if (!flush_literals(in_len)) return 0;
  return op;
}

}  // extern "C"
