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

}  // extern "C"
