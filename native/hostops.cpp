// Native host-side operators for the inference/finalize data path.
//
// The reference framework is pure Python and leans on numpy for its
// host-side hot loops (per-patch accumulation: reference inference.py:135-157;
// overlap averaging + quantization: inference.py:166-263). These are
// memory-bound loops over multi-GB volumes; this translation unit provides
// multithreaded C++ implementations exposed through a plain C ABI (consumed
// via ctypes — no pybind11 dependency).
//
// Build: make native   (g++ -O3 -shared -fPIC, OpenMP)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Simple parallel-for over [0, n) with hardware threads.
template <typename F>
void parallel_for(int64_t n, F&& fn, int64_t grain = 1 << 16) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(hw ? hw : 4, (n + grain - 1) / grain);
  if (n_threads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// sum[c, z, y, x] += pred[c, pz, py, px] (pre-weighted); cnt[z, y, x] += w.
// The slab is (C, SZ, SY, SX); the patch lands at (z0, y0, x0).
void accumulate_patch(float* sum, float* cnt, const float* pred,
                      const float* wmap, int64_t C, int64_t SZ, int64_t SY,
                      int64_t SX, int64_t PZ, int64_t PY, int64_t PX,
                      int64_t z0, int64_t y0, int64_t x0) {
  parallel_for(PZ * PY, [&](int64_t lo, int64_t hi) {
    for (int64_t zy = lo; zy < hi; ++zy) {
      int64_t pz = zy / PY, py = zy % PY;
      int64_t z = z0 + pz, y = y0 + py;
      float* cnt_row = cnt + (z * SY + y) * SX + x0;
      const float* w_row = wmap + (pz * PY + py) * PX;
      for (int64_t px = 0; px < PX; ++px) cnt_row[px] += w_row[px];
      for (int64_t c = 0; c < C; ++c) {
        float* sum_row = sum + ((c * SZ + z) * SY + y) * SX + x0;
        const float* p_row = pred + ((c * PZ + pz) * PY + py) * PX;
        for (int64_t px = 0; px < PX; ++px) sum_row[px] += p_row[px];
      }
    }
  }, /*grain=*/8);
}

// sum[c, i] /= cnt[i] where cnt[i] > 0 (overlap averaging,
// reference semantics: inference.py:207-210).
void finalize_average(float* sum, const float* cnt, int64_t C, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float c = cnt[i];
      if (c > 0.f) {
        float inv = 1.f / c;
        for (int64_t ch = 0; ch < C; ++ch) sum[ch * n + i] *= inv;
      }
    }
  });
}

// Renormalize 3-vectors to unit length where cnt > 0 (normals overlap
// resolution, reference semantics: inference.py:191-205; divisor is the
// true magnitude so Gaussian-weighted sums keep their exact direction).
void renormalize_vectors(float* sum, const float* cnt, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (cnt[i] <= 0.f) continue;
      float x = sum[i], y = sum[n + i], z = sum[2 * n + i];
      float mag = std::sqrt(x * x + y * y + z * z);
      if (mag < 1e-30f) mag = 1e-30f;
      float inv = 1.f / mag;
      sum[i] = x * inv;
      sum[n + i] = y * inv;
      sum[2 * n + i] = z * inv;
    }
  });
}

// [0,1] floats -> uint8 (reference: inference.py:258-261).
void quantize_u8(const float* in, uint8_t* out, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float v = in[i] * 255.f;
      v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
      out[i] = static_cast<uint8_t>(v);
    }
  });
}

// [-1,1] floats -> uint16 with the unified 32767.5 normals codec
// (encode: (v+1)*32767.5; SURVEY.md §2.6.8).
void encode_normals_u16(const float* in, uint16_t* out, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      float v = (in[i] + 1.f) * 32767.5f;
      v = v < 0.f ? 0.f : (v > 65535.f ? 65535.f : v);
      out[i] = static_cast<uint16_t>(v);
    }
  });
}

// uint8/uint16 -> [0,1] float32 (input normalization,
// reference: dataset.py:125-131).
void normalize_u8(const uint8_t* in, float* out, int64_t n) {
  constexpr float kInv = 1.f / 255.f;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = in[i] * kInv;
  });
}

void normalize_u16(const uint16_t* in, float* out, int64_t n) {
  constexpr float kInv = 1.f / 65535.f;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) out[i] = in[i] * kInv;
  });
}

int hostops_abi_version() { return 1; }

}  // extern "C"
