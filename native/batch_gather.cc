// Native batch assembler for the host-streaming training path.
//
// The streaming trainer gathers `batch_size` rows (each `row_elems` floats;
// ~19M floats/row at flagship scale) out of a host-resident [N, T*nodes]
// array every step.  numpy fancy indexing does this single-threaded in f32;
// this library does it multi-threaded and optionally converts to bfloat16
// in the same pass (round-to-nearest-even), halving the bytes shipped to
// the device.
//
// C ABI only — bound from Python via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, sizeof(x));
  // Quiet NaNs stay NaNs.
  if ((x & 0x7fffffffu) > 0x7f800000u) {
    return static_cast<uint16_t>((x >> 16) | 0x0040u);
  }
  // Round to nearest even.
  const uint32_t lsb = (x >> 16) & 1u;
  x += 0x7fffu + lsb;
  return static_cast<uint16_t>(x >> 16);
}

template <typename Fn>
void parallel_rows(int64_t n_rows, int n_threads, Fn&& fn) {
  if (n_threads <= 1 || n_rows <= 1) {
    for (int64_t i = 0; i < n_rows; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  const int64_t chunk = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(lo + chunk, n_rows);
    if (lo >= hi) break;
    threads.emplace_back([lo, hi, &fn] {
      for (int64_t i = lo; i < hi; ++i) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// dst[i, :] = src[indices[i], :]   (f32 -> f32 memcpy)
void sgvae_gather_rows_f32(const float* src, int64_t row_elems,
                           const int64_t* indices, int64_t n_idx, float* dst,
                           int n_threads) {
  parallel_rows(n_idx, n_threads, [=](int64_t i) {
    std::memcpy(dst + i * row_elems, src + indices[i] * row_elems,
                static_cast<size_t>(row_elems) * sizeof(float));
  });
}

// dst[i, :] = bf16(src[indices[i], :])   (fused gather + downcast)
void sgvae_gather_rows_f32_bf16(const float* src, int64_t row_elems,
                                const int64_t* indices, int64_t n_idx,
                                uint16_t* dst, int n_threads) {
  parallel_rows(n_idx, n_threads, [=](int64_t i) {
    const float* s = src + indices[i] * row_elems;
    uint16_t* d = dst + i * row_elems;
    for (int64_t j = 0; j < row_elems; ++j) d[j] = f32_to_bf16(s[j]);
  });
}

// In-place affine transform rows: x = x * scale[j] + min[j]  (the min-max
// scaler applied at data-prep time, multi-threaded over rows).
void sgvae_affine_rows_f32(float* data, int64_t n_rows, int64_t row_elems,
                           const float* scale, const float* minv,
                           int n_threads) {
  parallel_rows(n_rows, n_threads, [=](int64_t i) {
    float* row = data + i * row_elems;
    for (int64_t j = 0; j < row_elems; ++j) {
      row[j] = row[j] * scale[j] + minv[j];
    }
  });
}

}  // extern "C"
