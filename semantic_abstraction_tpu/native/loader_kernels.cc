// Native host-side input-pipeline kernels.
//
// The reference feeds 8 GPUs at batch 1 from a python DataLoader doing
// 400k-of-1M weighted subsampling + fancy-indexed gathers per sample
// (reference: dataset.py:106-166, utils.py:506-520) — host-bound work the
// SURVEY flags as the input bottleneck for a TPU pod. These kernels give
// the loader a parallel native path (OpenMP when compiled with -fopenmp):
//
// - weighted sampling without replacement via Efraimidis-Spirakis
//   exponential keys + nth_element (distribution identical to sequential
//   weighted draws; uniforms supplied by the caller so numpy RandomState
//   determinism is preserved)
// - row gathers for float32 / int32 / uint8 matrices
// - axis-1 gathers for (P, N, C) stacked per-patch arrays
//
// Built as a tiny shared library via ctypes (no pybind11 in this image).
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// keys_i = -log(u_i) / w_i ; returns the k smallest-key indices in out_idx.
// Infeasible draws (fewer than k positive weights) return -1.
int weighted_sample_without_replacement(
    int64_t n, int64_t k, const double* weights, const double* uniforms,
    int64_t* out_idx) {
  if (k > n) return -1;
  int64_t positive = 0;
  std::vector<double> keys(n);
#pragma omp parallel for reduction(+ : positive) schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double w = weights[i];
    if (w > 0.0) {
      ++positive;
      // u in (0, 1]; -log(u) ~ Exp(1)
      const double u = uniforms[i] > 0.0 ? uniforms[i] : 1e-300;
      keys[i] = -std::log(u) / w;
    } else {
      keys[i] = HUGE_VAL;
    }
  }
  if (positive < k) return -1;
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), int64_t{0});
  std::nth_element(
      order.begin(), order.begin() + (k - 1), order.end(),
      [&keys](int64_t a, int64_t b) { return keys[a] < keys[b]; });
  std::memcpy(out_idx, order.data(), sizeof(int64_t) * k);
  return 0;
}

// inverse-CDF sampling with replacement; cdf is the inclusive prefix sum
// of the weights and draws are uniforms scaled by cdf[n-1] by the caller.
int weighted_sample_with_replacement(
    int64_t n, int64_t k, const double* cdf, const double* draws,
    int64_t* out_idx) {
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < k; ++j) {
    const double* hi = std::upper_bound(cdf, cdf + n, draws[j]);
    int64_t idx = static_cast<int64_t>(hi - cdf);
    out_idx[j] = idx < n ? idx : n - 1;
  }
  return 0;
}

#define DEFINE_GATHER_ROWS(suffix, T)                                      \
  int gather_rows_##suffix(int64_t n, int64_t d, int64_t k, const T* src,  \
                           const int64_t* idx, T* dst) {                   \
    _Pragma("omp parallel for schedule(static)")                           \
    for (int64_t j = 0; j < k; ++j) {                                      \
      const int64_t i = idx[j];                                            \
      if (i < 0 || i >= n) return -1;                                      \
      std::memcpy(dst + j * d, src + i * d, sizeof(T) * d);                \
    }                                                                      \
    return 0;                                                              \
  }

DEFINE_GATHER_ROWS(f32, float)
DEFINE_GATHER_ROWS(f64, double)
DEFINE_GATHER_ROWS(i32, int32_t)
DEFINE_GATHER_ROWS(i64, int64_t)
DEFINE_GATHER_ROWS(u8, uint8_t)

// (P, N, C) -> (P, K, C) gather along axis 1 with one shared index list.
int gather_axis1_f32(int64_t p, int64_t n, int64_t c, int64_t k,
                     const float* src, const int64_t* idx, float* dst) {
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t pi = 0; pi < p; ++pi) {
    for (int64_t j = 0; j < k; ++j) {
      const int64_t i = idx[j];
      if (i >= 0 && i < n) {
        std::memcpy(dst + (pi * k + j) * c, src + (pi * n + i) * c,
                    sizeof(float) * c);
      }
    }
  }
  return 0;
}

int omp_max_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
