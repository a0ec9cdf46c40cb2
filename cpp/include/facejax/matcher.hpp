// Vectorized cosine gallery matcher.
//
// Native rebuild of the reference's SSE matcher (Feature.hpp:273-392,
// SURVEY.md C18): `simd_dot` 4-wide SSE dot product + OpenMP argmax scan
// with a critical-section reduction. Here: AVX2+FMA 8-wide (guarded, with
// a scalar fallback), cached gallery norms (the reference caches
// `sqrt_simdot` per row), and an OpenMP scan using per-thread maxima
// reduced at the end — no critical section in the hot loop (the reference
// took a lock per candidate, Feature.hpp:365-372).

#pragma once

#include <cmath>
#include <cstddef>
#include <vector>

#if defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#define FACEJAX_HAVE_AVX2 1
#endif
#if defined(__AVX512F__)
#define FACEJAX_HAVE_AVX512 1
#endif

namespace facejax {

inline float Dot(const float* a, const float* b, int d) {
#ifdef FACEJAX_HAVE_AVX512
  // 16-wide with two accumulators: the fma latency chain (4-5 cycles)
  // otherwise caps a single-accumulator loop far below the 2/cycle fma
  // throughput the matcher scan can sustain from L2/LLC
  __m512 acc0 = _mm512_setzero_ps(), acc1 = _mm512_setzero_ps();
  int i = 0;
  for (; i + 32 <= d; i += 32) {
    acc0 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i), _mm512_loadu_ps(b + i),
                           acc0);
    acc1 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i + 16),
                           _mm512_loadu_ps(b + i + 16), acc1);
  }
  for (; i + 16 <= d; i += 16) {
    acc0 = _mm512_fmadd_ps(_mm512_loadu_ps(a + i), _mm512_loadu_ps(b + i),
                           acc0);
  }
  float sum = _mm512_reduce_add_ps(_mm512_add_ps(acc0, acc1));
  for (; i < d; ++i) sum += a[i] * b[i];
  return sum;
#elif defined(FACEJAX_HAVE_AVX2)
  __m256 acc = _mm256_setzero_ps();
  int i = 0;
  for (; i + 8 <= d; i += 8) {
    acc = _mm256_fmadd_ps(_mm256_loadu_ps(a + i), _mm256_loadu_ps(b + i), acc);
  }
  alignas(32) float lanes[8];
  _mm256_store_ps(lanes, acc);
  float sum = lanes[0] + lanes[1] + lanes[2] + lanes[3] + lanes[4] +
              lanes[5] + lanes[6] + lanes[7];
  for (; i < d; ++i) sum += a[i] * b[i];
  return sum;
#else
  float sum = 0.f;
  for (int i = 0; i < d; ++i) sum += a[i] * b[i];
  return sum;
#endif
}

inline float Norm(const float* a, int d) { return std::sqrt(Dot(a, a, d)); }

inline float Cosine(const float* a, const float* b, int d) {
  float na = Norm(a, d), nb = Norm(b, d);
  if (na == 0.f || nb == 0.f) return 0.f;
  return Dot(a, b, d) / (na * nb);
}

struct MatchResult {
  int index = -1;     // best row, -1 if gallery empty or below threshold
  float similarity = -2.f;
};

// Scan a row-major [n x d] gallery for the best cosine match to `query`.
// `norms` may be null (computed on the fly); `sim_th` filters the result
// (reference Compare_Face_From_DB threshold semantics, Feature.hpp:295-343).
inline MatchResult MatchGallery(const float* gallery, const float* norms,
                                int n, int d, const float* query,
                                float sim_th) {
  MatchResult best;
  if (n <= 0) return best;
  float qn = Norm(query, d);
  if (qn == 0.f) return best;

  int best_i = -1;
  float best_s = -2.f;
#pragma omp parallel
  {
    int local_i = -1;
    float local_s = -2.f;
#pragma omp for nowait
    for (int i = 0; i < n; ++i) {
      const float* row = gallery + static_cast<size_t>(i) * d;
      float rn = norms ? norms[i] : Norm(row, d);
      if (rn == 0.f) continue;
      float s = Dot(row, query, d) / (rn * qn);
      if (std::isnan(s)) continue;  // reference NaN guard, Feature.hpp:312
      if (s > local_s) {
        local_s = s;
        local_i = i;
      }
    }
#pragma omp critical
    {
      if (local_s > best_s) {
        best_s = local_s;
        best_i = local_i;
      }
    }
  }
  if (best_i >= 0 && best_s >= sim_th) {
    best.index = best_i;
    best.similarity = best_s;
  } else if (best_i >= 0) {
    best.similarity = best_s;  // report sub-threshold best for diagnostics
  }
  return best;
}

// Precompute row norms for a gallery (cached `sqrt_simdot`).
inline std::vector<float> GalleryNorms(const float* gallery, int n, int d) {
  std::vector<float> norms(static_cast<size_t>(n));
#pragma omp parallel for
  for (int i = 0; i < n; ++i) {
    norms[static_cast<size_t>(i)] =
        Norm(gallery + static_cast<size_t>(i) * d, d);
  }
  return norms;
}

}  // namespace facejax
