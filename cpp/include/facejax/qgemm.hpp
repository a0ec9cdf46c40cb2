// Int8 quantized GEMM for the native serving forward.
//
// Production-serving speed path for hosts without a TPU attached: the f32
// AVX2 kernel in efmnet.hpp is FMA-port-bound, so halving arithmetic width
// only helps if the integer units do more MACs per instruction. AVX2's
// `vpmaddubsw` (u8 x s8 -> i16 pairs) + `vpmaddwd` (i16 pairs -> i32) give
// 32 MACs per two instructions vs the FMA's 8 — the classic pre-VNNI int8
// sequence (oneDNN/FBGEMM use the same one).
//
// Quantization scheme (chosen so i16 saturation is IMPOSSIBLE, not just
// unlikely — `vpmaddubsw` saturates silently and would corrupt embeddings):
//   - weights: per-output-channel symmetric int8 clamped to [-63, 63]
//     (scale_j = max|w[:,j]| / 63). 255 * 63 + 255 * 63 = 32130 < 32767,
//     so the two-product i16 partial sum can never saturate.
//   - activations: per-tensor dynamic u8 with zero point 128
//     (a_u8 = round(a / s_a) + 128); the 128 offset is removed exactly via
//     the precomputed per-channel weight column sums.
//   - accumulation: i32; dequantized as
//     out[j] = (acc - 128 * colsum[j]) * s_a * scale[j] + bias[j].
//
// Weight layout is VNNI-style [K/4][N][4] (4 consecutive k bytes per
// output channel) so one 32-byte load covers 8 output channels x 4 depths,
// and `vpmaddwd`'s adjacent-pair sums land on the SAME output channel.
//
// Reference parity anchor: this accelerates the Feature.hpp:163-205
// in-process embedding role; the reference had no quantized path at all.

#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <vector>

#if defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#endif

// AVX512-VNNI upgrade: `vpdpbusd` fuses the maddubs+maddwd+add triple into
// ONE u8 x s8 -> i32 instruction (no i16 intermediate at all, so the
// [-63, 63] clamp stays only for cross-path output parity, not for
// saturation safety). Same packed layout; the kernel structure below is
// shared and only the 8-lane MAC differs.
#if defined(__AVX512VNNI__) && defined(__AVX512VL__)
#define FACEJAX_DPBUSD(acc, av, bv) acc = _mm256_dpbusd_epi32(acc, av, bv)
#elif defined(__AVX2__) && defined(__FMA__)
#define FACEJAX_DPBUSD(acc, av, bv) \
  acc = _mm256_add_epi32(           \
      acc, _mm256_madd_epi16(_mm256_maddubs_epi16(av, bv), ones))
#endif

namespace facejax {
namespace nn {

struct QuantizedKernel {
  int k = 0;                   // logical contraction depth
  int n = 0;                   // output channels
  int kp = 0;                  // k padded to a multiple of 4
  int np = 0;                  // n padded to a multiple of 8
  std::vector<int8_t> packed;  // [kp/4][np][4]
  std::vector<int32_t> colsum; // per REAL output channel: sum_k w_q[k][j]
  std::vector<float> scale;    // per REAL output channel
};

// w: row-major [k][n] float32 (the .npz conv/dense kernel layout after
// flattening KH*KW*Cin).
inline void QuantizeKernel(const float* w, int k, int n, QuantizedKernel& q) {
  q.k = k;
  q.n = n;
  q.kp = (k + 3) / 4 * 4;
  q.np = (n + 7) / 8 * 8;
  q.packed.assign(static_cast<size_t>(q.kp / 4) * q.np * 4, 0);
  q.colsum.assign(n, 0);
  q.scale.assign(n, 1.0f);
  for (int j = 0; j < n; ++j) {
    float maxabs = 0.0f;
    for (int kk = 0; kk < k; ++kk)
      maxabs = std::max(maxabs, std::fabs(w[static_cast<size_t>(kk) * n + j]));
    const float s = maxabs > 0.0f ? maxabs / 63.0f : 1.0f;
    q.scale[j] = s;
    int32_t cs = 0;
    for (int kk = 0; kk < k; ++kk) {
      int v = static_cast<int>(
          std::lround(w[static_cast<size_t>(kk) * n + j] / s));
      v = std::max(-63, std::min(63, v));
      cs += v;
      q.packed[(static_cast<size_t>(kk / 4) * q.np + j) * 4 + kk % 4] =
          static_cast<int8_t>(v);
    }
    q.colsum[j] = cs;
  }
}

// a: n contiguous float32 -> u8 zero-point-128 with one dynamic per-tensor
// scale. Quantizing the WHOLE tensor once (before im2col) keeps the
// rounding pass O(HWC) instead of O(HW * KH*KW*C), and the subsequent
// im2col moves bytes, not floats. lrintf compiles to cvtss2si at -O3 — no
// libm round call in the hot loop.
inline void QuantizeTensorU8(const float* a, size_t n, uint8_t* out,
                             float& scale_out) {
  float maxabs = 0.0f;
  for (size_t i = 0; i < n; ++i)
    maxabs = std::max(maxabs, std::fabs(a[i]));
  const float s = maxabs > 0.0f ? maxabs / 127.0f : 1.0f;
  const float inv = 1.0f / s;
  scale_out = s;
#pragma omp parallel for schedule(static)
  for (long long i = 0; i < static_cast<long long>(n); ++i) {
    int v = static_cast<int>(lrintf(a[i] * inv));
    v = std::max(-127, std::min(127, v));
    out[i] = static_cast<uint8_t>(v + 128);
  }
}

// a: [m][k] float32 -> out: [m][kp] u8 zero-point-128 rows (pad bytes 128);
// one dynamic per-tensor scale. out must hold m * kp bytes. (Row-padded
// form used by dense layers and tests; convs go through QuantizeTensorU8 +
// a u8 im2col instead.)
inline void QuantizeActivations(const float* a, int m, int k, int kp,
                                uint8_t* out, float& scale_out) {
  std::vector<uint8_t> q(static_cast<size_t>(m) * k);
  QuantizeTensorU8(a, q.size(), q.data(), scale_out);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < m; ++i) {
    uint8_t* orow = out + static_cast<size_t>(i) * kp;
    std::memcpy(orow, q.data() + static_cast<size_t>(i) * k, k);
    for (int kk = k; kk < kp; ++kk) orow[kk] = 128;  // a_q = 0 (w is 0 too)
  }
}

// out[m][n] = dequant(a_u8[m][kp] @ packed) + bias; a_scale from
// QuantizeActivations. The microkernel processes one MR=4-row tile from
// row POINTERS, so the same code serves both the materialized-patches
// QGemm and the tile-fused QGemmFused (patch rows staged in an
// L1-resident per-thread buffer; the [m, kp] im2col matrix never exists
// in memory — the int8 conv path's dominant traffic per the round-4
// finding that MAC width stopped mattering).
constexpr int kQGemmMR = 4;

#if defined(__AVX512VNNI__) && defined(__AVX512BW__)
// Full-width VNNI: one masked zmm load covers 16 output channels x 4
// depths, one vpdpbusd per row accumulates 64 u8 x s8 MACs into 16 i32
// lanes (np stays a multiple of 8; the odd half-tile is a byte mask).
inline void QGemmTile(const uint8_t* const ar[kQGemmMR], int mr, int i0,
                      float a_scale, const QuantizedKernel& q,
                      const float* bias, float* out) {
  const int n = q.n, np = q.np, kg = q.kp / 4;
  for (int j0 = 0; j0 < np; j0 += 16) {
    const int jrem = np - j0;  // multiple of 8
    const __mmask64 bm = jrem >= 16 ? ~0ULL : ((1ULL << (jrem * 4)) - 1);
    __m512i c0 = _mm512_setzero_si512();
    __m512i c1 = _mm512_setzero_si512();
    __m512i c2 = _mm512_setzero_si512();
    __m512i c3 = _mm512_setzero_si512();
    for (int g = 0; g < kg; ++g) {
      const int8_t* bp =
          q.packed.data() + (static_cast<size_t>(g) * np + j0) * 4;
      const __m512i bv = _mm512_maskz_loadu_epi8(bm, bp);
      int a0i, a1i, a2i, a3i;
      std::memcpy(&a0i, ar[0] + 4 * g, 4);
      std::memcpy(&a1i, ar[1] + 4 * g, 4);
      std::memcpy(&a2i, ar[2] + 4 * g, 4);
      std::memcpy(&a3i, ar[3] + 4 * g, 4);
      c0 = _mm512_dpbusd_epi32(c0, _mm512_set1_epi32(a0i), bv);
      c1 = _mm512_dpbusd_epi32(c1, _mm512_set1_epi32(a1i), bv);
      c2 = _mm512_dpbusd_epi32(c2, _mm512_set1_epi32(a2i), bv);
      c3 = _mm512_dpbusd_epi32(c3, _mm512_set1_epi32(a3i), bv);
    }
    alignas(64) int32_t acc[kQGemmMR][16];
    _mm512_store_si512(reinterpret_cast<__m512i*>(acc[0]), c0);
    _mm512_store_si512(reinterpret_cast<__m512i*>(acc[1]), c1);
    _mm512_store_si512(reinterpret_cast<__m512i*>(acc[2]), c2);
    _mm512_store_si512(reinterpret_cast<__m512i*>(acc[3]), c3);
    const int jend = std::min(j0 + 16, n);
    for (int r = 0; r < mr; ++r) {
      float* orow = out + static_cast<size_t>(i0 + r) * n;
      for (int j = j0; j < jend; ++j) {
        const int32_t true_acc = acc[r][j - j0] - 128 * q.colsum[j];
        orow[j] = static_cast<float>(true_acc) * a_scale * q.scale[j] +
                  (bias ? bias[j] : 0.0f);
      }
    }
  }
}
#elif defined(__AVX2__) && defined(__FMA__)
inline void QGemmTile(const uint8_t* const ar[kQGemmMR], int mr, int i0,
                      float a_scale, const QuantizedKernel& q,
                      const float* bias, float* out) {
  const int n = q.n, np = q.np, kg = q.kp / 4;
#if !(defined(__AVX512VNNI__) && defined(__AVX512VL__))
  const __m256i ones = _mm256_set1_epi16(1);
#endif
  for (int j0 = 0; j0 < np; j0 += 16) {
    // last tile of odd-np (np % 16 == 8): single 8-wide pass
    const bool two = j0 + 16 <= np;
    __m256i c00 = _mm256_setzero_si256(), c01 = _mm256_setzero_si256();
    __m256i c10 = _mm256_setzero_si256(), c11 = _mm256_setzero_si256();
    __m256i c20 = _mm256_setzero_si256(), c21 = _mm256_setzero_si256();
    __m256i c30 = _mm256_setzero_si256(), c31 = _mm256_setzero_si256();
    for (int g = 0; g < kg; ++g) {
      const int8_t* bp =
          q.packed.data() + (static_cast<size_t>(g) * np + j0) * 4;
      const __m256i b0 =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(bp));
      __m256i b1 = _mm256_setzero_si256();
      if (two)
        b1 = _mm256_loadu_si256(reinterpret_cast<const __m256i*>(bp + 32));
      int a0i, a1i, a2i, a3i;
      std::memcpy(&a0i, ar[0] + 4 * g, 4);
      std::memcpy(&a1i, ar[1] + 4 * g, 4);
      std::memcpy(&a2i, ar[2] + 4 * g, 4);
      std::memcpy(&a3i, ar[3] + 4 * g, 4);
      const __m256i av0 = _mm256_set1_epi32(a0i);
      const __m256i av1 = _mm256_set1_epi32(a1i);
      const __m256i av2 = _mm256_set1_epi32(a2i);
      const __m256i av3 = _mm256_set1_epi32(a3i);
      FACEJAX_DPBUSD(c00, av0, b0);
      FACEJAX_DPBUSD(c10, av1, b0);
      FACEJAX_DPBUSD(c20, av2, b0);
      FACEJAX_DPBUSD(c30, av3, b0);
      if (two) {
        FACEJAX_DPBUSD(c01, av0, b1);
        FACEJAX_DPBUSD(c11, av1, b1);
        FACEJAX_DPBUSD(c21, av2, b1);
        FACEJAX_DPBUSD(c31, av3, b1);
      }
    }
    alignas(32) int32_t acc[kQGemmMR][16];
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[0][0]), c00);
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[0][8]), c01);
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[1][0]), c10);
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[1][8]), c11);
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[2][0]), c20);
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[2][8]), c21);
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[3][0]), c30);
    _mm256_store_si256(reinterpret_cast<__m256i*>(&acc[3][8]), c31);
    const int jend = std::min(two ? j0 + 16 : j0 + 8, n);
    for (int r = 0; r < mr; ++r) {
      float* orow = out + static_cast<size_t>(i0 + r) * n;
      for (int j = j0; j < jend; ++j) {
        const int32_t true_acc = acc[r][j - j0] - 128 * q.colsum[j];
        orow[j] = static_cast<float>(true_acc) * a_scale * q.scale[j] +
                  (bias ? bias[j] : 0.0f);
      }
    }
  }
}
#else
inline void QGemmTile(const uint8_t* const ar[kQGemmMR], int mr, int i0,
                      float a_scale, const QuantizedKernel& q,
                      const float* bias, float* out) {
  const int n = q.n, np = q.np, kg = q.kp / 4;
  for (int r = 0; r < mr; ++r) {
    const uint8_t* arow = ar[r];
    float* orow = out + static_cast<size_t>(i0 + r) * n;
    for (int j = 0; j < n; ++j) {
      int32_t acc = 0;
      for (int g = 0; g < kg; ++g) {
        const int8_t* bp =
            q.packed.data() + (static_cast<size_t>(g) * np + j) * 4;
        for (int t = 0; t < 4; ++t)
          acc += static_cast<int32_t>(arow[4 * g + t]) * bp[t];
      }
      acc -= 128 * q.colsum[j];
      orow[j] = static_cast<float>(acc) * a_scale * q.scale[j] +
                (bias ? bias[j] : 0.0f);
    }
  }
}
#endif

inline void QGemm(const uint8_t* a, float a_scale, int m,
                  const QuantizedKernel& q, const float* bias,
                  std::vector<float>& out) {
  out.resize(static_cast<size_t>(m) * q.n);
#pragma omp parallel for schedule(static)
  for (int i0 = 0; i0 < m; i0 += kQGemmMR) {
    const uint8_t* ar[kQGemmMR];
    for (int r = 0; r < kQGemmMR; ++r)
      ar[r] = a + static_cast<size_t>(std::min(i0 + r, m - 1)) * q.kp;
    QGemmTile(ar, std::min(kQGemmMR, m - i0), i0, a_scale, q, bias,
              out.data());
  }
}

// Tile-fused im2col + GEMM: `fill(i, dst)` writes patch row i (kp bytes,
// incl. 128-padding) into an L1-resident per-thread staging buffer right
// before the microkernel consumes it — the [m, kp] patch matrix never
// round-trips DRAM.
template <typename FillRow>
inline void QGemmFused(FillRow fill, float a_scale, int m,
                       const QuantizedKernel& q, const float* bias,
                       std::vector<float>& out) {
  const int kp = q.kp;
  out.resize(static_cast<size_t>(m) * q.n);
#pragma omp parallel
  {
    std::vector<uint8_t> abuf(static_cast<size_t>(kQGemmMR) * kp);
    const uint8_t* ar[kQGemmMR];
    for (int r = 0; r < kQGemmMR; ++r)
      ar[r] = abuf.data() + static_cast<size_t>(r) * kp;
#pragma omp for schedule(static)
    for (int i0 = 0; i0 < m; i0 += kQGemmMR) {
      const int mr = std::min(kQGemmMR, m - i0);
      for (int r = 0; r < kQGemmMR; ++r)
        fill(std::min(i0 + r, m - 1),
             abuf.data() + static_cast<size_t>(r) * kp);
      QGemmTile(ar, mr, i0, a_scale, q, bias, out.data());
    }
  }
}

}  // namespace nn
}  // namespace facejax
