// Native EFMNet342 forward — the in-process embedding engine the export
// format promised (reference parity: the C++ runtime runs the embedding net
// itself via MXPredCreatePartialOut, Feature.hpp:163-205; here the net is
// the 342-d EFM symbol ladder, efm_symbol.py:22-110, executed from
// weights.npz with zero Python in the loop).
//
// Layout notes (must mirror the flax model exactly, models/efm_symbol.py):
//   - activations NHWC; conv kernels [KH, KW, Cin, Cout]; dense [In, Out]
//   - efm3: split channels in 3, concat(max3, min3) => C -> 2C/3
//   - all convs SAME padding stride 1; pools 2x2/2; flatten is NHWC order
// Convs run as im2col + a small OpenMP/FMA GEMM — single-frame serving
// latency, not throughput, is the target (the TPU path owns bulk work).

#pragma once

#include <algorithm>
#include <cmath>
#if defined(__AVX2__) && defined(__FMA__)
#include <immintrin.h>
#endif
#include <cstdint>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

#include "facejax/npz.hpp"
#include "facejax/qgemm.hpp"

namespace facejax {

struct Tensor {
  int h = 0, w = 0, c = 0;      // NHWC with N == 1
  std::vector<float> data;

  void resize(int h_, int w_, int c_) {
    h = h_;
    w = w_;
    c = c_;
    data.assign(static_cast<size_t>(h) * w * c, 0.0f);
  }
  float& at(int y, int x, int ch) {
    return data[(static_cast<size_t>(y) * w + x) * c + ch];
  }
  float at(int y, int x, int ch) const {
    return data[(static_cast<size_t>(y) * w + x) * c + ch];
  }
};

namespace nn {

// out[M,N] = patches[M,K] @ kernel[K,N] + bias[N]
//
// AVX2 micro-kernel: 6x16 accumulator tile held in 12 ymm registers; per k
// step 2 B loads + 6 A broadcasts + 12 FMAs (FMA-port-bound, not
// load-bound). The naive rank-1-update form measured ~17 GF/s single-core;
// a plain-C register tile spilled to stack (3x slower); this intrinsics
// version measures 31 GF/s on the EFMNet342 forward (2x end-to-end).
// Scalar fallback when AVX2/FMA is unavailable.
#if defined(__AVX512F__)
// AVX-512 variant: same 6-row structure at double width (6x32 tile in 12
// zmm; per k step 2 B loads + 6 broadcasts + 12 FMAs). Mask registers
// subsume the N-remainder handling — every tile runs the same code with
// (possibly partial) load/store masks, no separate 8-wide/scalar tails.
// Single-core FMA probe on this host: 512-bit chains sustain ~3x the
// 256-bit rate (two 512-bit FMA ports), so the port-bound kernel scales.
inline void Gemm(const std::vector<float>& a, int m, int k,
                 const float* b, const float* bias, int n,
                 std::vector<float>& out) {
  constexpr int MR = 6, NR = 32;
  out.resize(static_cast<size_t>(m) * n);
  const float* ap = a.data();
  float* op = out.data();
#pragma omp parallel for schedule(static)
  for (int i0 = 0; i0 < m; i0 += MR) {
    const int mr = std::min(MR, m - i0);
    const float* ar[MR];
    for (int r = 0; r < MR; ++r)
      ar[r] = ap + static_cast<size_t>(std::min(i0 + r, m - 1)) * k;
    for (int j0 = 0; j0 < n; j0 += NR) {
      const int rem = n - j0;
      const __mmask16 m0 =
          rem >= 16 ? static_cast<__mmask16>(0xFFFF)
                    : static_cast<__mmask16>((1u << rem) - 1);
      const __mmask16 m1 =
          rem >= 32 ? static_cast<__mmask16>(0xFFFF)
                    : (rem > 16 ? static_cast<__mmask16>(
                                      (1u << (rem - 16)) - 1)
                                : static_cast<__mmask16>(0));
      __m512 c[MR][2];
      const __m512 bi0 =
          bias ? _mm512_maskz_loadu_ps(m0, bias + j0) : _mm512_setzero_ps();
      const __m512 bi1 =
          (bias && m1) ? _mm512_maskz_loadu_ps(m1, bias + j0 + 16)
                       : _mm512_setzero_ps();
      for (int r = 0; r < MR; ++r) {
        c[r][0] = bi0;
        c[r][1] = bi1;
      }
      for (int kk = 0; kk < k; ++kk) {
        const float* brow = b + static_cast<size_t>(kk) * n + j0;
        const __m512 b0 = _mm512_maskz_loadu_ps(m0, brow);
        const __m512 b1 =
            m1 ? _mm512_maskz_loadu_ps(m1, brow + 16) : _mm512_setzero_ps();
        for (int r = 0; r < MR; ++r) {
          const __m512 av = _mm512_set1_ps(ar[r][kk]);
          c[r][0] = _mm512_fmadd_ps(av, b0, c[r][0]);
          c[r][1] = _mm512_fmadd_ps(av, b1, c[r][1]);
        }
      }
      for (int r = 0; r < mr; ++r) {
        float* orow = op + static_cast<size_t>(i0 + r) * n + j0;
        _mm512_mask_storeu_ps(orow, m0, c[r][0]);
        if (m1) _mm512_mask_storeu_ps(orow + 16, m1, c[r][1]);
      }
    }
  }
}
#elif defined(__AVX2__) && defined(__FMA__)
inline void Gemm(const std::vector<float>& a, int m, int k,
                 const float* b, const float* bias, int n,
                 std::vector<float>& out) {
  constexpr int MR = 6, NR = 16;
  out.resize(static_cast<size_t>(m) * n);
  const float* ap = a.data();
  float* op = out.data();
  const int n16 = n - n % NR;
#pragma omp parallel for schedule(static)
  for (int i0 = 0; i0 < m; i0 += MR) {
    const int mr = std::min(MR, m - i0);
    const float* a0 = ap + static_cast<size_t>(std::min(i0 + 0, m - 1)) * k;
    const float* a1 = ap + static_cast<size_t>(std::min(i0 + 1, m - 1)) * k;
    const float* a2 = ap + static_cast<size_t>(std::min(i0 + 2, m - 1)) * k;
    const float* a3 = ap + static_cast<size_t>(std::min(i0 + 3, m - 1)) * k;
    const float* a4 = ap + static_cast<size_t>(std::min(i0 + 4, m - 1)) * k;
    const float* a5 = ap + static_cast<size_t>(std::min(i0 + 5, m - 1)) * k;
    for (int j0 = 0; j0 < n16; j0 += NR) {
      __m256 c00, c01, c10, c11, c20, c21, c30, c31, c40, c41, c50, c51;
      if (bias) {
        const __m256 i0v = _mm256_loadu_ps(bias + j0);
        const __m256 i1v = _mm256_loadu_ps(bias + j0 + 8);
        c00 = i0v; c01 = i1v;
        c10 = i0v; c11 = i1v;
        c20 = i0v; c21 = i1v;
        c30 = i0v; c31 = i1v;
        c40 = i0v; c41 = i1v;
        c50 = i0v; c51 = i1v;
      } else {
        c00 = c01 = _mm256_setzero_ps(); c10 = c11 = _mm256_setzero_ps(); c20 = c21 = _mm256_setzero_ps(); c30 = c31 = _mm256_setzero_ps(); c40 = c41 = _mm256_setzero_ps(); c50 = c51 = _mm256_setzero_ps();
      }
      for (int kk = 0; kk < k; ++kk) {
        const float* brow = b + static_cast<size_t>(kk) * n + j0;
        const __m256 b0 = _mm256_loadu_ps(brow);
        const __m256 b1 = _mm256_loadu_ps(brow + 8);
        __m256 av;
        av = _mm256_set1_ps(a0[kk]);
        c00 = _mm256_fmadd_ps(av, b0, c00);
        c01 = _mm256_fmadd_ps(av, b1, c01);
        av = _mm256_set1_ps(a1[kk]);
        c10 = _mm256_fmadd_ps(av, b0, c10);
        c11 = _mm256_fmadd_ps(av, b1, c11);
        av = _mm256_set1_ps(a2[kk]);
        c20 = _mm256_fmadd_ps(av, b0, c20);
        c21 = _mm256_fmadd_ps(av, b1, c21);
        av = _mm256_set1_ps(a3[kk]);
        c30 = _mm256_fmadd_ps(av, b0, c30);
        c31 = _mm256_fmadd_ps(av, b1, c31);
        av = _mm256_set1_ps(a4[kk]);
        c40 = _mm256_fmadd_ps(av, b0, c40);
        c41 = _mm256_fmadd_ps(av, b1, c41);
        av = _mm256_set1_ps(a5[kk]);
        c50 = _mm256_fmadd_ps(av, b0, c50);
        c51 = _mm256_fmadd_ps(av, b1, c51);
      }
      float* o0 = op + static_cast<size_t>(i0) * n + j0;
      _mm256_storeu_ps(o0, c00);
      _mm256_storeu_ps(o0 + 8, c01);
      if (mr > 1) {
        _mm256_storeu_ps(o0 + 1 * static_cast<size_t>(n), c10);
        _mm256_storeu_ps(o0 + 1 * static_cast<size_t>(n) + 8, c11);
      }
      if (mr > 2) {
        _mm256_storeu_ps(o0 + 2 * static_cast<size_t>(n), c20);
        _mm256_storeu_ps(o0 + 2 * static_cast<size_t>(n) + 8, c21);
      }
      if (mr > 3) {
        _mm256_storeu_ps(o0 + 3 * static_cast<size_t>(n), c30);
        _mm256_storeu_ps(o0 + 3 * static_cast<size_t>(n) + 8, c31);
      }
      if (mr > 4) {
        _mm256_storeu_ps(o0 + 4 * static_cast<size_t>(n), c40);
        _mm256_storeu_ps(o0 + 4 * static_cast<size_t>(n) + 8, c41);
      }
      if (mr > 5) {
        _mm256_storeu_ps(o0 + 5 * static_cast<size_t>(n), c50);
        _mm256_storeu_ps(o0 + 5 * static_cast<size_t>(n) + 8, c51);
      }
    }
    // N remainder: one 8-wide tile if it fits (PNet-style nets have
    // n = 10/28 where the 16-wide path covers nothing/16), then scalar
    int j8 = n16;
    if (n - n16 >= 8) {
      __m256 c0, c1, c2, c3, c4, c5;
      if (bias) {
        const __m256 iv = _mm256_loadu_ps(bias + j8);
        c0 = c1 = c2 = c3 = c4 = c5 = iv;
      } else {
        c0 = c1 = c2 = c3 = c4 = c5 = _mm256_setzero_ps();
      }
      for (int kk = 0; kk < k; ++kk) {
        const __m256 b0 = _mm256_loadu_ps(b + static_cast<size_t>(kk) * n +
                                          j8);
        c0 = _mm256_fmadd_ps(_mm256_set1_ps(a0[kk]), b0, c0);
        c1 = _mm256_fmadd_ps(_mm256_set1_ps(a1[kk]), b0, c1);
        c2 = _mm256_fmadd_ps(_mm256_set1_ps(a2[kk]), b0, c2);
        c3 = _mm256_fmadd_ps(_mm256_set1_ps(a3[kk]), b0, c3);
        c4 = _mm256_fmadd_ps(_mm256_set1_ps(a4[kk]), b0, c4);
        c5 = _mm256_fmadd_ps(_mm256_set1_ps(a5[kk]), b0, c5);
      }
      float* o0 = op + static_cast<size_t>(i0) * n + j8;
      _mm256_storeu_ps(o0, c0);
      if (mr > 1) _mm256_storeu_ps(o0 + 1 * static_cast<size_t>(n), c1);
      if (mr > 2) _mm256_storeu_ps(o0 + 2 * static_cast<size_t>(n), c2);
      if (mr > 3) _mm256_storeu_ps(o0 + 3 * static_cast<size_t>(n), c3);
      if (mr > 4) _mm256_storeu_ps(o0 + 4 * static_cast<size_t>(n), c4);
      if (mr > 5) _mm256_storeu_ps(o0 + 5 * static_cast<size_t>(n), c5);
      j8 += 8;
    }
    for (int r = 0; r < mr; ++r) {
      const float* arow = ap + static_cast<size_t>(i0 + r) * k;
      float* orow = op + static_cast<size_t>(i0 + r) * n;
      for (int j = j8; j < n; ++j) {
        float acc = bias ? bias[j] : 0.0f;
        for (int kk = 0; kk < k; ++kk)
          acc += arow[kk] * b[static_cast<size_t>(kk) * n + j];
        orow[j] = acc;
      }
    }
  }
}
#else
inline void Gemm(const std::vector<float>& a, int m, int k,
                 const float* b, const float* bias, int n,
                 std::vector<float>& out) {
  out.assign(static_cast<size_t>(m) * n, 0.0f);
#pragma omp parallel for schedule(static)
  for (int i = 0; i < m; ++i) {
    float* orow = out.data() + static_cast<size_t>(i) * n;
    if (bias) std::copy(bias, bias + n, orow);
    const float* arow = a.data() + static_cast<size_t>(i) * k;
    for (int kk = 0; kk < k; ++kk) {
      const float av = arow[kk];
      const float* brow = b + static_cast<size_t>(kk) * n;
      for (int j = 0; j < n; ++j) orow[j] += av * brow[j];
    }
  }
}
#endif

// im2col in kernel's [KH, KW, Cin] order (SAME padding, stride 1)
inline void Im2Col(const Tensor& in, int kh, int kw,
                   std::vector<float>& patches) {
  const int cin = in.c;
  const int ph = (kh - 1) / 2, pw = (kw - 1) / 2;
  const int k = kh * kw * cin;
  patches.assign(static_cast<size_t>(in.h) * in.w * k, 0.0f);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < in.h; ++y) {
    for (int x = 0; x < in.w; ++x) {
      float* row = patches.data() +
                   (static_cast<size_t>(y) * in.w + x) * k;
      for (int dy = 0; dy < kh; ++dy) {
        const int sy = y + dy - ph;
        if (sy < 0 || sy >= in.h) continue;
        for (int dx = 0; dx < kw; ++dx) {
          const int sx = x + dx - pw;
          if (sx < 0 || sx >= in.w) continue;
          std::copy(&in.data[(static_cast<size_t>(sy) * in.w + sx) * cin],
                    &in.data[(static_cast<size_t>(sy) * in.w + sx) * cin] +
                        cin,
                    row + (static_cast<size_t>(dy) * kw + dx) * cin);
        }
      }
    }
  }
}

inline void ConvSame(const Tensor& in, const NpyArray& kernel,
                     const NpyArray& bias, Tensor& out) {
  const int kh = static_cast<int>(kernel.shape[0]);
  const int kw = static_cast<int>(kernel.shape[1]);
  const int cin = static_cast<int>(kernel.shape[2]);
  const int cout = static_cast<int>(kernel.shape[3]);
  if (cin != in.c) throw std::runtime_error("conv: channel mismatch");
  const int m = in.h * in.w, k = kh * kw * cin;
  std::vector<float> patches;
  Im2Col(in, kh, kw, patches);
  std::vector<float> res;
  Gemm(patches, m, k, kernel.f32(), bias.f32(), cout, res);
  out.h = in.h;
  out.w = in.w;
  out.c = cout;
  out.data = std::move(res);
}

// int8 path: dynamic u8 tensor quantization -> TILE-FUSED im2col + QGemm
// (qgemm.hpp::QGemmFused: patch rows staged per tile in L1, the [m, kp]
// matrix never materializes — the measured int8-path bottleneck was its
// DRAM round trip, not the MACs; see the round-4 BASELINE finding).
inline void ConvSameQ(const Tensor& in, int kh, int kw,
                      const QuantizedKernel& qk, const float* bias,
                      Tensor& out) {
  const int m = in.h * in.w, k = kh * kw * in.c;
  if (k != qk.k) throw std::runtime_error("qconv: depth mismatch");
  std::vector<uint8_t> tq(in.data.size());
  float a_scale = 1.0f;
  QuantizeTensorU8(in.data.data(), in.data.size(), tq.data(), a_scale);
  const int h = in.h, w = in.w, c = in.c;
  const int ph = (kh - 1) / 2, pw = (kw - 1) / 2, kp = qk.kp;
  const uint8_t* tqp = tq.data();
  auto fill = [=](int i, uint8_t* row) {
    std::memset(row, 128, kp);  // SAME gaps + k..kp tail: u8 zero point
    const int y = i / w, x = i % w;
    for (int dy = 0; dy < kh; ++dy) {
      const int sy = y + dy - ph;
      if (sy < 0 || sy >= h) continue;
      const int x0 = std::max(x - pw, 0), x1 = std::min(x - pw + kw, w);
      if (x1 <= x0) continue;
      std::memcpy(row + (static_cast<size_t>(dy) * kw + (x0 - x + pw)) * c,
                  tqp + (static_cast<size_t>(sy) * w + x0) * c,
                  static_cast<size_t>(x1 - x0) * c);
    }
  };
  std::vector<float> res;
  QGemmFused(fill, a_scale, m, qk, bias, res);
  out.h = in.h;
  out.w = in.w;
  out.c = qk.n;
  out.data = std::move(res);
}

inline void Efm3(Tensor& t) {
  if (t.c % 3 != 0) throw std::runtime_error("efm3: channels % 3 != 0");
  const int third = t.c / 3, out_c = 2 * third;
  std::vector<float> out(static_cast<size_t>(t.h) * t.w * out_c);
  const int hw = t.h * t.w;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < hw; ++i) {
    const float* src = t.data.data() + static_cast<size_t>(i) * t.c;
    float* dst = out.data() + static_cast<size_t>(i) * out_c;
    for (int ch = 0; ch < third; ++ch) {
      const float a = src[ch], b = src[third + ch], c = src[2 * third + ch];
      dst[ch] = std::max(a, std::max(b, c));
      dst[third + ch] = std::min(a, std::min(b, c));
    }
  }
  t.c = out_c;
  t.data = std::move(out);
}

inline void MaxPool2(Tensor& t) {
  const int oh = t.h / 2, ow = t.w / 2;
  std::vector<float> out(static_cast<size_t>(oh) * ow * t.c);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      for (int ch = 0; ch < t.c; ++ch) {
        out[(static_cast<size_t>(y) * ow + x) * t.c + ch] = std::max(
            std::max(t.at(2 * y, 2 * x, ch), t.at(2 * y, 2 * x + 1, ch)),
            std::max(t.at(2 * y + 1, 2 * x, ch),
                     t.at(2 * y + 1, 2 * x + 1, ch)));
      }
    }
  }
  t.h = oh;
  t.w = ow;
  t.data = std::move(out);
}

inline void Mfm2(Tensor& t) {
  if (t.c % 2 != 0) throw std::runtime_error("mfm2: channels % 2 != 0");
  const int half = t.c / 2;
  std::vector<float> out(static_cast<size_t>(t.h) * t.w * half);
  const int hw = t.h * t.w;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < hw; ++i) {
    const float* src = t.data.data() + static_cast<size_t>(i) * t.c;
    float* dst = out.data() + static_cast<size_t>(i) * half;
    for (int ch = 0; ch < half; ++ch)
      dst[ch] = std::max(src[ch], src[half + ch]);
  }
  t.c = half;
  t.data = std::move(out);
}

}  // namespace nn

// Native forward for every exportable grayscale model — the in-process
// embedding engine the export format promised (reference parity:
// Feature.hpp:163-205 runs the net via MXPredCreatePartialOut; here the
// ladders of models/lightcnn.py + models/efm_symbol.py execute straight
// from weights.npz with zero Python in the loop).
class NativeNet {
 public:
  // quantized=true routes every conv with contraction depth >= 64 through
  // the int8 AVX2 path (qgemm.hpp): per-channel 6-bit-safe weights, dynamic
  // u8 activations. The 5x5x1 stem (K=25, quantization-noise-sensitive and
  // compute-trivial) and the dense/BN tail stay f32.
  NativeNet(const std::string& weights_npz, const std::string& model,
            bool quantized = false)
      : w_(LoadNpz(weights_npz)), model_(model), quantized_(quantized) {
    if (quantized_) {
      // eager quantization (see NativeMtcnn: a lazy mutable cache inside
      // the const forward races across threads sharing one handle)
      for (const auto& kv : w_) {
        const std::string& key = kv.first;
        const size_t cut = key.rfind("/kernel");
        if (cut == std::string::npos || kv.second.shape.size() != 4)
          continue;
        const int k = static_cast<int>(kv.second.shape[0] *
                                       kv.second.shape[1] *
                                       kv.second.shape[2]);
        if (k < 64) continue;
        nn::QuantizedKernel qk;
        nn::QuantizeKernel(kv.second.f32(), k,
                           static_cast<int>(kv.second.shape[3]), qk);
        qcache_.emplace(key.substr(0, cut), std::move(qk));
      }
    }
    if (model_ == "efmnet342") {
      require("params/conv1/kernel");
      feature_dim_ =
          static_cast<int>(get("params/fc1/kernel").shape[1]) / 3 * 2;
    } else if (model_ == "lightcnn9") {
      require("params/conv1/kernel");
      feature_dim_ = static_cast<int>(get("params/fc1/kernel").shape[1]) / 2;
    } else if (model_ == "lightcnn29") {
      require("params/group1/conv/kernel");
      feature_dim_ =
          static_cast<int>(get("params/fc1/kernel").shape[1]) / 3 * 2;
    } else {
      throw std::runtime_error("NativeNet: unsupported model '" + model_ +
                               "' (efmnet342 | lightcnn9 | lightcnn29)");
    }
  }

  int feature_dim() const { return feature_dim_; }

  // img: HxW float32 in [0, 1] (grayscale, scale 1/255 applied by caller);
  // out: feature_dim floats (the pre-dropout embedding branch).
  void Extract(const float* img, int h, int w, float* out) const {
    Tensor x;
    x.resize(h, w, 1);
    std::copy(img, img + static_cast<size_t>(h) * w, x.data.begin());
    if (model_ == "efmnet342") return ExtractEfm342(x, out);
    if (model_ == "lightcnn9") return ExtractLight9(x, out);
    ExtractLight29(x, out);
  }

 private:
  // ---- shared building blocks -------------------------------------------

  void ConvLayer(Tensor& x, const std::string& name) const {
    Tensor y;
    const NpyArray& kernel = get(name + "/kernel");
    const int kh = static_cast<int>(kernel.shape[0]);
    const int kw = static_cast<int>(kernel.shape[1]);
    const int cin = static_cast<int>(kernel.shape[2]);
    const int cout = static_cast<int>(kernel.shape[3]);
    const int k = kh * kw * cin;
    auto it = quantized_ && k >= 64 ? qcache_.find(name) : qcache_.end();
    if (it != qcache_.end()) {
      if (cin != x.c) throw std::runtime_error("conv: channel mismatch");
      nn::ConvSameQ(x, kh, kw, it->second, get(name + "/bias").f32(), y);
    } else {
      nn::ConvSame(x, kernel, get(name + "/bias"), y);
    }
    (void)cout;
    x = std::move(y);
  }

  // flatten (NHWC) -> dense -> write into `vec`
  void DenseLayer(const Tensor& x, const std::string& name,
                  std::vector<float>& vec) const {
    const NpyArray& kk = get(name + "/kernel");
    const NpyArray& bb = get(name + "/bias");
    const int in_dim = static_cast<int>(kk.shape[0]);
    const int out_dim = static_cast<int>(kk.shape[1]);
    if (static_cast<int>(x.data.size()) != in_dim)
      throw std::runtime_error(
          name + ": input " + std::to_string(x.data.size()) +
          " != kernel " + std::to_string(in_dim) +
          " (export trained at a different input size?)");
    vec.assign(out_dim, 0.0f);
    const float* kp = kk.f32();
    const float* bp = bb.f32();
#pragma omp parallel for schedule(static)
    for (int j = 0; j < out_dim; ++j) {
      float acc = bp[j];
      for (int i = 0; i < in_dim; ++i)
        acc += x.data[i] * kp[static_cast<size_t>(i) * out_dim + j];
      vec[j] = acc;
    }
  }

  static void VecEfm3(const std::vector<float>& v, float* out) {
    const int third = static_cast<int>(v.size()) / 3;
    for (int ch = 0; ch < third; ++ch) {
      const float a = v[ch], b = v[third + ch], c = v[2 * third + ch];
      out[ch] = std::max(a, std::max(b, c));
      out[third + ch] = std::min(a, std::min(b, c));
    }
  }

  static void VecMfm2(const std::vector<float>& v, float* out) {
    const int half = static_cast<int>(v.size()) / 2;
    for (int ch = 0; ch < half; ++ch)
      out[ch] = std::max(v[ch], v[half + ch]);
  }

  // EFMResBlock (models/lightcnn.py): x += conv_b(efm3(conv_a(efm3(x))))
  void ResBlocks(Tensor& x, const std::string& stage, int n_blocks) const {
    for (int i = 0; i < n_blocks; ++i) {
      Tensor h = x;
      nn::Efm3(h);
      ConvLayer(h, stage + "/conv_a_" + std::to_string(i));
      nn::Efm3(h);
      ConvLayer(h, stage + "/conv_b_" + std::to_string(i));
      for (size_t j = 0; j < x.data.size(); ++j) x.data[j] += h.data[j];
    }
  }

  // ---- the three ladders -------------------------------------------------

  void ExtractEfm342(Tensor& x, float* out) const {
    ConvLayer(x, "params/conv1");
    nn::Efm3(x);
    nn::MaxPool2(x);
    static const int kLadder[4][3] = {
        {99, 198, 1}, {198, 387, 2}, {387, 261, 3}, {261, 261, 4}};
    for (int s = 0; s < 4; ++s) {
      const int num_r = kLadder[s][0], tar = kLadder[s][2];
      const std::string stage = "params/stage" + std::to_string(s + 2);
      if (x.c != num_r * 2 / 3)
        throw std::runtime_error("efmnet342 ladder channel mismatch");
      ResBlocks(x, stage + "_res", tar);
      ConvLayer(x, stage + "_conv1x1");
      nn::Efm3(x);
      ConvLayer(x, stage + "_conv");
      nn::Efm3(x);
      nn::MaxPool2(x);
    }
    std::vector<float> fc1;
    DenseLayer(x, "params/fc1", fc1);
    VecEfm3(fc1, out);
  }

  void ExtractLight9(Tensor& x, float* out) const {
    ConvLayer(x, "params/conv1");
    nn::Mfm2(x);
    nn::MaxPool2(x);
    static const char* kNames[] = {"conv2a", "conv2", "conv3a", "conv3",
                                   "conv4a", "conv4", "conv5a", "conv5"};
    static const bool kPool[] = {false, true, false, true,
                                 false, false, false, true};
    for (int i = 0; i < 8; ++i) {
      ConvLayer(x, std::string("params/") + kNames[i]);
      nn::Mfm2(x);
      if (kPool[i]) nn::MaxPool2(x);
    }
    std::vector<float> fc1;
    DenseLayer(x, "params/fc1", fc1);
    VecMfm2(fc1, out);
  }

  void ExtractLight29(Tensor& x, float* out) const {
    ConvLayer(x, "params/group1/conv");
    nn::Efm3(x);
    nn::MaxPool2(x);
    static const int kLadder[4][2] = {{1, 198}, {2, 387}, {3, 261}, {4, 261}};
    for (int g = 0; g < 4; ++g) {
      const std::string grp = "params/group" + std::to_string(g + 2);
      ResBlocks(x, grp + "_res", kLadder[g][0]);
      // EFMConv with pre stage: 1x1 pre_conv -> efm3 -> 3x3 conv -> efm3
      ConvLayer(x, grp + "_conv/pre_conv");
      nn::Efm3(x);
      ConvLayer(x, grp + "_conv/conv");
      nn::Efm3(x);
      nn::MaxPool2(x);
    }
    std::vector<float> fc1;
    DenseLayer(x, "params/fc1", fc1);
    std::vector<float> feat(fc1.size() / 3 * 2);
    VecEfm3(fc1, feat.data());
    // feature branch BatchNorm (inference: batch_stats mean/var + params
    // scale/bias; flax eps 1e-5)
    const float* scale = get("params/fc1_bn/scale").f32();
    const float* bias = get("params/fc1_bn/bias").f32();
    const float* mean = get("batch_stats/fc1_bn/mean").f32();
    const float* var = get("batch_stats/fc1_bn/var").f32();
    for (size_t j = 0; j < feat.size(); ++j)
      out[j] = scale[j] * (feat[j] - mean[j]) /
                   std::sqrt(var[j] + 1e-5f) + bias[j];
  }

  const NpyArray& get(const std::string& key) const {
    auto it = w_.find(key);
    if (it == w_.end())
      throw std::runtime_error("missing tensor: " + key);
    return it->second;
  }
  void require(const std::string& key) const { get(key); }

  std::map<std::string, NpyArray> w_;
  std::string model_;
  bool quantized_ = false;
  std::map<std::string, nn::QuantizedKernel> qcache_;  // filled in ctor
  int feature_dim_;
};

// Backwards-compatible alias (round-1 API surface).
class EfmNet342 : public NativeNet {
 public:
  explicit EfmNet342(const std::string& weights_npz)
      : NativeNet(weights_npz, "efmnet342") {}
};

}  // namespace facejax
