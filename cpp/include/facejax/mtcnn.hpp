// Native MTCNN cascade — full-frame face detection with zero Python/JAX in
// the loop. Reference parity: the C++ runtime runs PNet/RNet/ONet itself
// through the MXNet C predict API (reference MTCNN.hpp:254-1421,
// detection_MTCNN :993); here the three nets execute from an .npz export of
// models/mtcnn.py parameters, and the cascade orchestration mirrors
// detect/pipeline.py (== the vendored detect_face.py:279-399) step by step:
// image pyramid (factor 0.709 from 12/minsize), PNet heatmap decode +
// per-scale NMS 0.5 + cross-scale NMS 0.7 + regression + square, RNet on
// 24x24 crops (NMS 0.7 + bbreg + square), ONet on 48x48 crops (landmark
// decode + bbreg + NMS-Min 0.7).
//
// Numeric conventions preserved exactly:
//   - (x-127.5)*0.0078125 input normalization
//   - the TF-Caffe (x, y) transposition dance: every net input is the
//     transposed image, and the PNet heatmap is decoded in net orientation
//     (detect_face.py:308-312, :641-665) so converted det*.npy weights and
//     models/mtcnn.py random initializations behave identically here
//   - np.fix (truncate toward zero) on box coordinates
//   - the 1-indexed pad()/crop arithmetic of detect_face.py:701-733
//   - even the single-detection flipud quirk of generateBoundingBox
// Documented deviation (same as detect/device_cascade.py): resampling is
// exact area-averaging for downscale and half-pixel bilinear for upscale
// instead of cv2 INTER_AREA; the pyramid only ever downscales, so the only
// bilinear-vs-INTER_AREA difference is on sub-24/48 px crop upscales.

#pragma once

#include <algorithm>
#include <array>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

#include "facejax/efmnet.hpp"  // Tensor, nn::Gemm
#include "facejax/nms.hpp"
#include "facejax/npz.hpp"

namespace facejax {
namespace mtcnn {

// ---- primitive ops (VALID convs + TF pooling, models/mtcnn.py:27-46) ----

// im2col for VALID padding, stride 1: out spatial (h-kh+1, w-kw+1)
inline void Im2ColValid(const Tensor& in, int kh, int kw,
                        std::vector<float>& patches, int& oh, int& ow) {
  const int cin = in.c;
  oh = in.h - kh + 1;
  ow = in.w - kw + 1;
  if (oh <= 0 || ow <= 0)
    throw std::runtime_error("mtcnn conv: input smaller than kernel");
  const int k = kh * kw * cin;
  patches.assign(static_cast<size_t>(oh) * ow * k, 0.0f);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < oh; ++y) {
    for (int x = 0; x < ow; ++x) {
      float* row = patches.data() + (static_cast<size_t>(y) * ow + x) * k;
      for (int dy = 0; dy < kh; ++dy) {
        const float* src =
            in.data.data() + (static_cast<size_t>(y + dy) * in.w + x) * cin;
        std::copy(src, src + static_cast<size_t>(kw) * cin,
                  row + static_cast<size_t>(dy) * kw * cin);
      }
    }
  }
}

inline void ConvValid(const Tensor& in, const NpyArray& kernel,
                      const NpyArray& bias, Tensor& out) {
  const int kh = static_cast<int>(kernel.shape[0]);
  const int kw = static_cast<int>(kernel.shape[1]);
  const int cin = static_cast<int>(kernel.shape[2]);
  const int cout = static_cast<int>(kernel.shape[3]);
  if (cin != in.c) throw std::runtime_error("mtcnn conv: channel mismatch");
  int oh = 0, ow = 0;
  std::vector<float> patches;
  Im2ColValid(in, kh, kw, patches, oh, ow);
  std::vector<float> res;
  nn::Gemm(patches, oh * ow, kh * kw * cin, kernel.f32(), bias.f32(), cout,
           res);
  out.h = oh;
  out.w = ow;
  out.c = cout;
  out.data = std::move(res);
}

// int8 VALID conv, mirroring the embedder's ConvSameQ design: quantize the
// TENSOR once (h*w*c values, not the kh*kw-times-larger im2col matrix),
// then byte-copy im2col -> QGemm (qgemm.hpp's saturation-proof scheme).
inline void ConvValidQ(const Tensor& in, int kh, int kw,
                       const nn::QuantizedKernel& qk, const float* bias,
                       Tensor& out) {
  const int k = kh * kw * in.c;
  if (k != qk.k) throw std::runtime_error("mtcnn qconv: depth mismatch");
  std::vector<uint8_t> tq(in.data.size());
  float a_scale = 1.0f;
  nn::QuantizeTensorU8(in.data.data(), in.data.size(), tq.data(), a_scale);
  const int oh = in.h - kh + 1, ow = in.w - kw + 1;
  if (oh <= 0 || ow <= 0)
    throw std::runtime_error("mtcnn qconv: input smaller than kernel");
  // tile-fused im2col + QGemm (qgemm.hpp::QGemmFused): VALID rows are kh
  // contiguous kw*c segments; the patch matrix never hits DRAM
  const int w = in.w, c = in.c, kp = qk.kp;
  const uint8_t* tqp = tq.data();
  auto fill = [=](int i, uint8_t* row) {
    const int y = i / ow, x = i % ow;
    for (int dy = 0; dy < kh; ++dy)
      std::memcpy(row + static_cast<size_t>(dy) * kw * c,
                  tqp + (static_cast<size_t>(y + dy) * w + x) * c,
                  static_cast<size_t>(kw) * c);
    for (int kk = k; kk < kp; ++kk) row[kk] = 128;
  };
  std::vector<float> res;
  nn::QGemmFused(fill, a_scale, oh * ow, qk, bias, res);
  out.h = oh;
  out.w = ow;
  out.c = qk.n;
  out.data = std::move(res);
}

// per-channel PReLU: max(x,0) + alpha*min(x,0) (models/mtcnn.py:34-36)
inline void PRelu(Tensor& t, const NpyArray& alpha) {
  const float* a = alpha.f32();
  const int hw = t.h * t.w;
  for (int i = 0; i < hw; ++i) {
    float* px = t.data.data() + static_cast<size_t>(i) * t.c;
    for (int ch = 0; ch < t.c; ++ch)
      if (px[ch] < 0.0f) px[ch] *= a[ch];
  }
}

inline void PReluVec(std::vector<float>& v, const NpyArray& alpha) {
  const float* a = alpha.f32();
  for (size_t i = 0; i < v.size(); ++i)
    if (v[i] < 0.0f) v[i] *= a[i];
}

// TF-semantics max pool: SAME -> out=ceil(h/s), pad_lo=pad_total/2 with
// -inf outside; VALID -> out=floor((h-k)/s)+1 (lax.reduce_window parity).
inline void MaxPool(Tensor& t, int k, int s, bool same) {
  int oh, ow, py, px;
  if (same) {
    oh = (t.h + s - 1) / s;
    ow = (t.w + s - 1) / s;
    py = std::max((oh - 1) * s + k - t.h, 0) / 2;
    px = std::max((ow - 1) * s + k - t.w, 0) / 2;
  } else {
    oh = (t.h - k) / s + 1;
    ow = (t.w - k) / s + 1;
    py = px = 0;
  }
  std::vector<float> out(static_cast<size_t>(oh) * ow * t.c,
                         -std::numeric_limits<float>::infinity());
  for (int y = 0; y < oh; ++y) {
    const int y0 = std::max(y * s - py, 0);
    const int y1 = std::min(y * s - py + k, t.h);
    for (int x = 0; x < ow; ++x) {
      const int x0 = std::max(x * s - px, 0);
      const int x1 = std::min(x * s - px + k, t.w);
      float* dst = out.data() + (static_cast<size_t>(y) * ow + x) * t.c;
      for (int sy = y0; sy < y1; ++sy)
        for (int sx = x0; sx < x1; ++sx) {
          const float* src =
              t.data.data() + (static_cast<size_t>(sy) * t.w + sx) * t.c;
          for (int ch = 0; ch < t.c; ++ch)
            dst[ch] = std::max(dst[ch], src[ch]);
        }
    }
  }
  t.h = oh;
  t.w = ow;
  t.data = std::move(out);
}

// softmax over the channel axis (jax.nn.softmax(axis=-1))
inline void SoftmaxC(Tensor& t) {
  const int hw = t.h * t.w;
  for (int i = 0; i < hw; ++i) {
    float* px = t.data.data() + static_cast<size_t>(i) * t.c;
    float mx = px[0];
    for (int ch = 1; ch < t.c; ++ch) mx = std::max(mx, px[ch]);
    float sum = 0.0f;
    for (int ch = 0; ch < t.c; ++ch) {
      px[ch] = std::exp(px[ch] - mx);
      sum += px[ch];
    }
    for (int ch = 0; ch < t.c; ++ch) px[ch] /= sum;
  }
}

inline void SoftmaxVec(std::vector<float>& v) {
  float mx = *std::max_element(v.begin(), v.end());
  float sum = 0.0f;
  for (float& x : v) {
    x = std::exp(x - mx);
    sum += x;
  }
  for (float& x : v) x /= sum;
}

// flatten (NHWC row-major, matching x.reshape(B,-1)) -> dense [In,Out]
inline void DenseVec(const std::vector<float>& x, const NpyArray& kernel,
                     const NpyArray& bias, std::vector<float>& out) {
  const int in_dim = static_cast<int>(kernel.shape[0]);
  const int out_dim = static_cast<int>(kernel.shape[1]);
  if (static_cast<int>(x.size()) != in_dim)
    throw std::runtime_error("mtcnn fc: input dim mismatch");
  out.assign(out_dim, 0.0f);
  const float* kp = kernel.f32();
  const float* bp = bias.f32();
  for (int j = 0; j < out_dim; ++j) out[j] = bp[j];
  for (int i = 0; i < in_dim; ++i) {
    const float xv = x[i];
    const float* krow = kp + static_cast<size_t>(i) * out_dim;
    for (int j = 0; j < out_dim; ++j) out[j] += xv * krow[j];
  }
}

// swap h/w (the TF-Caffe orientation transpose, detect_face.py:309,349)
inline void TransposeHW(const Tensor& in, Tensor& out) {
  out.resize(in.w, in.h, in.c);
  for (int y = 0; y < in.h; ++y)
    for (int x = 0; x < in.w; ++x)
      for (int ch = 0; ch < in.c; ++ch) out.at(x, y, ch) = in.at(y, x, ch);
}

// ---- resampling --------------------------------------------------------

// Exact area-weighted average (== cv2 INTER_AREA for downscale).
inline void ResizeArea(const Tensor& in, int oh, int ow, Tensor& out) {
  out.resize(oh, ow, in.c);
  const double sy = static_cast<double>(in.h) / oh;
  const double sx = static_cast<double>(in.w) / ow;
  std::vector<double> acc(in.c);
  for (int y = 0; y < oh; ++y) {
    const double fy0 = y * sy, fy1 = (y + 1) * sy;
    const int iy0 = static_cast<int>(fy0);
    const int iy1 = std::min(static_cast<int>(std::ceil(fy1)), in.h);
    for (int x = 0; x < ow; ++x) {
      const double fx0 = x * sx, fx1 = (x + 1) * sx;
      const int ix0 = static_cast<int>(fx0);
      const int ix1 = std::min(static_cast<int>(std::ceil(fx1)), in.w);
      std::fill(acc.begin(), acc.end(), 0.0);
      double wsum = 0.0;
      for (int iy = iy0; iy < iy1; ++iy) {
        const double wy = std::min<double>(iy + 1, fy1) -
                          std::max<double>(iy, fy0);
        for (int ix = ix0; ix < ix1; ++ix) {
          const double wx = std::min<double>(ix + 1, fx1) -
                            std::max<double>(ix, fx0);
          const double wgt = wy * wx;
          const float* src =
              in.data.data() + (static_cast<size_t>(iy) * in.w + ix) * in.c;
          for (int ch = 0; ch < in.c; ++ch) acc[ch] += wgt * src[ch];
          wsum += wgt;
        }
      }
      float* dst = out.data.data() + (static_cast<size_t>(y) * ow + x) * in.c;
      for (int ch = 0; ch < in.c; ++ch)
        dst[ch] = static_cast<float>(wsum > 0 ? acc[ch] / wsum : 0.0);
    }
  }
}

// Half-pixel-center bilinear (for the rare crop upscales).
inline void ResizeBilinear(const Tensor& in, int oh, int ow, Tensor& out) {
  out.resize(oh, ow, in.c);
  const double sy = static_cast<double>(in.h) / oh;
  const double sx = static_cast<double>(in.w) / ow;
  for (int y = 0; y < oh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, static_cast<double>(in.h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, in.h - 1);
    const double wy = fy - y0;
    for (int x = 0; x < ow; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      fx = std::max(0.0, std::min(fx, static_cast<double>(in.w - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, in.w - 1);
      const double wx = fx - x0;
      float* dst = out.data.data() + (static_cast<size_t>(y) * ow + x) * in.c;
      for (int ch = 0; ch < in.c; ++ch) {
        const double top = (1 - wx) * in.at(y0, x0, ch) +
                           wx * in.at(y0, x1, ch);
        const double bot = (1 - wx) * in.at(y1, x0, ch) +
                           wx * in.at(y1, x1, ch);
        dst[ch] = static_cast<float>((1 - wy) * top + wy * bot);
      }
    }
  }
}

inline void Resize(const Tensor& in, int oh, int ow, Tensor& out) {
  if (oh == in.h && ow == in.w) {
    out = in;
    return;
  }
  if (oh <= in.h && ow <= in.w)
    ResizeArea(in, oh, ow, out);
  else
    ResizeBilinear(in, oh, ow, out);
}

}  // namespace mtcnn

// ---- the cascade -------------------------------------------------------

class NativeMtcnn {
 public:
  // quantized=true routes every conv with contraction depth >= 64 through
  // the int8 AVX2 path (the same qgemm.hpp scheme and threshold as the
  // embedder; PNet's 27-deep conv1 and the dense heads stay f32).
  explicit NativeMtcnn(const std::string& weights_npz,
                       bool quantized = false)
      : w_(LoadNpz(weights_npz)), quantized_(quantized) {
    get("pnet/conv1/weights");  // fail fast on a wrong file
    get("rnet/conv1/weights");
    get("onet/conv1/weights");
    // stage timers on stderr (the reference's toShowTimeLog/TimeGoesBy
    // instrumentation, MTCNN.hpp:37,1039-1319)
    const char* t = std::getenv("FACEJAX_MTCNN_TIMELOG");
    timelog_ = t && t[0] == '1';
    if (quantized_) {
      // quantize EAGERLY: the conv inventory is known at open time, and a
      // lazy cache mutated inside const Detect() would race when one
      // handle serves several threads
      for (const auto& kv : w_) {
        const std::string& key = kv.first;
        const size_t cut = key.rfind("/weights");
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
  }

  // --- stage forwards (inputs already normalized + transposed) ---

  // x: [h, w, 3] -> prob [h', w', 2], reg [h', w', 4] (net orientation)
  void PNetForward(const Tensor& x, Tensor& prob, Tensor& reg) const {
    Tensor t;
    Conv(x, "pnet/conv1", t);
    mtcnn::PRelu(t, get("pnet/PReLU1/alpha"));
    mtcnn::MaxPool(t, 2, 2, /*same=*/true);
    Tensor t2;
    Conv(t, "pnet/conv2", t2);
    mtcnn::PRelu(t2, get("pnet/PReLU2/alpha"));
    Tensor t3;
    Conv(t2, "pnet/conv3", t3);
    mtcnn::PRelu(t3, get("pnet/PReLU3/alpha"));
    Conv(t3, "pnet/conv4-1", prob);
    mtcnn::SoftmaxC(prob);
    Conv(t3, "pnet/conv4-2", reg);
  }

  // x: [24, 24, 3] -> prob[2], reg[4]
  void RNetForward(const Tensor& x, float* prob2, float* reg4) const {
    Tensor t;
    Conv(x, "rnet/conv1", t);
    mtcnn::PRelu(t, get("rnet/prelu1/alpha"));
    mtcnn::MaxPool(t, 3, 2, /*same=*/true);
    Tensor t2;
    Conv(t, "rnet/conv2", t2);
    mtcnn::PRelu(t2, get("rnet/prelu2/alpha"));
    mtcnn::MaxPool(t2, 3, 2, /*same=*/false);
    Tensor t3;
    Conv(t2, "rnet/conv3", t3);
    mtcnn::PRelu(t3, get("rnet/prelu3/alpha"));
    std::vector<float> fc;
    mtcnn::DenseVec(t3.data, get("rnet/conv4/weights"),
                    get("rnet/conv4/biases"), fc);
    mtcnn::PReluVec(fc, get("rnet/prelu4/alpha"));
    std::vector<float> prob;
    mtcnn::DenseVec(fc, get("rnet/conv5-1/weights"),
                    get("rnet/conv5-1/biases"), prob);
    mtcnn::SoftmaxVec(prob);
    std::vector<float> reg;
    mtcnn::DenseVec(fc, get("rnet/conv5-2/weights"),
                    get("rnet/conv5-2/biases"), reg);
    std::copy(prob.begin(), prob.end(), prob2);
    std::copy(reg.begin(), reg.end(), reg4);
  }

  // x: [48, 48, 3] -> prob[2], reg[4], landmarks[10]
  void ONetForward(const Tensor& x, float* prob2, float* reg4,
                   float* lmk10) const {
    Tensor t;
    Conv(x, "onet/conv1", t);
    mtcnn::PRelu(t, get("onet/prelu1/alpha"));
    mtcnn::MaxPool(t, 3, 2, /*same=*/true);
    Tensor t2;
    Conv(t, "onet/conv2", t2);
    mtcnn::PRelu(t2, get("onet/prelu2/alpha"));
    mtcnn::MaxPool(t2, 3, 2, /*same=*/false);
    Tensor t3;
    Conv(t2, "onet/conv3", t3);
    mtcnn::PRelu(t3, get("onet/prelu3/alpha"));
    mtcnn::MaxPool(t3, 2, 2, /*same=*/true);
    Tensor t4;
    Conv(t3, "onet/conv4", t4);
    mtcnn::PRelu(t4, get("onet/prelu4/alpha"));
    std::vector<float> fc;
    mtcnn::DenseVec(t4.data, get("onet/conv5/weights"),
                    get("onet/conv5/biases"), fc);
    mtcnn::PReluVec(fc, get("onet/prelu5/alpha"));
    std::vector<float> prob;
    mtcnn::DenseVec(fc, get("onet/conv6-1/weights"),
                    get("onet/conv6-1/biases"), prob);
    mtcnn::SoftmaxVec(prob);
    std::vector<float> reg;
    mtcnn::DenseVec(fc, get("onet/conv6-2/weights"),
                    get("onet/conv6-2/biases"), reg);
    std::vector<float> lmk;
    mtcnn::DenseVec(fc, get("onet/conv6-3/weights"),
                    get("onet/conv6-3/biases"), lmk);
    std::copy(prob.begin(), prob.end(), prob2);
    std::copy(reg.begin(), reg.end(), reg4);
    std::copy(lmk.begin(), lmk.end(), lmk10);
  }

  // --- full cascade (detect/pipeline.py::MTCNNDetector.detect) ---
  //
  // img: [h, w, 3] float32 RGB in [0, 255].
  // boxes_out: N rows of [x1 y1 x2 y2 score]; points_out: the reference's
  // [10, N] landmark layout (5 xs then 5 ys, column-major per face).
  void Detect(const float* img, int h, int w, int minsize,
              const double thresholds[3], double factor,
              std::vector<float>& boxes_out,
              std::vector<float>& points_out) const {
    boxes_out.clear();
    points_out.clear();
    Tensor image;
    image.resize(h, w, 3);
    std::copy(img, img + static_cast<size_t>(h) * w * 3, image.data.begin());

    // stage 1: PNet over the pyramid (detect_face.py:287-330)
    using Clock = std::chrono::steady_clock;
    auto tic = Clock::now();
    auto lap = [&tic]() {
      const auto now = Clock::now();
      const double ms =
          std::chrono::duration<double, std::milli>(now - tic).count();
      tic = now;
      return ms;
    };
    std::vector<std::array<float, 9>> total;  // x1 y1 x2 y2 score reg[4]
    double minl = std::min(h, w) * (12.0 / minsize);
    const double m = 12.0 / minsize;
    std::vector<double> scales;
    for (int count = 0; minl >= 12.0; minl *= factor, ++count)
      scales.push_back(m * std::pow(factor, count));
    // scale-level parallelism (the reference OMPs its pyramid loop,
    // MTCNN.hpp:701): each scale fills a PRIVATE bucket, merged in scale
    // order afterwards — bit-identical to the sequential pyramid,
    // including per-scale NMS tie order. dynamic(1) because the work is
    // geometric (scale k costs ~factor^2k of scale 0): the first thread
    // takes the big scale while the rest drain the tail. Inner im2col/
    // GEMM omp regions serialize inside the team (nested off) — the
    // parallelism moves up a level rather than doubling.
    std::vector<std::vector<std::array<float, 9>>> buckets(scales.size());
#pragma omp parallel for schedule(dynamic, 1)
    for (size_t s = 0; s < scales.size(); ++s)
      RunPnetScale(image, scales[s], thresholds[0], buckets[s]);
    for (auto& b : buckets)
      total.insert(total.end(), b.begin(), b.end());
    if (timelog_)
      std::fprintf(stderr, "\ttime - PNet pyramid (%zu scales):\t%.2f ms\n",
                   scales.size(), lap());
    if (!total.empty()) {
      std::vector<int> pick = Nms5(total, 0.7f, NmsMethod::kUnion);
      Gather(total, pick);
      // regression to qq boxes + square + fix (pipeline.py:167-177)
      for (auto& b : total) {
        const float regw = b[2] - b[0];
        const float regh = b[3] - b[1];
        const float q1 = b[0] + b[5] * regw;
        const float q2 = b[1] + b[6] * regh;
        const float q3 = b[2] + b[7] * regw;
        const float q4 = b[3] + b[8] * regh;
        b[0] = q1;
        b[1] = q2;
        b[2] = q3;
        b[3] = q4;
      }
      RerecRows(total);
      for (auto& b : total)
        for (int i = 0; i < 4; ++i) b[i] = std::trunc(b[i]);
    }
    if (timelog_)
      std::fprintf(stderr, "\ttime - stage1 boxes (%zu):\t%.2f ms\n",
                   total.size(), lap());

    // stage 2: RNet (pipeline.py:179-192)
    if (!total.empty()) {
      std::vector<Tensor> crops;
      BuildCrops(image, total, 24, crops);
      const size_t n = total.size();
      std::vector<float> score(n);
      std::vector<std::array<float, 4>> reg(n);
      // crop-level parallelism (the reference OMPs its box loops,
      // MTCNN.hpp:711,1035): each iteration writes disjoint rows
#pragma omp parallel for schedule(dynamic, 4)
      for (size_t i = 0; i < n; ++i) {
        float p[2];
        RNetForward(crops[i], p, reg[i].data());
        score[i] = p[1];
      }
      std::vector<std::array<float, 9>> passed;
      std::vector<std::array<float, 4>> mv;
      for (size_t i = 0; i < n; ++i) {
        if (score[i] > thresholds[1]) {
          std::array<float, 9> b{};
          b[0] = total[i][0];
          b[1] = total[i][1];
          b[2] = total[i][2];
          b[3] = total[i][3];
          b[4] = score[i];
          passed.push_back(b);
          mv.push_back(reg[i]);
        }
      }
      total.swap(passed);
      if (!total.empty()) {
        std::vector<int> pick = Nms5(total, 0.7f, NmsMethod::kUnion);
        Gather(total, pick);
        std::vector<std::array<float, 4>> mvp;
        for (int i : pick) mvp.push_back(mv[i]);
        BBRegRows(total, mvp);
        RerecRows(total);
      }
    }

    if (timelog_)
      std::fprintf(stderr, "\ttime - RNet (%zu kept):\t%.2f ms\n",
                   total.size(), lap());

    // stage 3: ONet (pipeline.py:194-219)
    if (!total.empty()) {
      for (auto& b : total)
        for (int i = 0; i < 4; ++i)
          b[i] = static_cast<float>(static_cast<int>(std::trunc(b[i])));
      std::vector<Tensor> crops;
      BuildCrops(image, total, 48, crops);
      const size_t n = total.size();
      std::vector<float> score(n);
      std::vector<std::array<float, 4>> reg(n);
      std::vector<std::array<float, 10>> lmk(n);
#pragma omp parallel for schedule(dynamic, 2)
      for (size_t i = 0; i < n; ++i) {
        float p[2];
        ONetForward(crops[i], p, reg[i].data(), lmk[i].data());
        score[i] = p[1];
      }
      std::vector<std::array<float, 9>> passed;
      std::vector<std::array<float, 4>> mv;
      std::vector<std::array<float, 10>> pts;
      for (size_t i = 0; i < n; ++i) {
        if (score[i] > thresholds[2]) {
          std::array<float, 9> b{};
          b[0] = total[i][0];
          b[1] = total[i][1];
          b[2] = total[i][2];
          b[3] = total[i][3];
          b[4] = score[i];
          passed.push_back(b);
          mv.push_back(reg[i]);
          // landmark decode against the PRE-regression box
          // (detect_face.py:383-386)
          const float bw = total[i][2] - total[i][0] + 1;
          const float bh = total[i][3] - total[i][1] + 1;
          std::array<float, 10> pt{};
          for (int j = 0; j < 5; ++j) {
            pt[j] = bw * lmk[i][j] + total[i][0] - 1;
            pt[5 + j] = bh * lmk[i][5 + j] + total[i][1] - 1;
          }
          pts.push_back(pt);
        }
      }
      total.swap(passed);
      if (!total.empty()) {
        BBRegRows(total, mv);
        std::vector<int> pick = Nms5(total, 0.7f, NmsMethod::kMin);
        Gather(total, pick);
        std::vector<std::array<float, 10>> ptsp;
        for (int i : pick) ptsp.push_back(pts[i]);
        pts.swap(ptsp);
      } else {
        pts.clear();
      }
      if (timelog_)
        std::fprintf(stderr, "\ttime - ONet (%zu kept):\t%.2f ms\n",
                     total.size(), lap());
      // emit
      const size_t nf = total.size();
      boxes_out.resize(nf * 5);
      points_out.resize(nf * 10);
      for (size_t i = 0; i < nf; ++i) {
        for (int j = 0; j < 5; ++j) boxes_out[i * 5 + j] = total[i][j];
        // reference layout: points[row r, face i] with rows = 5 xs, 5 ys
        for (int r = 0; r < 10; ++r) points_out[r * nf + i] = pts[i][r];
      }
      return;
    }
    // empty result (boxes_out/points_out already cleared)
  }

 private:
  // one pyramid scale: resize + normalize + transpose + PNet + decode +
  // per-scale NMS 0.5 (pipeline.py:83-97)
  void RunPnetScale(const Tensor& image, double scale, double threshold,
                    std::vector<std::array<float, 9>>& total) const {
    const int hs = static_cast<int>(std::ceil(image.h * scale));
    const int ws = static_cast<int>(std::ceil(image.w * scale));
    if (hs < 12 || ws < 12) return;
    Tensor resized;
    mtcnn::Resize(image, hs, ws, resized);
    for (float& v : resized.data) v = (v - 127.5f) * 0.0078125f;
    Tensor xt;
    mtcnn::TransposeHW(resized, xt);
    Tensor prob, reg;
    PNetForward(xt, prob, reg);
    // decode in net orientation: net rows index image x, net cols image y
    // (the double-transpose of pipeline.py:88-95 cancels out here); the
    // row-major cell scan matches np.where's order.
    std::vector<std::array<float, 9>> boxes;
    std::vector<std::array<int, 2>> cells;
    for (int y = 0; y < prob.h; ++y)
      for (int x = 0; x < prob.w; ++x)
        if (prob.at(y, x, 1) >= threshold) {
          std::array<float, 9> b{};
          // double math mirrors numpy's float64 host arithmetic
          b[0] = static_cast<float>(std::trunc((2.0 * y + 1) / scale));
          b[1] = static_cast<float>(std::trunc((2.0 * x + 1) / scale));
          b[2] = static_cast<float>(std::trunc((2.0 * y + 12) / scale));
          b[3] = static_cast<float>(std::trunc((2.0 * x + 12) / scale));
          b[4] = prob.at(y, x, 1);
          b[5] = reg.at(y, x, 0);
          b[6] = reg.at(y, x, 1);
          b[7] = reg.at(y, x, 2);
          b[8] = reg.at(y, x, 3);
          boxes.push_back(b);
          cells.push_back({y, x});
        }
    // generateBoundingBox's single-detection flipud quirk
    // (detect_face.py:652-656): with exactly one cell above threshold the
    // regression maps are read row-flipped.
    if (boxes.size() == 1) {
      const int fy = reg.h - 1 - cells[0][0];
      const int x = cells[0][1];
      boxes[0][5] = reg.at(fy, x, 0);
      boxes[0][6] = reg.at(fy, x, 1);
      boxes[0][7] = reg.at(fy, x, 2);
      boxes[0][8] = reg.at(fy, x, 3);
    }
    if (boxes.empty()) return;
    std::vector<int> pick = Nms5(boxes, 0.5f, NmsMethod::kUnion);
    for (int i : pick) total.push_back(boxes[i]);
  }

  // crops via the 1-indexed pad() arithmetic (detect_face.py:701-733 +
  // pipeline.py:99-114): clip box to image, paste into a zero tmp of the
  // unclipped size, resize to `size`, normalize, transpose.
  void BuildCrops(const Tensor& image,
                  const std::vector<std::array<float, 9>>& boxes, int size,
                  std::vector<Tensor>& crops) const {
    const int w = image.w, h = image.h;
    crops.resize(boxes.size());
    for (size_t i = 0; i < boxes.size(); ++i) {
      const int tmpw = static_cast<int>(boxes[i][2] - boxes[i][0] + 1);
      const int tmph = static_cast<int>(boxes[i][3] - boxes[i][1] + 1);
      int dx = 1, dy = 1, edx = tmpw, edy = tmph;
      int x = static_cast<int>(boxes[i][0]);
      int y = static_cast<int>(boxes[i][1]);
      int ex = static_cast<int>(boxes[i][2]);
      int ey = static_cast<int>(boxes[i][3]);
      if (ex > w) {
        edx = -ex + w + tmpw;
        ex = w;
      }
      if (ey > h) {
        edy = -ey + h + tmph;
        ey = h;
      }
      if (x < 1) {
        dx = 2 - x;
        x = 1;
      }
      if (y < 1) {
        dy = 2 - y;
        y = 1;
      }
      Tensor& crop = crops[i];
      crop.resize(size, size, 3);  // zeros
      if (tmph <= 0 || tmpw <= 0) {
        // degenerate box: a zero crop, exactly like tempimg[k] staying 0
        for (float& v : crop.data) v = (0.0f - 127.5f) * 0.0078125f;
        continue;
      }
      Tensor tmp;
      tmp.resize(tmph, tmpw, 3);  // zeros
      for (int sy = y - 1; sy < ey; ++sy) {
        const int ty = dy - 1 + (sy - (y - 1));
        if (sy < 0 || sy >= h || ty < 0 || ty >= tmph) continue;
        for (int sx = x - 1; sx < ex; ++sx) {
          const int tx = dx - 1 + (sx - (x - 1));
          if (sx < 0 || sx >= w || tx < 0 || tx >= tmpw) continue;
          for (int ch = 0; ch < 3; ++ch)
            tmp.at(ty, tx, ch) = image.at(sy, sx, ch);
        }
      }
      Tensor resized;
      mtcnn::Resize(tmp, size, size, resized);
      for (float& v : resized.data) v = (v - 127.5f) * 0.0078125f;
      mtcnn::TransposeHW(resized, crop);
    }
  }

  // NMS over the first 5 columns of 9-col rows
  static std::vector<int> Nms5(const std::vector<std::array<float, 9>>& rows,
                               float threshold, NmsMethod method) {
    std::vector<float> flat(rows.size() * 5);
    for (size_t i = 0; i < rows.size(); ++i)
      for (int j = 0; j < 5; ++j) flat[i * 5 + j] = rows[i][j];
    return Nms(flat.data(), static_cast<int>(rows.size()), threshold, method);
  }

  static void Gather(std::vector<std::array<float, 9>>& rows,
                     const std::vector<int>& pick) {
    std::vector<std::array<float, 9>> out;
    out.reserve(pick.size());
    for (int i : pick) out.push_back(rows[i]);
    rows.swap(out);
  }

  // flatten-adapter over the shared nms.hpp helpers (same pattern as Nms5)
  static void BBRegRows(std::vector<std::array<float, 9>>& rows,
                        const std::vector<std::array<float, 4>>& reg) {
    std::vector<float> flat(rows.size() * 5);
    std::vector<float> regs(rows.size() * 4);
    for (size_t i = 0; i < rows.size(); ++i) {
      for (int j = 0; j < 5; ++j) flat[i * 5 + j] = rows[i][j];
      for (int j = 0; j < 4; ++j) regs[i * 4 + j] = reg[i][j];
    }
    BBReg(flat.data(), regs.data(), static_cast<int>(rows.size()));
    for (size_t i = 0; i < rows.size(); ++i)
      for (int j = 0; j < 4; ++j) rows[i][j] = flat[i * 5 + j];
  }

  static void RerecRows(std::vector<std::array<float, 9>>& rows) {
    std::vector<float> flat(rows.size() * 5);
    for (size_t i = 0; i < rows.size(); ++i)
      for (int j = 0; j < 5; ++j) flat[i * 5 + j] = rows[i][j];
    Rerec(flat.data(), static_cast<int>(rows.size()));
    for (size_t i = 0; i < rows.size(); ++i)
      for (int j = 0; j < 4; ++j) rows[i][j] = flat[i * 5 + j];
  }

  // conv dispatch: f32 GEMM, or the int8 path for deep-enough kernels
  void Conv(const Tensor& x, const std::string& prefix, Tensor& out) const {
    const NpyArray& kernel = get(prefix + "/weights");
    const NpyArray& bias = get(prefix + "/biases");
    const int kh = static_cast<int>(kernel.shape[0]);
    const int kw = static_cast<int>(kernel.shape[1]);
    const int cin = static_cast<int>(kernel.shape[2]);
    const int cout = static_cast<int>(kernel.shape[3]);
    const int k = kh * kw * cin;
    auto it = quantized_ && k >= 64 ? qcache_.find(prefix) : qcache_.end();
    if (it != qcache_.end()) {
      if (cin != x.c)
        throw std::runtime_error("mtcnn qconv: channel mismatch");
      mtcnn::ConvValidQ(x, kh, kw, it->second, bias.f32(), out);
    } else {
      mtcnn::ConvValid(x, kernel, bias, out);
    }
    (void)cout;
  }

  const NpyArray& get(const std::string& key) const {
    auto it = w_.find(key);
    if (it == w_.end())
      throw std::runtime_error("mtcnn: missing tensor " + key);
    return it->second;
  }

  std::map<std::string, NpyArray> w_;
  bool quantized_ = false;
  bool timelog_ = false;
  std::map<std::string, nn::QuantizedKernel> qcache_;  // filled in ctor
};

}  // namespace facejax
