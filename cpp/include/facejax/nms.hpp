// Greedy NMS + box post-processing (native serving-side copy of the
// cascade's host math; reference MTCNN.hpp:187-252, detect_face.py:626-744).

#pragma once

#include <algorithm>
#include <cmath>
#include <numeric>
#include <vector>

namespace facejax {

enum class NmsMethod { kUnion = 0, kMin = 1 };

// boxes: row-major [n x 5] (x1 y1 x2 y2 score). Returns kept indices in
// descending score order.
inline std::vector<int> Nms(const float* boxes, int n, float threshold,
                            NmsMethod method) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    return boxes[a * 5 + 4] > boxes[b * 5 + 4];
  });
  std::vector<float> area(n);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + i * 5;
    area[i] = (b[2] - b[0] + 1) * (b[3] - b[1] + 1);
  }
  std::vector<char> alive(n, 1);
  std::vector<int> keep;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (!alive[i]) continue;
    keep.push_back(i);
    const float* bi = boxes + i * 5;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (!alive[j]) continue;
      const float* bj = boxes + j * 5;
      float xx1 = std::max(bi[0], bj[0]);
      float yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]);
      float yy2 = std::min(bi[3], bj[3]);
      float w = std::max(0.f, xx2 - xx1 + 1);
      float h = std::max(0.f, yy2 - yy1 + 1);
      float inter = w * h;
      float o = (method == NmsMethod::kMin)
                    ? inter / std::min(area[i], area[j])
                    : inter / (area[i] + area[j] - inter);
      if (o > threshold) alive[j] = 0;
    }
  }
  return keep;
}

// In-place box regression (detect_face.py:627-639).
inline void BBReg(float* boxes, const float* reg, int n) {
  for (int i = 0; i < n; ++i) {
    float* b = boxes + i * 5;
    const float* r = reg + i * 4;
    float w = b[2] - b[0] + 1;
    float h = b[3] - b[1] + 1;
    b[0] += r[0] * w;
    b[1] += r[1] * h;
    b[2] += r[2] * w;
    b[3] += r[3] * h;
  }
}

// In-place square expansion about centers (detect_face.py:736-744).
inline void Rerec(float* boxes, int n) {
  for (int i = 0; i < n; ++i) {
    float* b = boxes + i * 5;
    float w = b[2] - b[0];
    float h = b[3] - b[1];
    float l = std::max(w, h);
    b[0] = b[0] + w * 0.5f - l * 0.5f;
    b[1] = b[1] + h * 0.5f - l * 0.5f;
    b[2] = b[0] + l;
    b[3] = b[1] + l;
  }
}

}  // namespace facejax
