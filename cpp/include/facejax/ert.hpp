// Native ERT 68-point shape regression — the landmark-refinement half of
// the reference's MTCNN_Dlib_Detection (MTCNN.hpp:1326-1421: dlib
// shape_predictor seeded by an affine warp of the MTCNN 5-point output).
// Executes the Kazemi-Sullivan cascade from an export_ert .npz (the model
// trained by detect/ert.py::train_shape_predictor); numerics mirror
// detect/ert.py::ShapePredictor.predict exactly:
//   - shapes live in the unit square of the detection rect
//   - feature pixels = anchor landmark + mean-shape-relative delta mapped
//     through the current shape's similarity transform (rotation/scale)
//   - int64-truncate + clip pixel indexing
//   - heap-ordered depth-D tree traversal, summed leaf vectors
// The similarity transform is the closed-form 2-D Procrustes solution —
// identical to the SVD Umeyama restricted to rotations for non-degenerate
// data (the only kind a face produces).

#pragma once

#include <cmath>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

#include "facejax/npz.hpp"

namespace facejax {

class NativeErt {
 public:
  explicit NativeErt(const std::string& weights_npz)
      : w_(LoadNpz(weights_npz)) {
    const NpyArray& ms = get("mean_shape");
    n_points_ = static_cast<int>(ms.shape[0]);
    mean_shape_.assign(ms.f32(), ms.f32() + n_points_ * 2);
    n_levels_ = static_cast<int>(get("num_levels").f32()[0]);
    levels_.resize(n_levels_);
    for (int t = 0; t < n_levels_; ++t) {
      Level& lv = levels_[t];
      const std::string p = "level" + std::to_string(t) + "/";
      const NpyArray& anchors = get(p + "anchors");
      lv.n_feats = static_cast<int>(anchors.shape[0]);
      lv.anchors.resize(lv.n_feats);
      for (int i = 0; i < lv.n_feats; ++i)
        lv.anchors[i] = static_cast<int>(anchors.f32()[i]);
      const NpyArray& deltas = get(p + "deltas");
      lv.deltas.assign(deltas.f32(), deltas.f32() + lv.n_feats * 2);
      const NpyArray& s1 = get(p + "split_idx1");
      const NpyArray& s2 = get(p + "split_idx2");
      const NpyArray& th = get(p + "split_thresh");
      const NpyArray& leaves = get(p + "leaf_values");
      lv.n_trees = static_cast<int>(s1.shape[0]);
      lv.n_internal = static_cast<int>(s1.shape[1]);
      lv.n_leaves = static_cast<int>(leaves.shape[1]);
      const size_t ns = static_cast<size_t>(lv.n_trees) * lv.n_internal;
      lv.split_idx1.resize(ns);
      lv.split_idx2.resize(ns);
      for (size_t i = 0; i < ns; ++i) {
        lv.split_idx1[i] = static_cast<int>(s1.f32()[i]);
        lv.split_idx2[i] = static_cast<int>(s2.f32()[i]);
      }
      lv.split_thresh.assign(th.f32(), th.f32() + ns);
      lv.leaf_values.assign(
          leaves.f32(),
          leaves.f32() +
              static_cast<size_t>(lv.n_trees) * lv.n_leaves * n_points_ * 2);
    }
    if (n_points_ == 68) ComputeMeanFive();
  }

  int num_points() const { return n_points_; }

  // least-squares similarity src->dst ([n, 2] each): 2x3 row-major
  static void SimilarityTransform(const float* src, const float* dst, int n,
                                  double m[6]) {
    double msx = 0, msy = 0, mdx = 0, mdy = 0;
    for (int i = 0; i < n; ++i) {
      msx += src[2 * i];
      msy += src[2 * i + 1];
      mdx += dst[2 * i];
      mdy += dst[2 * i + 1];
    }
    msx /= n; msy /= n; mdx /= n; mdy /= n;
    double a = 0, b = 0, den = 0;
    for (int i = 0; i < n; ++i) {
      const double x = src[2 * i] - msx, y = src[2 * i + 1] - msy;
      const double u = dst[2 * i] - mdx, v = dst[2 * i + 1] - mdy;
      a += x * u + y * v;
      b += x * v - y * u;
      den += x * x + y * y;
    }
    const double A = den > 0 ? a / den : 1.0;
    const double B = den > 0 ? b / den : 0.0;
    m[0] = A; m[1] = -B; m[2] = mdx - (A * msx - B * msy);
    m[3] = B; m[4] = A;  m[5] = mdy - (B * msx + A * msy);
  }

  // MTCNN seeding (detect/ert.py::init_shape_from_5pt): box-normalize the
  // detected 5 points, similarity-map the mean shape's canonical 5 onto
  // them, apply to all 68. out: [n_points, 2] box-normalized.
  void InitShapeFrom5pt(const float five_xy[10], const float rect[4],
                        float* out) const {
    if (n_points_ != 68)
      throw std::runtime_error("ert: 5pt seeding needs a 68-point model");
    const double w = std::max<double>(rect[2] - rect[0], 1e-6);
    const double h = std::max<double>(rect[3] - rect[1], 1e-6);
    float five_norm[10];
    for (int i = 0; i < 5; ++i) {
      five_norm[2 * i] = static_cast<float>((five_xy[2 * i] - rect[0]) / w);
      five_norm[2 * i + 1] =
          static_cast<float>((five_xy[2 * i + 1] - rect[1]) / h);
    }
    double md[6];
    SimilarityTransform(mean_five_.data(), five_norm, 5, md);
    // the Python reference rounds the transform to float32 before applying
    // (similarity_transform returns .astype(np.float32)); mirror that so
    // truncation boundaries agree exactly
    float m[6];
    for (int i = 0; i < 6; ++i) m[i] = static_cast<float>(md[i]);
    for (int i = 0; i < n_points_; ++i) {
      const float x = mean_shape_[2 * i], y = mean_shape_[2 * i + 1];
      out[2 * i] = m[0] * x + m[1] * y + m[2];
      out[2 * i + 1] = m[3] * x + m[4] * y + m[5];
    }
  }

  // img: h*w float32 grayscale; rect x1y1x2y2; init (box-normalized
  // [n_points, 2]) or nullptr for the mean shape. out: [n_points, 2]
  // IMAGE coordinates (full_object_detection.part() contract).
  void Predict(const float* img, int h, int w, const float rect[4],
               const float* init, float* out) const {
    std::vector<float> shape(
        init ? std::vector<float>(init, init + n_points_ * 2)
             : mean_shape_);
    const double rw = std::max<double>(rect[2] - rect[0], 1e-6);
    const double rh = std::max<double>(rect[3] - rect[1], 1e-6);
    std::vector<float> feats;
    for (const Level& lv : levels_) {
      // feature pixels through the current shape's similarity transform —
      // rounded to float32 like the Python reference (m .astype(float32),
      // pts computed in f32) so pixel truncation boundaries agree
      double md[6];
      SimilarityTransform(mean_shape_.data(), shape.data(), n_points_, md);
      float m[6];
      for (int i = 0; i < 6; ++i) m[i] = static_cast<float>(md[i]);
      feats.resize(lv.n_feats);
      for (int p = 0; p < lv.n_feats; ++p) {
        const float dx = lv.deltas[2 * p], dy = lv.deltas[2 * p + 1];
        const float px = shape[2 * lv.anchors[p]] + m[0] * dx + m[1] * dy;
        const float py =
            shape[2 * lv.anchors[p] + 1] + m[3] * dx + m[4] * dy;
        // int64-truncate then clip, matching np .astype(int64) + np.clip
        long long xi = static_cast<long long>(
            static_cast<double>(px) * rw + rect[0]);
        long long yi = static_cast<long long>(
            static_cast<double>(py) * rh + rect[1]);
        xi = std::min<long long>(std::max<long long>(xi, 0), w - 1);
        yi = std::min<long long>(std::max<long long>(yi, 0), h - 1);
        feats[p] = img[yi * w + xi];
      }
      // all trees: heap traversal + summed leaf vectors
      const int depth_steps = [&] {
        int d = 0, leaves = lv.n_leaves;
        while (leaves > 1) {
          leaves >>= 1;
          ++d;
        }
        return d;
      }();
      for (int k = 0; k < lv.n_trees; ++k) {
        int node = 0;
        const int base = k * lv.n_internal;
        for (int d = 0; d < depth_steps; ++d) {
          const float f1 = feats[lv.split_idx1[base + node]];
          const float f2 = feats[lv.split_idx2[base + node]];
          node = 2 * node + ((f1 - f2) > lv.split_thresh[base + node]
                                 ? 1 : 2);
        }
        const int leaf = node - lv.n_internal;
        const float* lp =
            lv.leaf_values.data() +
            (static_cast<size_t>(k) * lv.n_leaves + leaf) * n_points_ * 2;
        for (int i = 0; i < n_points_ * 2; ++i) shape[i] += lp[i];
      }
    }
    for (int i = 0; i < n_points_; ++i) {
      out[2 * i] = static_cast<float>(shape[2 * i] * rw + rect[0]);
      out[2 * i + 1] = static_cast<float>(shape[2 * i + 1] * rh + rect[1]);
    }
  }

 private:
  struct Level {
    int n_feats = 0, n_trees = 0, n_internal = 0, n_leaves = 0;
    std::vector<int> anchors;
    std::vector<float> deltas;
    std::vector<int> split_idx1, split_idx2;
    std::vector<float> split_thresh;
    std::vector<float> leaf_values;
  };

  // iBUG-68 canonical 5 points of the mean shape (detect/ert.py:36-51)
  void ComputeMeanFive() {
    mean_five_.assign(10, 0.0f);
    auto add = [&](int slot, int idx, float wgt) {
      mean_five_[2 * slot] += wgt * mean_shape_[2 * idx];
      mean_five_[2 * slot + 1] += wgt * mean_shape_[2 * idx + 1];
    };
    for (int i = 36; i < 42; ++i) add(0, i, 1.0f / 6);  // left eye
    for (int i = 42; i < 48; ++i) add(1, i, 1.0f / 6);  // right eye
    add(2, 30, 1.0f);                                   // nose tip
    add(3, 48, 1.0f);                                   // mouth L
    add(4, 54, 1.0f);                                   // mouth R
  }

  const NpyArray& get(const std::string& key) const {
    auto it = w_.find(key);
    if (it == w_.end())
      throw std::runtime_error("ert: missing tensor " + key);
    return it->second;
  }

  std::map<std::string, NpyArray> w_;
  std::vector<float> mean_shape_, mean_five_;
  std::vector<Level> levels_;
  int n_points_ = 0, n_levels_ = 0;
};

}  // namespace facejax
