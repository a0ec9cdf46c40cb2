// Registration-image selection by similarity clustering.
//
// The reference declares `clustering(features1, features2, ids1, ids2,
// selected1, selected2, Scth)` with no implementation (clustering.h:7,
// SURVEY.md C23): pick representative registration images by similarity
// threshold. Implemented as greedy diversity selection: walk candidates in
// order and keep those whose cosine similarity to every already-selected
// representative is below Scth — yielding a small set of mutually
// dissimilar views per identity.

#pragma once

#include <vector>

#include "matcher.hpp"

namespace facejax {

// features: row-major [n x d]. Returns selected indices (always >= 1 when
// n > 0: the first candidate seeds the set).
inline std::vector<int> SelectRepresentatives(const float* features, int n,
                                              int d, float sim_threshold) {
  std::vector<int> selected;
  std::vector<float> norms = GalleryNorms(features, n, d);
  for (int i = 0; i < n; ++i) {
    const float* fi = features + static_cast<size_t>(i) * d;
    if (norms[i] == 0.f) continue;
    bool diverse = true;
    for (int j : selected) {
      const float* fj = features + static_cast<size_t>(j) * d;
      float s = Dot(fi, fj, d) / (norms[i] * norms[j]);
      if (s >= sim_threshold) {
        diverse = false;
        break;
      }
    }
    if (diverse) selected.push_back(i);
  }
  return selected;
}

}  // namespace facejax
