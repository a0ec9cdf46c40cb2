// Durable identity store: names + feature blobs + cached norms, with
// dedup-on-register.
//
// Native rebuild of the reference's SQLite `reg_face(IDS, NAME, FEATEXE
// blob, SIMD_DOT real)` table (Feature.hpp:431-667, SURVEY.md C19): register
// skips near-duplicates (similarity > dedup threshold vs existing rows of
// the same gallery, reference 0.99999 at Feature.hpp:468), bulk load keeps
// the whole gallery + norms in memory for the matcher, and everything
// persists to a single append-friendly binary file (no SQLite dependency in
// this image; the file IS the table).
//
// File layout: magic "FJDB" u32 | version u32 | dim u32 | nrec u32, then per
// record: name_len u32 | name bytes | meta_len u32 | meta bytes (v2+; a JSON
// blob carrying the PG schema's person fields — title/email/student_id/
// card_id/img_path, Feature.hpp:33-146) | dim floats | norm float.
// Version 1 files (no meta field) load transparently.

#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "matcher.hpp"

namespace facejax {

class IdentityStore {
 public:
  explicit IdentityStore(std::string path, int dim)
      : path_(std::move(path)), dim_(dim) {
    Load();
  }

  int dim() const { return dim_; }
  int size() const { return static_cast<int>(names_.size()); }
  const std::string& name(int i) const { return names_[i]; }
  const std::string& meta(int i) const { return metas_[i]; }
  const float* feature(int i) const {
    return features_.data() + static_cast<size_t>(i) * dim_;
  }
  const float* gallery() const { return features_.data(); }
  const float* norms() const { return norms_.data(); }

  // Returns the new row id, or -(1 + existing_id) when deduped (similarity
  // vs an existing row exceeds dedup_th; reference Feature.hpp:468).
  int Register(const std::string& name, const float* fv,
               float dedup_th = 0.99999f, const std::string& meta = "") {
    MatchResult m = MatchGallery(features_.data(), norms_.data(), size(),
                                 dim_, fv, /*sim_th=*/dedup_th);
    if (m.index >= 0) return -(1 + m.index);
    names_.push_back(name);
    metas_.push_back(meta);
    features_.insert(features_.end(), fv, fv + dim_);
    norms_.push_back(Norm(fv, dim_));
    Persist();
    return size() - 1;
  }

  // Best match over the whole store (Compare_Face_From_DB semantics).
  MatchResult Match(const float* fv, float sim_th) const {
    return MatchGallery(features_.data(), norms_.data(), size(), dim_, fv,
                        sim_th);
  }

  bool Exists(const std::string& name) const {
    for (const auto& n : names_)
      if (n == name) return true;
    return false;
  }

 private:
  void Load() {
    FILE* f = std::fopen(path_.c_str(), "rb");
    if (!f) return;
    uint32_t magic = 0, version = 0, dim = 0, nrec = 0;
    if (std::fread(&magic, 4, 1, f) != 1 || magic != 0x42444A46u ||  // "FJDB"
        std::fread(&version, 4, 1, f) != 1 ||
        std::fread(&dim, 4, 1, f) != 1 ||
        std::fread(&nrec, 4, 1, f) != 1 ||
        static_cast<int>(dim) != dim_) {
      std::fclose(f);
      return;
    }
    for (uint32_t i = 0; i < nrec; ++i) {
      uint32_t len = 0;
      if (std::fread(&len, 4, 1, f) != 1 || len > 4096) break;
      std::string name(len, '\0');
      if (len && std::fread(name.data(), 1, len, f) != len) break;
      std::string meta;
      if (version >= 2) {
        uint32_t mlen = 0;
        if (std::fread(&mlen, 4, 1, f) != 1 || mlen > 1 << 20) break;
        meta.resize(mlen);
        if (mlen && std::fread(meta.data(), 1, mlen, f) != mlen) break;
      }
      std::vector<float> fv(dim_);
      float norm = 0.f;
      if (std::fread(fv.data(), sizeof(float), dim_, f) !=
              static_cast<size_t>(dim_) ||
          std::fread(&norm, sizeof(float), 1, f) != 1)
        break;
      names_.push_back(std::move(name));
      metas_.push_back(std::move(meta));
      features_.insert(features_.end(), fv.begin(), fv.end());
      norms_.push_back(norm);
    }
    std::fclose(f);
  }

  void Persist() const {
    std::string tmp = path_ + ".tmp";
    FILE* f = std::fopen(tmp.c_str(), "wb");
    if (!f) return;
    uint32_t magic = 0x42444A46u, version = 2, dim = dim_,
             nrec = static_cast<uint32_t>(names_.size());
    std::fwrite(&magic, 4, 1, f);
    std::fwrite(&version, 4, 1, f);
    std::fwrite(&dim, 4, 1, f);
    std::fwrite(&nrec, 4, 1, f);
    for (size_t i = 0; i < names_.size(); ++i) {
      uint32_t len = static_cast<uint32_t>(names_[i].size());
      std::fwrite(&len, 4, 1, f);
      std::fwrite(names_[i].data(), 1, len, f);
      uint32_t mlen = static_cast<uint32_t>(metas_[i].size());
      std::fwrite(&mlen, 4, 1, f);
      std::fwrite(metas_[i].data(), 1, mlen, f);
      std::fwrite(features_.data() + i * dim_, sizeof(float), dim_, f);
      std::fwrite(&norms_[i], sizeof(float), 1, f);
    }
    std::fclose(f);
    std::rename(tmp.c_str(), path_.c_str());
  }

  std::string path_;
  int dim_;
  std::vector<std::string> names_;
  std::vector<std::string> metas_;  // JSON person records (PG schema, C20)
  std::vector<float> features_;  // row-major [n x dim]
  std::vector<float> norms_;     // cached sqrt_simdot per row
};

}  // namespace facejax
