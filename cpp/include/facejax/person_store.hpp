// Person-level identity store: persons with N face rows each, soft
// delete, and the card-only pre-registration queue — native C++.
//
// The reference's C++ layer held the person/face relational model
// (Feature.hpp:33-146 Person/FeatureVec structs; :679-932
// Select_Registed_Data / Register_PDB / Register_PDB_onlyCard /
// isExistIDNumber over the Valid_person/Valid_Face views). The flat
// `identity_store.hpp` covers the SQLite reg_face side (C19); this class
// is the native C20: person -> faces grouping, person_flag soft delete,
// and the wanna_regist promote flow, mirroring the Python
// serve/person_store.py semantics 1:1 (same reserved TMP person pid 0,
// same valid-face rule person_flag != 0 && pid != 0).
//
// File layout ("FJPD" v1, little-endian) — the INTERCHANGE format with
// the Python store (serve/person_store.py export_fjpd/import_fjpd):
//   magic "FJPD" u32 | version u32 | dim u32 |
//   next_pid u32 | next_fid u32 | next_rid u32 |
//   n_persons u32 | n_faces u32 | n_regs u32
//   per person: pid i32 | person_flag i32 | name str | role_title str |
//               email str | student_id str | card_id str | profile_img str
//   per face:   fid i32 | pid i32 | img_path str | norm f32 | dim x f32
//   per reg:    rid i32 | card_id str | nf u32 | nf x fid i32
//   (str = u32 byte length + bytes, UTF-8)

#pragma once

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "matcher.hpp"

namespace facejax {

struct PersonRec {
  int32_t pid = -1;
  std::string name, role_title, email, student_id, card_id, profile_img;
  int32_t person_flag = 1;
};

struct PersonMatch {
  int pid = -1;          // -1: below threshold / empty store
  int fid = -1;
  float similarity = 0.0f;
};

class PersonStore {
 public:
  static constexpr int kTmpPid = 0;  // reserved card-only parking person

  explicit PersonStore(std::string path, int dim)
      : path_(std::move(path)), dim_(dim) {
    const LoadResult r = Load();
    if (r != kLoaded) {
      if (r == kCorrupt) {
        // NEVER clobber an existing store we could not read (wrong dim,
        // truncation, corruption): move it aside so the fresh store's
        // first Persist cannot destroy the only copy.
        std::rename(path_.c_str(), (path_ + ".corrupt").c_str());
      }
      // fresh store: the reserved TMP person (flag 0 keeps it invalid)
      PersonRec tmp;
      tmp.pid = kTmpPid;
      tmp.name = "TMP";
      tmp.person_flag = 0;
      persons_.push_back(tmp);
      next_pid_ = 1;
      Persist();
    }
    RebuildValid();
  }

  int dim() const { return dim_; }
  int num_persons() const {  // valid persons (the Valid_person view)
    int n = 0;
    for (const auto& p : persons_)
      if (p.person_flag != 0 && p.pid != kTmpPid) ++n;
    return n;
  }
  int num_faces() const { return static_cast<int>(face_fid_.size()); }
  int valid_faces() const { return static_cast<int>(vfid_.size()); }

  const PersonRec* FindPerson(int pid) const {
    for (const auto& p : persons_)
      if (p.pid == pid) return &p;
    return nullptr;
  }

  const PersonRec* FindByCard(const std::string& card_id) const {
    for (const auto& p : persons_)
      if (p.person_flag != 0 && p.pid != kTmpPid && p.card_id == card_id)
        return &p;
    return nullptr;
  }

  // isExistIDNumber (Feature.hpp:918-932): student-id lookup over valid
  // persons.
  const PersonRec* ExistsIdNumber(const std::string& student_id) const {
    for (const auto& p : persons_)
      if (p.person_flag != 0 && p.pid != kTmpPid &&
          p.student_id == student_id)
        return &p;
    return nullptr;
  }

  // Register_PDB person row (Feature.hpp:806-859). Returns the new pid.
  int RegisterPerson(PersonRec person) {
    person.pid = next_pid_++;
    persons_.push_back(std::move(person));
    Persist();
    return persons_.back().pid;
  }

  // Attach one face to a person. With dedup_th > 0, skips when a VALID
  // face already matches above the threshold (Register_DB_File's
  // same-feature guard, Feature.hpp:467-471) and returns -(1 + that
  // fid). Returns the new fid otherwise; -1 on unknown pid.
  int AddFace(int pid, const float* fv, float dedup_th = -1.0f,
              const std::string& img_path = "") {
    if (FindPerson(pid) == nullptr) return -1;
    if (dedup_th > 0.0f && !vfid_.empty()) {
      MatchResult m = MatchGallery(vfeat_.data(), vnorm_.data(),
                                   valid_faces(), dim_, fv, dedup_th);
      if (m.index >= 0) return -(1 + vfid_[m.index]);
    }
    const int fid = next_fid_++;
    face_fid_.push_back(fid);
    face_pid_.push_back(pid);
    face_img_.push_back(img_path);
    face_feat_.insert(face_feat_.end(), fv, fv + dim_);
    face_norm_.push_back(Norm(fv, dim_));
    RebuildValid();
    Persist();
    return fid;
  }

  // Compare_Face_DB (Feature.hpp:766-804): max cosine over every valid
  // face; the owning person wins if it clears the threshold.
  PersonMatch Match(const float* fv, float sim_th) const {
    PersonMatch out;
    if (vfid_.empty()) return out;
    MatchResult m = MatchGallery(vfeat_.data(), vnorm_.data(),
                                 valid_faces(), dim_, fv, sim_th);
    out.similarity = m.similarity;
    if (m.index >= 0) {
      out.fid = vfid_[m.index];
      out.pid = vpid_[m.index];
    }
    return out;
  }

  // Soft delete / restore (person_flag = 0 retires every face of the
  // person from matching). pid 0 is reserved; returns false for it and
  // for unknown pids.
  bool SetPersonFlag(int pid, int flag) {
    if (pid == kTmpPid) return false;
    for (auto& p : persons_)
      if (p.pid == pid) {
        p.person_flag = flag;
        RebuildValid();
        Persist();
        return true;
      }
    return false;
  }

  // Hard-delete a person row that never acquired a face (the enroll
  // flow creates the row before the first AddFace; if every view
  // dedup-rejects, the empty row must not persist). Refuses for TMP,
  // for unknown pids, and for persons with faces (soft delete covers
  // those). Returns true when a row was removed.
  bool RemovePersonIfEmpty(int pid) {
    if (pid == kTmpPid) return false;
    for (int fpid : face_pid_)
      if (fpid == pid) return false;
    for (auto it = persons_.begin(); it != persons_.end(); ++it)
      if (it->pid == pid) {
        persons_.erase(it);
        RebuildValid();
        Persist();
        return true;
      }
    return false;
  }

  // Register_PDB_onlyCard (Feature.hpp:861-896): park n faces under the
  // TMP person and queue the card id. Returns the rid.
  int RegisterCardOnly(const std::string& card_id, const float* fvs,
                       int n) {
    Pending reg;
    reg.rid = next_rid_++;
    reg.card_id = card_id;
    for (int i = 0; i < n; ++i) {
      const int fid = next_fid_++;
      const float* fv = fvs + static_cast<size_t>(i) * dim_;
      face_fid_.push_back(fid);
      face_pid_.push_back(kTmpPid);
      face_img_.push_back("TMP");
      face_feat_.insert(face_feat_.end(), fv, fv + dim_);
      face_norm_.push_back(Norm(fv, dim_));
      reg.fids.push_back(fid);
    }
    regs_.push_back(std::move(reg));
    RebuildValid();  // TMP faces stay invalid; cache shape unchanged
    Persist();
    return regs_.back().rid;
  }

  struct Pending {
    int32_t rid = -1;
    std::string card_id;
    std::vector<int32_t> fids;
  };
  const std::vector<Pending>& PendingRegistrations() const { return regs_; }

  // Promote a card-only registration to a real person: create the person
  // (card id inherited from the queue when empty) and re-home the parked
  // faces. Returns the new pid, or -1 for an unknown rid.
  int PromoteRegistration(int rid, PersonRec person) {
    size_t ri = regs_.size();
    for (size_t i = 0; i < regs_.size(); ++i)
      if (regs_[i].rid == rid) ri = i;
    if (ri == regs_.size()) return -1;
    if (person.card_id.empty()) person.card_id = regs_[ri].card_id;
    person.pid = next_pid_++;
    persons_.push_back(std::move(person));
    const int pid = persons_.back().pid;
    for (int fid : regs_[ri].fids)
      for (size_t j = 0; j < face_fid_.size(); ++j)
        if (face_fid_[j] == fid) face_pid_[j] = pid;
    regs_.erase(regs_.begin() + ri);
    RebuildValid();
    Persist();
    return pid;
  }

  // Valid-face gallery view (for bulk matching / diagnostics).
  const float* valid_gallery() const { return vfeat_.data(); }
  const float* valid_norms() const { return vnorm_.data(); }
  const std::vector<int32_t>& valid_fids() const { return vfid_; }
  const std::vector<int32_t>& valid_pids() const { return vpid_; }

 private:
  bool valid_pid(int pid) const {
    const PersonRec* p = FindPerson(pid);
    return p != nullptr && p->person_flag != 0 && p->pid != kTmpPid;
  }

  void RebuildValid() {
    vfeat_.clear();
    vnorm_.clear();
    vfid_.clear();
    vpid_.clear();
    for (size_t i = 0; i < face_fid_.size(); ++i) {
      if (!valid_pid(face_pid_[i])) continue;
      const float* fv = face_feat_.data() + i * dim_;
      vfeat_.insert(vfeat_.end(), fv, fv + dim_);
      vnorm_.push_back(face_norm_[i]);
      vfid_.push_back(face_fid_[i]);
      vpid_.push_back(face_pid_[i]);
    }
  }

  // ------------------------------------------------------------- file IO
  static bool ReadU32(FILE* f, uint32_t& v) {
    return std::fread(&v, 4, 1, f) == 1;
  }
  static bool ReadI32(FILE* f, int32_t& v) {
    return std::fread(&v, 4, 1, f) == 1;
  }
  static bool ReadStr(FILE* f, std::string& s) {
    uint32_t len = 0;
    if (!ReadU32(f, len) || len > (1u << 20)) return false;
    s.resize(len);
    return len == 0 || std::fread(&s[0], 1, len, f) == len;
  }
  static void WriteU32(FILE* f, uint32_t v) { std::fwrite(&v, 4, 1, f); }
  static void WriteI32(FILE* f, int32_t v) { std::fwrite(&v, 4, 1, f); }
  static void WriteStr(FILE* f, const std::string& s) {
    WriteU32(f, static_cast<uint32_t>(s.size()));
    std::fwrite(s.data(), 1, s.size(), f);
  }

  enum LoadResult { kLoaded, kNoFile, kCorrupt };

  LoadResult Load() {
    FILE* f = std::fopen(path_.c_str(), "rb");
    if (!f) return kNoFile;
    std::fseek(f, 0, SEEK_END);
    const long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    uint32_t magic = 0, version = 0, dim = 0, np = 0, nf = 0, nr = 0;
    uint32_t npid = 0, nfid = 0, nrid = 0;
    bool ok = ReadU32(f, magic) && magic == 0x44504A46u &&  // "FJPD"
              ReadU32(f, version) && version == 1 && ReadU32(f, dim) &&
              static_cast<int>(dim) == dim_ && ReadU32(f, npid) &&
              ReadU32(f, nfid) && ReadU32(f, nrid) && ReadU32(f, np) &&
              ReadU32(f, nf) && ReadU32(f, nr);
    // the counts are UNTRUSTED: each record costs at least 8 bytes on
    // disk (a face costs 12 + 4*dim), so a corrupt header whose counts
    // cannot fit in the file must not drive a giant reserve()
    ok = ok && fsize >= 0 &&
         static_cast<uint64_t>(np) <= static_cast<uint64_t>(fsize) / 8 &&
         static_cast<uint64_t>(nf) <=
             static_cast<uint64_t>(fsize) / (12 + 4 * (uint64_t)dim_) &&
         static_cast<uint64_t>(nr) <= static_cast<uint64_t>(fsize) / 8;
    if (ok) {
      next_pid_ = npid, next_fid_ = nfid, next_rid_ = nrid;
      for (uint32_t i = 0; ok && i < np; ++i) {
        PersonRec p;
        ok = ReadI32(f, p.pid) && ReadI32(f, p.person_flag) &&
             ReadStr(f, p.name) && ReadStr(f, p.role_title) &&
             ReadStr(f, p.email) && ReadStr(f, p.student_id) &&
             ReadStr(f, p.card_id) && ReadStr(f, p.profile_img);
        if (ok) persons_.push_back(std::move(p));
      }
      face_feat_.reserve(static_cast<size_t>(nf) * dim_);
      for (uint32_t i = 0; ok && i < nf; ++i) {
        int32_t fid = 0, pid = 0;
        std::string img;
        float norm = 0.0f;
        std::vector<float> fv(dim_);
        ok = ReadI32(f, fid) && ReadI32(f, pid) && ReadStr(f, img) &&
             std::fread(&norm, 4, 1, f) == 1 &&
             std::fread(fv.data(), 4, dim_, f) ==
                 static_cast<size_t>(dim_);
        if (ok) {
          face_fid_.push_back(fid);
          face_pid_.push_back(pid);
          face_img_.push_back(std::move(img));
          face_norm_.push_back(norm);
          face_feat_.insert(face_feat_.end(), fv.begin(), fv.end());
        }
      }
      for (uint32_t i = 0; ok && i < nr; ++i) {
        Pending r;
        uint32_t k = 0;
        ok = ReadI32(f, r.rid) && ReadStr(f, r.card_id) && ReadU32(f, k) &&
             k <= nfid;
        for (uint32_t j = 0; ok && j < k; ++j) {
          int32_t fid = 0;
          ok = ReadI32(f, fid);
          if (ok) r.fids.push_back(fid);
        }
        if (ok) regs_.push_back(std::move(r));
      }
    }
    std::fclose(f);
    if (!ok) {  // corrupt file: start fresh rather than half-load
      persons_.clear();
      face_fid_.clear();
      face_pid_.clear();
      face_img_.clear();
      face_feat_.clear();
      face_norm_.clear();
      regs_.clear();
      next_pid_ = 1;
      next_fid_ = 1;
      next_rid_ = 1;
    }
    return ok ? kLoaded : kCorrupt;
  }

  void Persist() const {
    const std::string tmp = path_ + ".tmp";
    FILE* f = std::fopen(tmp.c_str(), "wb");
    if (!f) return;
    WriteU32(f, 0x44504A46u);  // "FJPD"
    WriteU32(f, 1);
    WriteU32(f, static_cast<uint32_t>(dim_));
    WriteU32(f, static_cast<uint32_t>(next_pid_));
    WriteU32(f, static_cast<uint32_t>(next_fid_));
    WriteU32(f, static_cast<uint32_t>(next_rid_));
    WriteU32(f, static_cast<uint32_t>(persons_.size()));
    WriteU32(f, static_cast<uint32_t>(face_fid_.size()));
    WriteU32(f, static_cast<uint32_t>(regs_.size()));
    for (const auto& p : persons_) {
      WriteI32(f, p.pid);
      WriteI32(f, p.person_flag);
      WriteStr(f, p.name);
      WriteStr(f, p.role_title);
      WriteStr(f, p.email);
      WriteStr(f, p.student_id);
      WriteStr(f, p.card_id);
      WriteStr(f, p.profile_img);
    }
    for (size_t i = 0; i < face_fid_.size(); ++i) {
      WriteI32(f, face_fid_[i]);
      WriteI32(f, face_pid_[i]);
      WriteStr(f, face_img_[i]);
      std::fwrite(&face_norm_[i], 4, 1, f);
      std::fwrite(face_feat_.data() + i * dim_, 4, dim_, f);
    }
    for (const auto& r : regs_) {
      WriteI32(f, r.rid);
      WriteStr(f, r.card_id);
      WriteU32(f, static_cast<uint32_t>(r.fids.size()));
      for (int32_t fid : r.fids) WriteI32(f, fid);
    }
    std::fclose(f);
    std::rename(tmp.c_str(), path_.c_str());
  }

  std::string path_;
  int dim_;
  int32_t next_pid_ = 1, next_fid_ = 1, next_rid_ = 1;
  std::vector<PersonRec> persons_;
  std::vector<int32_t> face_fid_, face_pid_;
  std::vector<std::string> face_img_;
  std::vector<float> face_feat_, face_norm_;
  std::vector<Pending> regs_;
  // valid-face cache (the Valid_Face view + cached norms)
  std::vector<float> vfeat_, vnorm_;
  std::vector<int32_t> vfid_, vpid_;
};

}  // namespace facejax
