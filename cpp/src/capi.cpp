// C API for the native serving layer (consumed via ctypes from
// serve/native.py; pybind11 is not in this image).

#include <cstring>
#include <string>

#include "facejax/clustering.hpp"
#include "facejax/efmnet.hpp"
#include "facejax/identity_store.hpp"
#include "facejax/matcher.hpp"
#include "facejax/nms.hpp"
#include "facejax/spsc_queue.hpp"
#include "facejax/state_machine.hpp"

extern "C" {

// ---- matcher ----

float fx_dot(const float* a, const float* b, int d) {
  return facejax::Dot(a, b, d);
}

float fx_cosine(const float* a, const float* b, int d) {
  return facejax::Cosine(a, b, d);
}

// Returns best index or -1; writes best similarity to *sim_out.
int fx_match_gallery(const float* gallery, const float* norms, int n, int d,
                     const float* query, float sim_th, float* sim_out) {
  facejax::MatchResult m =
      facejax::MatchGallery(gallery, norms, n, d, query, sim_th);
  if (sim_out) *sim_out = m.similarity;
  return m.index;
}

void fx_gallery_norms(const float* gallery, int n, int d, float* out) {
  auto norms = facejax::GalleryNorms(gallery, n, d);
  std::memcpy(out, norms.data(), sizeof(float) * norms.size());
}

// ---- identity store ----

void* fx_store_open(const char* path, int dim) {
  return new facejax::IdentityStore(path, dim);
}

void fx_store_close(void* s) {
  delete static_cast<facejax::IdentityStore*>(s);
}

int fx_store_size(void* s) {
  return static_cast<facejax::IdentityStore*>(s)->size();
}

// Register_and_Check_DB_File semantics (Feature.hpp:614-667): skip
// registration when the NAME is already enrolled.
int fx_store_exists(void* s, const char* name) {
  return static_cast<facejax::IdentityStore*>(s)->Exists(name) ? 1 : 0;
}

int fx_store_register(void* s, const char* name, const float* fv,
                      float dedup_th) {
  return static_cast<facejax::IdentityStore*>(s)->Register(name, fv,
                                                           dedup_th);
}

int fx_store_register_meta(void* s, const char* name, const char* meta,
                           const float* fv, float dedup_th) {
  return static_cast<facejax::IdentityStore*>(s)->Register(
      name, fv, dedup_th, meta ? meta : "");
}

int fx_store_meta(void* s, int index, char* meta_out, int cap) {
  auto* store = static_cast<facejax::IdentityStore*>(s);
  if (index < 0 || index >= store->size()) return -1;
  std::snprintf(meta_out, cap, "%s", store->meta(index).c_str());
  return 0;
}

// Returns match index or -1; writes name (truncated to cap) and similarity.
int fx_store_match(void* s, const float* fv, float sim_th, char* name_out,
                   int name_cap, float* sim_out) {
  auto* store = static_cast<facejax::IdentityStore*>(s);
  facejax::MatchResult m = store->Match(fv, sim_th);
  if (sim_out) *sim_out = m.similarity;
  if (m.index >= 0 && name_out && name_cap > 0) {
    const std::string& n = store->name(m.index);
    std::snprintf(name_out, name_cap, "%s", n.c_str());
  }
  return m.index;
}

int fx_store_name(void* s, int index, char* name_out, int name_cap) {
  auto* store = static_cast<facejax::IdentityStore*>(s);
  if (index < 0 || index >= store->size()) return -1;
  std::snprintf(name_out, name_cap, "%s", store->name(index).c_str());
  return 0;
}

// ---- NMS / box post-processing ----

int fx_nms(const float* boxes, int n, float threshold, int method, int* keep,
           int cap) {
  auto kept = facejax::Nms(boxes, n, threshold,
                           method == 1 ? facejax::NmsMethod::kMin
                                       : facejax::NmsMethod::kUnion);
  int count = 0;
  for (int idx : kept) {
    if (count >= cap) break;
    keep[count++] = idx;
  }
  return count;
}

void fx_bbreg(float* boxes, const float* reg, int n) {
  facejax::BBReg(boxes, reg, n);
}

void fx_rerec(float* boxes, int n) { facejax::Rerec(boxes, n); }

// ---- clustering ----

int fx_select_representatives(const float* features, int n, int d,
                              float sim_threshold, int* out, int cap) {
  auto sel = facejax::SelectRepresentatives(features, n, d, sim_threshold);
  int count = 0;
  for (int idx : sel) {
    if (count >= cap) break;
    out[count++] = idx;
  }
  return count;
}

// ---- SPSC frame queue (float-buffer payloads) ----

struct FxFrame {
  std::vector<float> data;
  long seq;
};

void* fx_queue_create() {
  return new facejax::SpscQueue<FxFrame>();
}

void fx_queue_destroy(void* q) {
  delete static_cast<facejax::SpscQueue<FxFrame>*>(q);
}

void fx_queue_produce(void* q, const float* data, int n, long seq) {
  FxFrame f;
  f.data.assign(data, data + n);
  f.seq = seq;
  static_cast<facejax::SpscQueue<FxFrame>*>(q)->Produce(std::move(f));
}

// Returns the frame length (>=0) and its seq via *seq_out, or -1 when empty.
int fx_queue_consume(void* q, float* out, int cap, int remove_old,
                     long* seq_out) {
  FxFrame f;
  bool ok = static_cast<facejax::SpscQueue<FxFrame>*>(q)->Consume(
      f, remove_old != 0);
  if (!ok) return -1;
  int n = static_cast<int>(f.data.size());
  if (out && cap >= n) std::memcpy(out, f.data.data(), sizeof(float) * n);
  if (seq_out) *seq_out = f.seq;
  return n;
}

// ---- registration state machine ----

void* fx_sm_create() { return new facejax::RegistrationStateMachine(); }
void fx_sm_destroy(void* sm) {
  delete static_cast<facejax::RegistrationStateMachine*>(sm);
}
int fx_sm_state(void* sm) {
  return static_cast<int>(
      static_cast<facejax::RegistrationStateMachine*>(sm)->state());
}
int fx_sm_handle(void* sm, int event) {
  return static_cast<facejax::RegistrationStateMachine*>(sm)->Handle(
             static_cast<facejax::Event>(event))
             ? 1
             : 0;
}

// ---- native embedding net (export-format consumer, Feature.hpp:163-205
// parity: the serving process runs the net itself, no Python attached) ----

// quantized != 0 enables the int8 AVX2 conv path (qgemm.hpp).
void* fx_net_open_q(const char* weights_npz, const char* model,
                    int quantized, char* err, int err_cap) {
  try {
    return new facejax::NativeNet(weights_npz, model, quantized != 0);
  } catch (const std::exception& e) {
    if (err && err_cap > 0) {
      std::strncpy(err, e.what(), err_cap - 1);
      err[err_cap - 1] = '\0';
    }
    return nullptr;
  }
}

void* fx_net_open(const char* weights_npz, const char* model, char* err,
                  int err_cap) {
  return fx_net_open_q(weights_npz, model, 0, err, err_cap);
}

void* fx_efmnet_open(const char* weights_npz, char* err, int err_cap) {
  return fx_net_open(weights_npz, "efmnet342", err, err_cap);
}

void fx_efmnet_close(void* net) {
  delete static_cast<facejax::NativeNet*>(net);
}

int fx_efmnet_feature_dim(void* net) {
  return static_cast<facejax::NativeNet*>(net)->feature_dim();
}

// img: h*w float32 grayscale in [0,1]; out: feature_dim floats. Returns 0
// on success, -1 on error (message in err).
int fx_efmnet_extract(void* net, const float* img, int h, int w, float* out,
                      char* err, int err_cap) {
  try {
    static_cast<facejax::NativeNet*>(net)->Extract(img, h, w, out);
    return 0;
  } catch (const std::exception& e) {
    if (err && err_cap > 0) {
      std::strncpy(err, e.what(), err_cap - 1);
      err[err_cap - 1] = '\0';
    }
    return -1;
  }
}

}  // extern "C"
