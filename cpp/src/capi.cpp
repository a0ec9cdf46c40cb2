// C API for the native serving layer (consumed via ctypes from
// serve/native.py; pybind11 is not in this image).

#include <cstring>
#include <string>

#include "facejax/clustering.hpp"
#include "facejax/efmnet.hpp"
#include "facejax/ert.hpp"
#include "facejax/identity_store.hpp"
#include "facejax/matcher.hpp"
#include "facejax/mtcnn.hpp"
#include "facejax/nms.hpp"
#include "facejax/spsc_queue.hpp"
#include "facejax/state_machine.hpp"

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---- runtime ----

// Cap the OpenMP team size for every native kernel in this process
// (pyramid scales, crop batches, GEMMs). n <= 0 just queries. Returns
// the resulting max team size.
int fx_set_num_threads(int n) {
#ifdef _OPENMP
  if (n > 0) omp_set_num_threads(n);
  return omp_get_max_threads();
#else
  (void)n;
  return 1;
#endif
}

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

// ---- native MTCNN cascade (full-frame detection with no Python in the
// loop; reference MTCNN.hpp:993 detection_MTCNN parity) ----

// quantized != 0 enables the int8 AVX2 conv path (qgemm.hpp).
void* fx_mtcnn_open_q(const char* weights_npz, int quantized, char* err,
                      int err_cap) {
  try {
    return new facejax::NativeMtcnn(weights_npz, quantized != 0);
  } catch (const std::exception& e) {
    if (err && err_cap > 0) {
      std::strncpy(err, e.what(), err_cap - 1);
      err[err_cap - 1] = '\0';
    }
    return nullptr;
  }
}

void* fx_mtcnn_open(const char* weights_npz, char* err, int err_cap) {
  return fx_mtcnn_open_q(weights_npz, 0, err, err_cap);
}

void fx_mtcnn_close(void* det) {
  delete static_cast<facejax::NativeMtcnn*>(det);
}

// img: h*w*c float32 RGB (or grayscale, c==1 -> replicated) in [0, 255].
// boxes_out: box_cap*5 floats; points_out: box_cap*10 floats (written in
// the reference's [10, N] layout). Returns the number of faces (clamped to
// box_cap), or -1 on error.
int fx_mtcnn_detect(void* det, const float* img, int h, int w, int c,
                    int minsize, double th1, double th2, double th3,
                    double factor, float* boxes_out, int box_cap,
                    float* points_out, char* err, int err_cap) {
  try {
    std::vector<float> rgb;
    const float* px = img;
    if (c == 1) {
      rgb.resize(static_cast<size_t>(h) * w * 3);
      for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i) {
        rgb[i * 3] = img[i];
        rgb[i * 3 + 1] = img[i];
        rgb[i * 3 + 2] = img[i];
      }
      px = rgb.data();
    } else if (c != 3) {
      throw std::runtime_error("fx_mtcnn_detect: c must be 1 or 3");
    }
    const double th[3] = {th1, th2, th3};
    std::vector<float> boxes, points;
    static_cast<facejax::NativeMtcnn*>(det)->Detect(px, h, w, minsize, th,
                                                    factor, boxes, points);
    const int n = static_cast<int>(boxes.size() / 5);
    const int out_n = std::min(n, box_cap);
    if (boxes_out)
      std::copy(boxes.begin(), boxes.begin() + out_n * 5, boxes_out);
    if (points_out)  // [10, N] rows; clamp per row
      for (int r = 0; r < 10; ++r)
        std::copy(points.begin() + static_cast<size_t>(r) * n,
                  points.begin() + static_cast<size_t>(r) * n + out_n,
                  points_out + static_cast<size_t>(r) * out_n);
    return out_n;
  } catch (const std::exception& e) {
    if (err && err_cap > 0) {
      std::strncpy(err, e.what(), err_cap - 1);
      err[err_cap - 1] = '\0';
    }
    return -1;
  }
}

// ---- native ERT 68-point shape regression (MTCNN_Dlib_Detection's
// landmark-refinement half, MTCNN.hpp:1326-1421) ----

void* fx_ert_open(const char* weights_npz, char* err, int err_cap) {
  try {
    return new facejax::NativeErt(weights_npz);
  } catch (const std::exception& e) {
    if (err && err_cap > 0) {
      std::strncpy(err, e.what(), err_cap - 1);
      err[err_cap - 1] = '\0';
    }
    return nullptr;
  }
}

void fx_ert_close(void* ert) { delete static_cast<facejax::NativeErt*>(ert); }

int fx_ert_num_points(void* ert) {
  return static_cast<facejax::NativeErt*>(ert)->num_points();
}

// img: h*w float32 grayscale; rect4: x1y1x2y2; five10: 5 MTCNN points
// (x0 y0 ... x4 y4) for seeding, or NULL for the mean-shape init.
// out: num_points*2 image coordinates. Returns 0 / -1.
int fx_ert_predict(void* ert, const float* img, int h, int w,
                   const float* rect4, const float* five10, float* out,
                   char* err, int err_cap) {
  try {
    auto* e = static_cast<facejax::NativeErt*>(ert);
    if (five10) {
      std::vector<float> init(e->num_points() * 2);
      e->InitShapeFrom5pt(five10, rect4, init.data());
      e->Predict(img, h, w, rect4, init.data(), out);
    } else {
      e->Predict(img, h, w, rect4, nullptr, out);
    }
    return 0;
  } catch (const std::exception& ex) {
    if (err && err_cap > 0) {
      std::strncpy(err, ex.what(), err_cap - 1);
      err[err_cap - 1] = '\0';
    }
    return -1;
  }
}

// The full MTCNN_Dlib_Detection flow in one native call: cascade detect,
// seed each face's 68-point init from its 5 MTCNN landmarks, refine.
// boxes_out: cap*4 (x1y1x2y2); lmk_out: cap*num_points*2 image coords.
// Returns the face count (clamped) or -1.
int fx_mtcnn_ert_detect(void* det, void* ert, const float* img, int h,
                        int w, int c, int minsize, double th1, double th2,
                        double th3, double factor, float* boxes_out,
                        int box_cap, float* lmk_out, char* err,
                        int err_cap) {
  try {
    std::vector<float> rgb;
    const float* px = img;
    if (c == 1) {
      rgb.resize(static_cast<size_t>(h) * w * 3);
      for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i)
        rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = img[i];
      px = rgb.data();
    } else if (c != 3) {
      throw std::runtime_error("fx_mtcnn_ert_detect: c must be 1 or 3");
    }
    const double th[3] = {th1, th2, th3};
    std::vector<float> boxes, points;
    static_cast<facejax::NativeMtcnn*>(det)->Detect(px, h, w, minsize, th,
                                                    factor, boxes, points);
    const int n = static_cast<int>(boxes.size() / 5);
    const int out_n = std::min(n, box_cap);
    if (out_n == 0) return 0;  // skip the grayscale pass on empty frames
    // grayscale = channel mean (detect/ert.py::mtcnn_ert_detect); for
    // c==1 input the original plane IS the grayscale
    std::vector<float> gray;
    const float* gp = img;
    if (c != 1) {
      gray.resize(static_cast<size_t>(h) * w);
      for (size_t i = 0; i < gray.size(); ++i)
        gray[i] = (px[i * 3] + px[i * 3 + 1] + px[i * 3 + 2]) / 3.0f;
      gp = gray.data();
    }
    auto* e = static_cast<facejax::NativeErt*>(ert);
    const int np2 = e->num_points() * 2;
    std::vector<float> init(np2);
    for (int i = 0; i < out_n; ++i) {
      float rect[4] = {boxes[i * 5], boxes[i * 5 + 1], boxes[i * 5 + 2],
                       boxes[i * 5 + 3]};
      float five[10];
      for (int j = 0; j < 5; ++j) {
        five[2 * j] = points[static_cast<size_t>(j) * n + i];
        five[2 * j + 1] = points[static_cast<size_t>(5 + j) * n + i];
      }
      e->InitShapeFrom5pt(five, rect, init.data());
      e->Predict(gp, h, w, rect, init.data(),
                 lmk_out + static_cast<size_t>(i) * np2);
      if (boxes_out) std::copy(rect, rect + 4, boxes_out + i * 4);
    }
    return out_n;
  } catch (const std::exception& ex) {
    if (err && err_cap > 0) {
      std::strncpy(err, ex.what(), err_cap - 1);
      err[err_cap - 1] = '\0';
    }
    return -1;
  }
}

// Stage-level forward for parity tests: stage 0 = PNet (input h*w*3
// normalized+transposed; out = h'*w'*2 prob then h'*w'*4 reg, net
// orientation, caller computes h'=(h-10)/2 etc.), stage 1 = RNet (24x24x3
// -> 6 floats), stage 2 = ONet (48x48x3 -> 16 floats). Returns 0 / -1.
int fx_mtcnn_stage(void* det, int stage, const float* x, int h, int w,
                   float* out, char* err, int err_cap) {
  try {
    auto* d = static_cast<facejax::NativeMtcnn*>(det);
    facejax::Tensor t;
    t.resize(h, w, 3);
    std::copy(x, x + static_cast<size_t>(h) * w * 3, t.data.begin());
    if (stage == 0) {
      facejax::Tensor prob, reg;
      d->PNetForward(t, prob, reg);
      std::copy(prob.data.begin(), prob.data.end(), out);
      std::copy(reg.data.begin(), reg.data.end(),
                out + prob.data.size());
    } else if (stage == 1) {
      d->RNetForward(t, out, out + 2);
    } else if (stage == 2) {
      d->ONetForward(t, out, out + 2, out + 6);
    } else {
      throw std::runtime_error("fx_mtcnn_stage: stage must be 0..2");
    }
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
