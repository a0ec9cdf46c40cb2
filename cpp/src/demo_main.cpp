// facejax_demo — the standalone native recognition app, zero Python.
//
// The reference's L4 runtime is a C++ camera app (include manifest
// feature_extraction/c_version/tmp.cpp:24-28; StreamLoop decl
// CameraSettings.h:21): capture thread -> lock-free 1P1C queue ->
// MTCNN detect -> dlib 68-pt refine -> embedding net -> SQLite identity
// store -> registration state machine. This binary is that process shape
// with this repo's native components composed end-to-end:
//
//   cv::VideoCapture (producer thread)
//     -> SpscQueue<Frame> (drop-stale consume, spsc_queue.hpp)
//     -> NativeMtcnn::Detect (mtcnn.hpp)
//     -> NativeErt 68-pt refine, 5pt-seeded (ert.hpp, optional)
//     -> NativeNet::Extract (efmnet.hpp)
//     -> IdentityStore match/register (identity_store.hpp)
//   driven by RegistrationStateMachine (state_machine.hpp), with
//   SelectRepresentatives picking the enrollment views (clustering.hpp).
//
// OpenCV is used ONLY for video decode (the reference linked OpenCV for
// exactly this); all inference math is the facejax native library.

#include <atomic>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include "facejax/clustering.hpp"
#include "facejax/efmnet.hpp"
#include "facejax/ert.hpp"
#include "facejax/identity_store.hpp"
#include "facejax/mtcnn.hpp"
#include "facejax/person_store.hpp"
#include "facejax/spsc_queue.hpp"
#include "facejax/state_machine.hpp"

namespace {

struct Frame {
  std::vector<float> rgb;  // HWC, 0..255
  int h = 0, w = 0;
  long seq = -1;
};

struct Args {
  std::string video, mtcnn, weights, model = "efmnet342", store;
  std::string person_db;  // person-level FJPD store (C20) instead of the
                          // flat reg_face-style --store (C19)
  std::string ert;        // optional 68-pt refiner
  std::string register_name;
  std::string register_card;  // person-db: card-only pre-registration
                              // (Register_PDB_onlyCard) instead of a name
  std::string promote_name;   // person-db: promote the new pending
                              // registration to this person afterwards
  int register_frames = 3;
  int image_size = 32;
  int margin = 0;
  int minsize = 20;
  double th[3] = {0.6, 0.7, 0.7};
  double factor = 0.709;
  float sim_th = 0.5f;
  float scth = 0.9999f;  // representative-selection similarity ceiling
  float dedup_th = 0.999999f;
  bool int8 = false;
  bool reset_store = false;  // delete an existing --store before opening
  long max_frames = 0;  // 0 = until EOF
};

void Usage(const char* argv0) {
  std::fprintf(
      stderr,
      "usage: %s --video FILE --mtcnn MTCNN.npz --weights WEIGHTS.npz\n"
      "  (--store DB.fjdb | --person-db DB.fjpd)\n"
      "  (--register-name NAME | --register-card CARD [--promote-name N])\n"
      "  [--model efmnet342]\n"
      "  [--ert ERT.npz] [--register-frames N] [--image-size S]\n"
      "  [--margin M] [--minsize N] [--th T1 T2 T3] [--factor F]\n"
      "  [--sim-th S] [--scth S] [--dedup-th S] [--int8]\n"
      "  [--reset-store] [--max-frames N]\n",
      argv0);
}

bool Parse(int argc, char** argv, Args& a) {
  auto need = [&](int& i) -> const char* {
    if (i + 1 >= argc) return nullptr;
    return argv[++i];
  };
  for (int i = 1; i < argc; ++i) {
    const std::string k = argv[i];
    const char* v = nullptr;
    if (k == "--video") v = need(i), a.video = v ? v : "";
    else if (k == "--mtcnn") v = need(i), a.mtcnn = v ? v : "";
    else if (k == "--weights") v = need(i), a.weights = v ? v : "";
    else if (k == "--model") v = need(i), a.model = v ? v : "";
    else if (k == "--store") v = need(i), a.store = v ? v : "";
    else if (k == "--person-db") v = need(i), a.person_db = v ? v : "";
    else if (k == "--ert") v = need(i), a.ert = v ? v : "";
    else if (k == "--register-name") v = need(i), a.register_name = v ? v : "";
    else if (k == "--register-card") v = need(i), a.register_card = v ? v : "";
    else if (k == "--promote-name") v = need(i), a.promote_name = v ? v : "";
    else if (k == "--register-frames") v = need(i), a.register_frames = v ? std::atoi(v) : 0;
    else if (k == "--image-size") v = need(i), a.image_size = v ? std::atoi(v) : 0;
    else if (k == "--margin") v = need(i), a.margin = v ? std::atoi(v) : 0;
    else if (k == "--minsize") v = need(i), a.minsize = v ? std::atoi(v) : 0;
    else if (k == "--factor") v = need(i), a.factor = v ? std::atof(v) : 0;
    else if (k == "--sim-th") v = need(i), a.sim_th = v ? std::atof(v) : 0;
    else if (k == "--scth") v = need(i), a.scth = v ? std::atof(v) : 0;
    else if (k == "--dedup-th") v = need(i), a.dedup_th = v ? std::atof(v) : 0;
    else if (k == "--max-frames") v = need(i), a.max_frames = v ? std::atol(v) : 0;
    else if (k == "--int8") { a.int8 = true; continue; }
    else if (k == "--reset-store") { a.reset_store = true; continue; }
    else if (k == "--th") {
      for (int j = 0; j < 3; ++j) {
        v = need(i);
        if (!v) return false;
        a.th[j] = std::atof(v);
      }
      continue;
    } else {
      std::fprintf(stderr, "unknown arg: %s\n", k.c_str());
      return false;
    }
    if (!v) return false;
  }
  if (!a.register_card.empty() && a.person_db.empty())
    return false;  // card flows live in the person-level store only
  return !a.video.empty() && !a.mtcnn.empty() && !a.weights.empty() &&
         (a.store.empty() != a.person_db.empty()) &&
         (a.register_name.empty() != a.register_card.empty());
}

// Largest-centered face pick (detect/align.py::select_main_face,
// align_dataset_mtcnn.py:84-97). boxes: n rows of [x1 y1 x2 y2 score].
int SelectMainFace(const std::vector<float>& boxes, int n, int h, int w) {
  if (n <= 1) return n - 1;
  int best = 0;
  float best_score = -1e30f;
  for (int i = 0; i < n; ++i) {
    const float* b = boxes.data() + static_cast<size_t>(i) * 5;
    const float size = (b[2] - b[0]) * (b[3] - b[1]);
    const float cx = (b[0] + b[2]) / 2 - w / 2.0f;
    const float cy = (b[1] + b[3]) / 2 - h / 2.0f;
    const float score = size - (cx * cx + cy * cy) * 2.0f;
    if (score > best_score) best_score = score, best = i;
  }
  return best;
}

// Margin-pad + clip + crop + area-resize + grayscale: the serving preproc
// (detect/align.py::crop_face + cli/identify.py grayscale), output in
// [0, 1] ready for NativeNet::Extract.
void CropGray(const Frame& f, const float box[4], int size, int margin,
              std::vector<float>& gray) {
  int x1 = std::max(static_cast<int>(box[0]) - margin / 2, 0);
  int y1 = std::max(static_cast<int>(box[1]) - margin / 2, 0);
  int x2 = std::min(static_cast<int>(box[2]) + margin / 2, f.w);
  int y2 = std::min(static_cast<int>(box[3]) + margin / 2, f.h);
  if (x2 <= x1 + 1 || y2 <= y1 + 1) {  // degenerate box: whole frame
    x1 = 0, y1 = 0, x2 = f.w, y2 = f.h;
  }
  facejax::Tensor crop;
  crop.resize(y2 - y1, x2 - x1, 3);
  for (int y = y1; y < y2; ++y)
    std::copy(f.rgb.data() + (static_cast<size_t>(y) * f.w + x1) * 3,
              f.rgb.data() + (static_cast<size_t>(y) * f.w + x2) * 3,
              crop.data.data() +
                  static_cast<size_t>(y - y1) * (x2 - x1) * 3);
  facejax::Tensor resized;
  facejax::mtcnn::Resize(crop, size, size, resized);
  gray.resize(static_cast<size_t>(size) * size);
  for (size_t i = 0; i < gray.size(); ++i) {
    const float* px = resized.data.data() + i * 3;
    gray[i] =
        (0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2]) / 255.0f;
  }
}

struct FaceResult {
  bool found = false;
  float box[4] = {0, 0, 0, 0};
  std::vector<float> fv;
  int landmarks = 0;
};

}  // namespace

int main(int argc, char** argv) {
  Args a;
  if (!Parse(argc, argv, a)) {
    Usage(argv[0]);
    return 1;
  }

  facejax::NativeMtcnn det(a.mtcnn, a.int8);
  facejax::NativeNet net(a.weights, a.model, a.int8);
  std::unique_ptr<facejax::NativeErt> ert;
  if (!a.ert.empty()) ert.reset(new facejax::NativeErt(a.ert));
  if (a.reset_store)
    std::remove((a.person_db.empty() ? a.store : a.person_db).c_str());
  // C19 flat store (reg_face semantics) or C20 person-level store
  // (person -> N faces, Valid_Face matching) — one of the two is open
  std::unique_ptr<facejax::IdentityStore> flat;
  std::unique_ptr<facejax::PersonStore> pstore;
  int enroll_pid = -1;
  if (a.person_db.empty()) {
    flat.reset(new facejax::IdentityStore(a.store, net.feature_dim()));
  } else {
    pstore.reset(new facejax::PersonStore(a.person_db, net.feature_dim()));
  }
  // store ops used by both paths: register one feature, match one probe.
  // Person mode creates the person row on the FIRST stored face (so an
  // enrollment that acquires nothing leaves no empty person behind) and
  // attaches every selected view to that one pid — N faces per person.
  auto store_register = [&](const float* fv) -> bool {
    if (flat) return flat->Register(a.register_name, fv, a.dedup_th) >= 0;
    if (enroll_pid < 0) {
      facejax::PersonRec person;
      person.name = a.register_name;
      enroll_pid = pstore->RegisterPerson(person);
    }
    return pstore->AddFace(enroll_pid, fv, a.dedup_th) >= 0;
  };
  struct Matched {
    bool found = false;
    std::string name;
    float sim = 0.0f;
  };
  auto store_match = [&](const float* fv) -> Matched {
    Matched r;
    if (flat) {
      facejax::MatchResult m = flat->Match(fv, a.sim_th);
      r.sim = m.similarity;
      if (m.index >= 0) r.found = true, r.name = flat->name(m.index);
      return r;
    }
    facejax::PersonMatch m = pstore->Match(fv, a.sim_th);
    r.sim = m.similarity;
    if (m.pid >= 0) {
      const facejax::PersonRec* p = pstore->FindPerson(m.pid);
      r.found = true;
      r.name = p ? p->name : "?";
    }
    return r;
  };
  facejax::RegistrationStateMachine sm;
  facejax::SpscQueue<Frame> queue;
  std::atomic<bool> producer_done{false};
  std::atomic<long> frames_read{0};
  // backpressure: the queue is unbounded, and during enrollment the
  // consumer takes every frame sequentially while decode outruns
  // detect+embed by orders of magnitude — without a bound a long 1080p
  // video (~25 MB/frame as f32 RGB) buffers gigabytes. The consumer
  // publishes the seq it last took; the producer stalls while more than
  // kMaxInflight frames are unconsumed.
  constexpr long kMaxInflight = 16;
  std::atomic<long> consumed_seq{-1};
  std::atomic<bool> consumer_gone{false};  // lets a stalled producer exit
                                           // on early consumer error paths

  // ---- producer thread: the reference's StreamLoop (CameraSettings.h:21)
  std::thread producer([&]() {
    cv::VideoCapture cap(a.video);
    if (!cap.isOpened()) {
      std::fprintf(stderr, "cannot open video: %s\n", a.video.c_str());
      producer_done.store(true);
      return;
    }
    cv::Mat bgr;
    long seq = 0;
    while (cap.read(bgr)) {
      if (a.max_frames && seq >= a.max_frames) break;
      while (seq - consumed_seq.load(std::memory_order_acquire) >
             kMaxInflight) {
        if (consumer_gone.load(std::memory_order_acquire)) {
          producer_done.store(true);
          return;
        }
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
      }
      Frame f;
      f.h = bgr.rows, f.w = bgr.cols, f.seq = seq++;
      f.rgb.resize(static_cast<size_t>(f.h) * f.w * 3);
      for (int y = 0; y < f.h; ++y) {
        const uint8_t* row = bgr.ptr<uint8_t>(y);
        float* out = f.rgb.data() + static_cast<size_t>(y) * f.w * 3;
        for (int x = 0; x < f.w; ++x) {  // BGR u8 -> RGB f32 0..255
          out[x * 3] = row[x * 3 + 2];
          out[x * 3 + 1] = row[x * 3 + 1];
          out[x * 3 + 2] = row[x * 3];
        }
      }
      queue.Produce(std::move(f));
      frames_read.fetch_add(1);
    }
    producer_done.store(true);
  });

  // ---- per-frame pipeline: detect -> (ERT refine) -> crop -> embed
  std::vector<float> boxes, points, gray;
  std::vector<float> lmk;
  auto process = [&](const Frame& f) -> FaceResult {
    FaceResult r;
    det.Detect(f.rgb.data(), f.h, f.w, a.minsize, a.th, a.factor, boxes,
               points);
    const int n = static_cast<int>(boxes.size() / 5);
    if (n == 0) return r;
    const int i = SelectMainFace(boxes, n, f.h, f.w);
    std::copy(boxes.data() + static_cast<size_t>(i) * 5,
              boxes.data() + static_cast<size_t>(i) * 5 + 4, r.box);
    if (ert) {  // 5pt-seeded 68-pt refine (MTCNN_Dlib_Detection flow,
                // MTCNN.hpp:1326-1421)
      float five[10];
      for (int j = 0; j < 5; ++j) {
        five[2 * j] = points[static_cast<size_t>(j) * n + i];
        five[2 * j + 1] = points[static_cast<size_t>(5 + j) * n + i];
      }
      std::vector<float> g(static_cast<size_t>(f.h) * f.w);
      for (size_t p = 0; p < g.size(); ++p)
        g[p] = (f.rgb[p * 3] + f.rgb[p * 3 + 1] + f.rgb[p * 3 + 2]) / 3.0f;
      std::vector<float> init(ert->num_points() * 2);
      ert->InitShapeFrom5pt(five, r.box, init.data());
      lmk.resize(init.size());
      ert->Predict(g.data(), f.h, f.w, r.box, init.data(), lmk.data());
      r.landmarks = ert->num_points();
    }
    CropGray(f, r.box, a.image_size, a.margin, gray);
    r.fv.resize(net.feature_dim());
    net.Extract(gray.data(), a.image_size, a.image_size, r.fv.data());
    r.found = true;
    return r;
  };

  auto consume = [&](Frame& f, bool drop_stale) -> bool {
    while (true) {
      if (queue.Consume(f, drop_stale)) {
        consumed_seq.store(f.seq, std::memory_order_release);
        return true;
      }
      if (producer_done.load() && queue.Empty()) return false;
      std::this_thread::yield();
    }
  };

  // ---- enrollment: the 8-state registration flow (CameraSettings.h:5-23)
  sm.Handle(facejax::Event::kStartRegistration);  // -> EnterName
  sm.Handle(facejax::Event::kNameEntered);        // CLI name -> Downcount
  sm.Handle(facejax::Event::kCountdownDone);      // -> RegImageAcq

  std::vector<float> acquired;  // [k x dim] candidate enrollment features
  long frames_seen = 0;
  {
    Frame f;
    while (static_cast<int>(acquired.size()) / net.feature_dim() <
           a.register_frames) {
      if (!consume(f, /*drop_stale=*/false)) break;
      ++frames_seen;
      FaceResult r = process(f);
      if (r.found)
        acquired.insert(acquired.end(), r.fv.begin(), r.fv.end());
    }
  }
  const int n_acq = static_cast<int>(acquired.size()) / net.feature_dim();
  if (n_acq == 0) {
    std::fprintf(stderr, "no faces acquired for enrollment\n");
    consumer_gone.store(true);
    producer.join();
    return 2;
  }
  sm.Handle(facejax::Event::kImagesAcquired);  // -> SelRegImage
  std::vector<int> sel = facejax::SelectRepresentatives(
      acquired.data(), n_acq, net.feature_dim(), a.scth);
  sm.Handle(facejax::Event::kImagesSelected);  // -> InputName
  sm.Handle(facejax::Event::kDetailsEntered);  // -> Registration
  int stored = 0;
  if (!a.register_card.empty()) {
    // Register_PDB_onlyCard (Feature.hpp:861-896): the selected views
    // park under the TMP person with the card id queued; they match
    // NOTHING until promoted
    std::vector<float> sel_fvs;
    for (int idx : sel)
      sel_fvs.insert(sel_fvs.end(),
                     acquired.data() +
                         static_cast<size_t>(idx) * net.feature_dim(),
                     acquired.data() +
                         static_cast<size_t>(idx + 1) * net.feature_dim());
    const int rid = pstore->RegisterCardOnly(
        a.register_card, sel_fvs.data(), static_cast<int>(sel.size()));
    stored = static_cast<int>(sel.size());
    std::printf("card-registered '%s': rid=%d pending=%zu faces=%d\n",
                a.register_card.c_str(), rid,
                pstore->PendingRegistrations().size(), stored);
    if (!a.promote_name.empty()) {
      facejax::PersonRec person;
      person.name = a.promote_name;
      const int pid = pstore->PromoteRegistration(rid, person);
      enroll_pid = pid;
      std::printf("promoted rid=%d -> pid=%d '%s'\n", rid, pid,
                  a.promote_name.c_str());
    }
  } else {
    for (int idx : sel) {
      if (store_register(acquired.data() +
                         static_cast<size_t>(idx) * net.feature_dim()))
        ++stored;
    }
    if (pstore && stored == 0 && enroll_pid >= 0 &&
        pstore->RemovePersonIfEmpty(enroll_pid)) {
      // every selected view dedup-rejected: drop the person row that
      // store_register pre-created, keeping the no-empty-person
      // invariant the comment above promises
      std::printf("enrollment stored no faces: removed empty pid=%d\n",
                  enroll_pid);
      enroll_pid = -1;
    }
  }
  sm.Handle(facejax::Event::kFeatureStored);  // -> RegistFeature
  sm.Handle(facejax::Event::kTick);           // -> Identification
  std::printf("enrolled '%s': acquired=%d selected=%zu stored=%d dim=%d\n",
              (a.register_card.empty() ? a.register_name
                                       : a.register_card).c_str(),
              n_acq, sel.size(), stored, net.feature_dim());
  if (sm.state() != facejax::SystemState::kIdentification) {
    std::fprintf(stderr, "state machine did not return to Identification\n");
    consumer_gone.store(true);
    producer.join();
    return 3;
  }

  // ---- identification loop: drop-stale consume (LFQueue.hpp:63-77)
  long identified = 0, faces = 0, processed = 0;
  std::map<std::string, long> name_counts;
  {
    Frame f;
    while (consume(f, /*drop_stale=*/true)) {
      ++processed;
      ++frames_seen;
      FaceResult r = process(f);
      if (!r.found) {
        std::printf("frame %ld: no_face\n", f.seq);
        continue;
      }
      ++faces;
      Matched m = store_match(r.fv.data());
      if (m.found) {
        ++identified;
        ++name_counts[m.name];
        std::printf("frame %ld: %s sim=%.4f box=[%.0f,%.0f,%.0f,%.0f]%s\n",
                    f.seq, m.name.c_str(), m.sim,
                    r.box[0], r.box[1], r.box[2], r.box[3],
                    r.landmarks ? " landmarks=68" : "");
      } else {
        std::printf("frame %ld: unknown sim=%.4f\n", f.seq, m.sim);
      }
    }
  }
  producer.join();

  std::string top;
  long top_n = 0;
  for (const auto& kv : name_counts)
    if (kv.second > top_n) top = kv.first, top_n = kv.second;
  if (flat) {
    std::printf(
        "summary frames_read=%ld processed=%ld faces=%ld identified=%ld "
        "top=%s top_n=%ld store_size=%d\n",
        frames_read.load(), processed, faces, identified,
        top.empty() ? "-" : top.c_str(), top_n, flat->size());
  } else {
    std::printf(
        "summary frames_read=%ld processed=%ld faces=%ld identified=%ld "
        "top=%s top_n=%ld persons=%d person_faces=%d pid=%d\n",
        frames_read.load(), processed, faces, identified,
        top.empty() ? "-" : top.c_str(), top_n, pstore->num_persons(),
        pstore->valid_faces(), enroll_pid);
  }
  return identified > 0 ? 0 : 2;
}
