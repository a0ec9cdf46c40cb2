// Native tests for the serving layer (assert-based; no gtest in image).
// Covers: SIMD dot/cosine vs scalar, gallery matcher, identity store
// persistence + dedup, NMS parity cases, SPSC queue (threaded, drop-stale,
// wrong-thread guard), state machine walk, clustering selection.

#include <cassert>
#include <cmath>
#include <cstdio>
#include <random>
#include <thread>
#include <vector>

#include "facejax/clustering.hpp"
#include "facejax/efmnet.hpp"
#include "facejax/identity_store.hpp"
#include "facejax/npz.hpp"
#include "facejax/ert.hpp"
#include "facejax/matcher.hpp"
#include "facejax/mtcnn.hpp"
#include "facejax/nms.hpp"
#include "facejax/person_store.hpp"
#include "facejax/spsc_queue.hpp"
#include "facejax/state_machine.hpp"

using namespace facejax;

static void TestDotVsScalar() {
  std::mt19937 rng(0);
  std::uniform_real_distribution<float> dist(-1, 1);
  for (int d : {1, 7, 8, 9, 342, 684}) {
    std::vector<float> a(d), b(d);
    for (int i = 0; i < d; ++i) {
      a[i] = dist(rng);
      b[i] = dist(rng);
    }
    double ref = 0;
    for (int i = 0; i < d; ++i) ref += double(a[i]) * b[i];
    float got = Dot(a.data(), b.data(), d);
    assert(std::fabs(got - ref) < 1e-3);
  }
  std::printf("TestDotVsScalar OK\n");
}

static void TestMatcher() {
  const int n = 100, d = 342;
  std::mt19937 rng(1);
  std::uniform_real_distribution<float> dist(-1, 1);
  std::vector<float> gallery(n * d);
  for (auto& v : gallery) v = dist(rng);
  std::vector<float> norms = GalleryNorms(gallery.data(), n, d);
  // query = row 37 scaled: cosine 1.0 with row 37
  std::vector<float> q(gallery.begin() + 37 * d, gallery.begin() + 38 * d);
  for (auto& v : q) v *= 2.5f;
  MatchResult m = MatchGallery(gallery.data(), norms.data(), n, d, q.data(),
                               0.9f);
  assert(m.index == 37);
  assert(std::fabs(m.similarity - 1.0f) < 1e-5);
  // below threshold: index -1 but similarity reported
  std::vector<float> far(d, 0.f);
  far[0] = 1.f;
  MatchResult m2 =
      MatchGallery(gallery.data(), norms.data(), n, d, far.data(), 0.99f);
  assert(m2.index == -1);
  assert(m2.similarity > -2.f);
  std::printf("TestMatcher OK\n");
}

static void TestIdentityStore() {
  const char* path = "/tmp/fx_store_test.fjdb";
  std::remove(path);
  const int d = 8;
  std::vector<float> a(d, 0.f), b(d, 0.f);
  a[0] = 1.f;
  b[1] = 1.f;
  {
    IdentityStore store(path, d);
    assert(store.size() == 0);
    assert(store.Register("alice", a.data()) == 0);
    assert(store.Register("bob", b.data()) == 1);
    // duplicate of alice -> deduped, returns -(1+0)
    std::vector<float> a2 = a;
    for (auto& v : a2) v *= 3.f;
    assert(store.Register("alice2", a2.data()) == -1);
    assert(store.size() == 2);
    MatchResult m = store.Match(a.data(), 0.5f);
    assert(m.index == 0 && store.name(m.index) == "alice");
  }
  {
    IdentityStore reloaded(path, d);  // persistence
    assert(reloaded.size() == 2);
    assert(reloaded.name(1) == "bob");
    MatchResult m = reloaded.Match(b.data(), 0.5f);
    assert(m.index == 1);
  }
  std::remove(path);
  std::printf("TestIdentityStore OK\n");
}

static void TestPersonStore() {
  const char* path = "/tmp/fx_person_store_test.fjpd";
  std::remove(path);
  const int d = 8;
  std::vector<float> a(d, 0.f), b(d, 0.f), c(d, 0.f);
  a[0] = 1.f;
  b[1] = 1.f;
  c[2] = 1.f;
  int alice_pid = -1, bob_pid = -1, rid = -1;
  {
    PersonStore store(path, d);
    assert(store.num_persons() == 0);  // only the reserved TMP person
    assert(store.FindPerson(PersonStore::kTmpPid) != nullptr);
    // person with two faces (the C20 grouping identity_store can't do)
    PersonRec alice;
    alice.name = "alice";
    alice.student_id = "A123";
    alice_pid = store.RegisterPerson(alice);
    std::vector<float> a2 = a;
    a2[3] = 0.2f;  // second distinct view of alice
    assert(store.AddFace(alice_pid, a.data(), 0.99999f) >= 0);
    const int fid_a2 = store.AddFace(alice_pid, a2.data(), 0.99999f);
    assert(fid_a2 >= 0);
    // near-duplicate view deduped: -(1 + existing fid)
    std::vector<float> a3 = a2;
    for (auto& v : a3) v *= 2.f;
    assert(store.AddFace(alice_pid, a3.data(), 0.99999f) == -(1 + fid_a2));
    PersonRec bob;
    bob.name = "bob";
    bob_pid = store.RegisterPerson(bob);
    assert(store.AddFace(bob_pid, b.data(), 0.99999f) >= 0);
    assert(store.num_persons() == 2 && store.valid_faces() == 3);
    // identify returns the OWNING PERSON whichever face wins
    PersonMatch m = store.Match(a2.data(), 0.5f);
    assert(m.pid == alice_pid && m.fid == fid_a2);
    assert(store.ExistsIdNumber("A123")->pid == alice_pid);
    // pflag soft delete: alice's faces all leave the match set...
    assert(store.SetPersonFlag(alice_pid, 0));
    assert(store.valid_faces() == 1);
    assert(store.Match(a.data(), 0.5f).pid == -1);
    // ...and restore brings them back
    assert(store.SetPersonFlag(alice_pid, 1));
    assert(store.Match(a.data(), 0.5f).pid == alice_pid);
    assert(!store.SetPersonFlag(PersonStore::kTmpPid, 1));  // reserved
    // card-only pre-registration parks faces invisibly
    rid = store.RegisterCardOnly("card-42", c.data(), 1);
    assert(rid >= 1);
    assert(store.Match(c.data(), 0.5f).pid == -1);  // TMP faces invalid
    assert(store.PendingRegistrations().size() == 1);
  }
  {
    PersonStore store(path, d);  // persistence across process restart
    assert(store.num_persons() == 2 && store.valid_faces() == 3);
    assert(store.PendingRegistrations().size() == 1 &&
           store.PendingRegistrations()[0].card_id == "card-42");
    // promote: the parked face becomes carol's, queue drains, card
    // inherited, and the face now matches as carol
    PersonRec carol;
    carol.name = "carol";
    const int carol_pid = store.PromoteRegistration(rid, carol);
    assert(carol_pid > 0 && store.PendingRegistrations().empty());
    assert(store.FindByCard("card-42")->pid == carol_pid);
    PersonMatch m = store.Match(c.data(), 0.5f);
    assert(m.pid == carol_pid && m.similarity > 0.99f);
    assert(store.PromoteRegistration(rid, carol) == -1);  // gone
  }
  std::remove(path);
  std::printf("TestPersonStore OK\n");
}

static void TestNms() {
  // duplicate high-overlap boxes + one far box
  float boxes[3][5] = {{0, 0, 10, 10, 0.9f},
                       {0, 0, 10, 10, 0.8f},
                       {50, 50, 60, 60, 0.7f}};
  auto keep = Nms(&boxes[0][0], 3, 0.5f, NmsMethod::kUnion);
  assert(keep.size() == 2);
  assert(keep[0] == 0 && keep[1] == 2);
  // Min mode merges contained boxes aggressively
  float contained[2][5] = {{0, 0, 100, 100, 0.9f}, {10, 10, 20, 20, 0.8f}};
  auto keep2 = Nms(&contained[0][0], 2, 0.5f, NmsMethod::kMin);
  assert(keep2.size() == 1);
  auto keep3 = Nms(&contained[0][0], 2, 0.5f, NmsMethod::kUnion);
  assert(keep3.size() == 2);
  std::printf("TestNms OK\n");
}

static void TestBBRegRerec() {
  float boxes[1][5] = {{0, 0, 9, 9, 0.9f}};
  float reg[1][4] = {{0.1f, 0.2f, -0.1f, -0.2f}};
  BBReg(&boxes[0][0], &reg[0][0], 1);
  assert(std::fabs(boxes[0][0] - 1.f) < 1e-5);
  assert(std::fabs(boxes[0][3] - 7.f) < 1e-5);
  float rect[1][5] = {{0, 0, 10, 20, 0.9f}};
  Rerec(&rect[0][0], 1);
  assert(std::fabs((rect[0][2] - rect[0][0]) - (rect[0][3] - rect[0][1])) <
         1e-5);
  std::printf("TestBBRegRerec OK\n");
}

static void TestSpscQueue() {
  SpscQueue<int> q;
  int out = 0;
  assert(!q.Consume(out));
  // threaded: producer pushes 1000, consumer drains in order
  SpscQueue<int>* tq = new SpscQueue<int>();
  std::thread producer([&] {
    for (int i = 0; i < 1000; ++i) tq->Produce(i);
  });
  int last = -1, received = 0;
  std::thread consumer([&] {
    int v;
    while (received < 1000) {
      if (tq->Consume(v)) {
        assert(v == last + 1);
        last = v;
        ++received;
      }
    }
  });
  producer.join();
  consumer.join();
  assert(received == 1000);
  delete tq;
  // drop-stale: consume newest only
  SpscQueue<int> q2;
  for (int i = 0; i < 5; ++i) q2.Produce(i);
  int v = -1;
  assert(q2.Consume(v, /*remove_old=*/true));
  assert(v == 4);
  assert(!q2.Consume(v));
  std::printf("TestSpscQueue OK\n");
}

static void TestQueueThreadGuard() {
  SpscQueue<int> q;
  q.Produce(1);  // binds producer to this thread
  bool threw = false;
  std::thread other([&] {
    try {
      q.Produce(2);
    } catch (const ConcurrencyError&) {
      threw = true;
    }
  });
  other.join();
  assert(threw);
  std::printf("TestQueueThreadGuard OK\n");
}

static void TestStateMachine() {
  RegistrationStateMachine sm;
  assert(sm.state() == SystemState::kIdentification);
  assert(!sm.Handle(Event::kNameEntered));  // invalid from Identification
  Event walk[] = {Event::kStartRegistration, Event::kNameEntered,
                  Event::kCountdownDone,     Event::kImagesAcquired,
                  Event::kImagesSelected,    Event::kDetailsEntered,
                  Event::kFeatureStored,     Event::kTick};
  for (Event e : walk) assert(sm.Handle(e));
  assert(sm.state() == SystemState::kIdentification);
  sm.Handle(Event::kStartRegistration);
  assert(sm.Handle(Event::kCancel));
  assert(sm.state() == SystemState::kIdentification);
  std::printf("TestStateMachine OK\n");
}

static void TestClustering() {
  const int d = 4;
  // three near-duplicates of e0 + one e1 + one e2 direction
  std::vector<float> f = {
      1, 0, 0, 0,
      0.999f, 0.01f, 0, 0,
      0.998f, 0.02f, 0, 0,
      0, 1, 0, 0,
      0, 0, 1, 0,
  };
  auto sel = SelectRepresentatives(f.data(), 5, d, 0.95f);
  assert(sel.size() == 3);
  assert(sel[0] == 0 && sel[1] == 3 && sel[2] == 4);
  std::printf("TestClustering OK\n");
}

static void TestGemmVsNaive() {
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> dist(-1.0f, 1.0f);
  // odd sizes exercise MR/NR remainder paths
  const int m = 23, k = 37, n = 53;
  std::vector<float> a(static_cast<size_t>(m) * k), bmat(static_cast<size_t>(k) * n),
      bias(n);
  for (auto& v : a) v = dist(rng);
  for (auto& v : bmat) v = dist(rng);
  for (auto& v : bias) v = dist(rng);
  std::vector<float> got;
  nn::Gemm(a, m, k, bmat.data(), bias.data(), n, got);
  for (int i = 0; i < m; ++i) {
    for (int j = 0; j < n; ++j) {
      float want = bias[j];
      for (int kk = 0; kk < k; ++kk)
        want += a[static_cast<size_t>(i) * k + kk] *
                bmat[static_cast<size_t>(kk) * n + j];
      assert(std::fabs(got[static_cast<size_t>(i) * n + j] - want) <
             1e-3f);
    }
  }
  // nullptr bias path
  nn::Gemm(a, m, k, bmat.data(), nullptr, n, got);
  float want00 = 0.0f;
  for (int kk = 0; kk < k; ++kk) want00 += a[kk] * bmat[static_cast<size_t>(kk) * n];
  assert(std::fabs(got[0] - want00) < 1e-3f);
  std::printf("TestGemmVsNaive OK\n");
}

static void TestQGemmExactOnGrid() {
  // Inputs constructed ON the quantization grid (per-column weight max hits
  // exactly 63 * s_j, activation max exactly 127 * s_a): the int8 path must
  // then agree with exact integer math to f32 rounding only. Odd sizes
  // exercise the k%4 / n%8 / n%16 / m%4 remainder paths.
  std::mt19937 rng(11);
  const int m = 5, k = 13, n = 21;
  std::uniform_int_distribution<int> wq(-63, 63), aq(-127, 127);
  const float sw = 0.0125f, sa = 0.031f;
  std::vector<int> wint(static_cast<size_t>(k) * n), aint(static_cast<size_t>(m) * k);
  for (auto& v : wint) v = wq(rng);
  for (auto& v : aint) v = aq(rng);
  // pin the extremes so the dynamic scales reproduce sw / sa exactly
  for (int j = 0; j < n; ++j) wint[static_cast<size_t>(0) * n + j] = 63;
  aint[0] = 127;
  std::vector<float> w(wint.size()), a(aint.size()), bias(n);
  for (size_t i = 0; i < wint.size(); ++i) w[i] = wint[i] * sw;
  for (size_t i = 0; i < aint.size(); ++i) a[i] = aint[i] * sa;
  for (int j = 0; j < n; ++j) bias[j] = 0.1f * j;

  nn::QuantizedKernel qk;
  nn::QuantizeKernel(w.data(), k, n, qk);
  std::vector<uint8_t> au8(static_cast<size_t>(m) * qk.kp);
  float a_scale = 0.0f;
  nn::QuantizeActivations(a.data(), m, k, qk.kp, au8.data(), a_scale);
  assert(std::fabs(a_scale - sa) < 1e-6f);
  std::vector<float> got;
  nn::QGemm(au8.data(), a_scale, m, qk, bias.data(), got);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) {
      long long acc = 0;
      for (int kk = 0; kk < k; ++kk)
        acc += static_cast<long long>(aint[static_cast<size_t>(i) * k + kk]) *
               wint[static_cast<size_t>(kk) * n + j];
      const double want = acc * double(sa) * sw + bias[j];
      const double rel = std::fabs(got[static_cast<size_t>(i) * n + j] - want) /
                         (std::fabs(want) + 1e-3);
      assert(rel < 1e-5);
    }
  std::printf("TestQGemmExactOnGrid OK\n");
}

static void TestQGemmVsF32Tolerance() {
  // Off-grid random inputs: the int8 result must track the f32 GEMM within
  // the quantization-noise budget (per-channel 6-bit weights + 8-bit
  // dynamic activations over K=300 sums keep relative error well under 2%).
  std::mt19937 rng(13);
  std::uniform_real_distribution<float> dist(-1.0f, 1.0f);
  const int m = 34, k = 300, n = 47;
  std::vector<float> a(static_cast<size_t>(m) * k), w(static_cast<size_t>(k) * n);
  for (auto& v : a) v = dist(rng);
  for (auto& v : w) v = dist(rng);
  std::vector<float> ref;
  nn::Gemm(a, m, k, w.data(), nullptr, n, ref);
  nn::QuantizedKernel qk;
  nn::QuantizeKernel(w.data(), k, n, qk);
  std::vector<uint8_t> au8(static_cast<size_t>(m) * qk.kp);
  float a_scale = 0.0f;
  nn::QuantizeActivations(a.data(), m, k, qk.kp, au8.data(), a_scale);
  std::vector<float> got;
  nn::QGemm(au8.data(), a_scale, m, qk, nullptr, got);
  double num = 0, den = 0;
  for (size_t i = 0; i < ref.size(); ++i) {
    num += double(got[i] - ref[i]) * (got[i] - ref[i]);
    den += double(ref[i]) * ref[i];
  }
  const double rel = std::sqrt(num / den);
  assert(rel < 0.02);
  std::printf("TestQGemmVsF32Tolerance OK (rel frobenius %.5f)\n", rel);
}

static void TestEfm3MaxPool() {
  Tensor t;
  t.resize(2, 2, 6);
  for (int i = 0; i < 24; ++i) t.data[i] = static_cast<float>(i % 7) - 3.0f;
  Tensor copy = t;
  nn::Efm3(t);
  assert(t.c == 4);
  for (int y = 0; y < 2; ++y)
    for (int x = 0; x < 2; ++x)
      for (int ch = 0; ch < 2; ++ch) {
        float a = copy.at(y, x, ch), b = copy.at(y, x, 2 + ch),
              c = copy.at(y, x, 4 + ch);
        assert(t.at(y, x, ch) == std::max(a, std::max(b, c)));
        assert(t.at(y, x, 2 + ch) == std::min(a, std::min(b, c)));
      }
  nn::MaxPool2(t);
  assert(t.h == 1 && t.w == 1 && t.c == 4);
  std::printf("TestEfm3MaxPool OK\n");
}


// ---- native MTCNN primitives (mtcnn.hpp) ----

static facejax::NpyArray MakeF32(std::vector<int64_t> shape,
                                 const std::vector<float>& vals) {
  facejax::NpyArray a;
  a.shape = std::move(shape);
  a.dtype = "<f4";
  a.data.resize(vals.size() * 4);
  std::memcpy(a.data.data(), vals.data(), a.data.size());
  return a;
}

static void TestMtcnnConvValid() {
  // 4x5x2 input, 3x3 conv to 3 channels vs a naive loop
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> d(-1, 1);
  facejax::Tensor in;
  in.resize(4, 5, 2);
  for (auto& v : in.data) v = d(rng);
  std::vector<float> kv(3 * 3 * 2 * 3), bv(3);
  for (auto& v : kv) v = d(rng);
  for (auto& v : bv) v = d(rng);
  facejax::NpyArray kernel = MakeF32({3, 3, 2, 3}, kv);
  facejax::NpyArray bias = MakeF32({3}, bv);
  facejax::Tensor out;
  facejax::mtcnn::ConvValid(in, kernel, bias, out);
  assert(out.h == 2 && out.w == 3 && out.c == 3);
  for (int y = 0; y < out.h; ++y)
    for (int x = 0; x < out.w; ++x)
      for (int co = 0; co < 3; ++co) {
        float want = bv[co];
        for (int dy = 0; dy < 3; ++dy)
          for (int dx = 0; dx < 3; ++dx)
            for (int ci = 0; ci < 2; ++ci)
              want += in.at(y + dy, x + dx, ci) *
                      kv[((dy * 3 + dx) * 2 + ci) * 3 + co];
        assert(std::fabs(out.at(y, x, co) - want) < 1e-4f);
      }
  std::printf("mtcnn conv-valid ok\n");

  // int8 path tracks f32 on the same tensor (qgemm scheme sanity + ASan
  // coverage of the u8 VALID im2col)
  facejax::nn::QuantizedKernel qk;
  facejax::nn::QuantizeKernel(kernel.f32(), 3 * 3 * 2, 3, qk);
  facejax::Tensor qout;
  facejax::mtcnn::ConvValidQ(in, 3, 3, qk, bias.f32(), qout);
  assert(qout.h == out.h && qout.w == out.w && qout.c == out.c);
  float maxabs = 0.0f;
  for (float v : out.data) maxabs = std::max(maxabs, std::fabs(v));
  for (size_t i = 0; i < out.data.size(); ++i)
    assert(std::fabs(qout.data[i] - out.data[i]) < 0.05f * maxabs + 0.02f);
  std::printf("mtcnn conv-valid int8 ok\n");
}

static void TestMtcnnPoolResize() {
  // TF SAME pool: h=5, k=3, s=2 -> out 3 with pad 1 top
  facejax::Tensor t;
  t.resize(5, 5, 1);
  for (int i = 0; i < 25; ++i) t.data[i] = static_cast<float>(i);
  facejax::Tensor same = t;
  facejax::mtcnn::MaxPool(same, 3, 2, true);
  assert(same.h == 3 && same.w == 3);
  assert(same.at(0, 0, 0) == 6.0f);    // window rows/cols [-1..1] clipped
  assert(same.at(2, 2, 0) == 24.0f);
  facejax::Tensor valid = t;
  facejax::mtcnn::MaxPool(valid, 3, 2, false);
  assert(valid.h == 2 && valid.w == 2);
  assert(valid.at(0, 0, 0) == 12.0f && valid.at(1, 1, 0) == 24.0f);
  // area resize of 2x2 blocks == block mean; bilinear same-size == copy
  facejax::Tensor img;
  img.resize(4, 4, 1);
  for (int i = 0; i < 16; ++i) img.data[i] = static_cast<float>(i);
  facejax::Tensor half;
  facejax::mtcnn::Resize(img, 2, 2, half);
  assert(std::fabs(half.at(0, 0, 0) - 2.5f) < 1e-6f);
  assert(std::fabs(half.at(1, 1, 0) - 12.5f) < 1e-6f);
  facejax::Tensor samesz;
  facejax::mtcnn::Resize(img, 4, 4, samesz);
  for (int i = 0; i < 16; ++i) assert(samesz.data[i] == img.data[i]);
  std::printf("mtcnn pool/resize ok\n");
}

static void TestErtSimilarity() {
  // recover a known scale/rotation/translation from 5 mapped points
  const double s = 1.7, th = 0.35, tx = 3.0, ty = -2.0;
  std::mt19937 rng(9);
  std::uniform_real_distribution<float> d(0, 1);
  float src[10], dst[10];
  for (int i = 0; i < 5; ++i) {
    const double x = d(rng), y = d(rng);
    src[2 * i] = static_cast<float>(x);
    src[2 * i + 1] = static_cast<float>(y);
    dst[2 * i] = static_cast<float>(s * (std::cos(th) * x -
                                         std::sin(th) * y) + tx);
    dst[2 * i + 1] = static_cast<float>(s * (std::sin(th) * x +
                                             std::cos(th) * y) + ty);
  }
  double m[6];
  facejax::NativeErt::SimilarityTransform(src, dst, 5, m);
  for (int i = 0; i < 5; ++i) {
    const double px = m[0] * src[2 * i] + m[1] * src[2 * i + 1] + m[2];
    const double py = m[3] * src[2 * i] + m[4] * src[2 * i + 1] + m[5];
    assert(std::fabs(px - dst[2 * i]) < 1e-4);
    assert(std::fabs(py - dst[2 * i + 1]) < 1e-4);
  }
  std::printf("ert similarity-transform ok\n");
}

static void TestNpzCorruptInputs() {
  // the export reader parses UNTRUSTED bytes; every corrupt shape must
  // throw a clean runtime_error, never read out of bounds (ASan-checked
  // via the sanitizer matrix in tests/test_native.py)
  auto write = [](const std::string& path, const std::string& bytes) {
    FILE* f = std::fopen(path.c_str(), "wb");
    assert(f);
    std::fwrite(bytes.data(), 1, bytes.size(), f);
    std::fclose(f);
  };
  auto expect_throw = [&](const std::string& bytes, const char* what) {
    const std::string path = "/tmp/facejax_npz_corrupt.npz";
    write(path, bytes);
    bool threw = false;
    try {
      facejax::LoadNpz(path);
    } catch (const std::runtime_error&) {
      threw = true;
    }
    if (!threw) {
      std::printf("npz corrupt case did not throw: %s\n", what);
      assert(false);
    }
  };
  expect_throw("PK", "tiny file");
  expect_throw(std::string(64, 'A'), "no EOCD");
  // EOCD claiming 1 entry with a central directory past EOF
  std::string eocd(22, '\0');
  std::memcpy(&eocd[0], "PK\x05\x06", 4);
  eocd[10] = 1;                       // n_entries = 1
  eocd[16] = '\xff';                 // cd_off = huge
  eocd[17] = '\xff';
  eocd[18] = '\xff';
  expect_throw(eocd, "cd offset past EOF");
  // cd_off = 0 points at bytes that are not a central-directory entry
  std::string eocd2 = eocd;
  eocd2[16] = eocd2[17] = eocd2[18] = '\0';
  expect_throw(std::string(64, 'Z') + eocd2, "bad cd entry");
  std::printf("npz corrupt-input handling ok\n");
}

int main() {
  TestNpzCorruptInputs();
  TestGemmVsNaive();
  TestQGemmExactOnGrid();
  TestQGemmVsF32Tolerance();
  TestEfm3MaxPool();
  TestDotVsScalar();
  TestMatcher();
  TestIdentityStore();
  TestPersonStore();
  TestNms();
  TestBBRegRerec();
  TestSpscQueue();
  TestQueueThreadGuard();
  TestStateMachine();
  TestClustering();
  TestMtcnnConvValid();
  TestMtcnnPoolResize();
  TestErtSimilarity();
  std::printf("ALL NATIVE TESTS PASSED\n");
  return 0;
}
