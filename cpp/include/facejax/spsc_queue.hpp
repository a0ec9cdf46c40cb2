// Single-producer/single-consumer lock-free queue with drop-stale consume.
//
// Native rebuild of the reference's LFQueue1P1C (LFQueue.hpp:16-101,
// SURVEY.md C21): a linked-list queue with atomic divider/last pointers,
// thread-identity guards that throw on wrong-thread access, and a
// Consume(remove_old) mode that skips to the freshest element — the
// camera-frame semantics (always recognize the newest frame, drop backlog).
//
// Memory-order notes (the reference used seq_cst defaults): producer
// publishes with release on `last_`; consumer reads with acquire; trimming
// of consumed nodes happens on the producer side only, so each pointer has
// a single writer.

#pragma once

#include <atomic>
#include <stdexcept>
#include <thread>
#include <utility>

namespace facejax {

struct ConcurrencyError : std::runtime_error {
  explicit ConcurrencyError(const char* what) : std::runtime_error(what) {}
};

template <typename T>
class SpscQueue {
 public:
  SpscQueue() {
    Node* n = new Node(T{});
    divider_.store(n, std::memory_order_relaxed);
    last_.store(n, std::memory_order_relaxed);
    first_ = n;
  }

  ~SpscQueue() {
    Node* n = first_;
    while (n) {
      Node* next = n->next.load(std::memory_order_relaxed);
      delete n;
      n = next;
    }
  }

  SpscQueue(const SpscQueue&) = delete;
  SpscQueue& operator=(const SpscQueue&) = delete;

  // Producer side. First caller binds the producer thread identity.
  void Produce(T value) {
    BindOrCheck(producer_id_, "Produce called from a second thread");
    Node* n = new Node(std::move(value));
    last_.load(std::memory_order_relaxed)
        ->next.store(n, std::memory_order_release);
    last_.store(n, std::memory_order_release);
    TrimConsumed();
  }

  // Consumer side; returns false when empty. remove_old=true skips straight
  // to the freshest element (reference LFQueue.hpp:63-77).
  bool Consume(T& out, bool remove_old = false) {
    BindOrCheck(consumer_id_, "Consume called from a second thread");
    Node* div = divider_.load(std::memory_order_acquire);
    Node* last = last_.load(std::memory_order_acquire);
    if (div == last) return false;
    if (remove_old) {
      divider_.store(last, std::memory_order_release);
      out = std::move(last->value);
      return true;
    }
    Node* next = div->next.load(std::memory_order_acquire);
    out = std::move(next->value);
    divider_.store(next, std::memory_order_release);
    return true;
  }

  bool Empty() const {
    return divider_.load(std::memory_order_acquire) ==
           last_.load(std::memory_order_acquire);
  }

 private:
  struct Node {
    explicit Node(T v) : value(std::move(v)), next(nullptr) {}
    T value;
    std::atomic<Node*> next;
  };

  static void BindOrCheck(std::atomic<std::thread::id>& slot,
                          const char* msg) {
    std::thread::id none{};
    std::thread::id self = std::this_thread::get_id();
    std::thread::id cur = slot.load(std::memory_order_relaxed);
    if (cur == none) {
      if (slot.compare_exchange_strong(cur, self)) return;
      cur = slot.load(std::memory_order_relaxed);
    }
    if (cur != self) throw ConcurrencyError(msg);
  }

  // Producer-only: free nodes the consumer has moved past.
  void TrimConsumed() {
    Node* div = divider_.load(std::memory_order_acquire);
    while (first_ != div) {
      Node* next = first_->next.load(std::memory_order_relaxed);
      delete first_;
      first_ = next;
    }
  }

  Node* first_;                        // producer-owned trim cursor
  std::atomic<Node*> divider_;         // consumer-advanced
  std::atomic<Node*> last_;            // producer-advanced
  std::atomic<std::thread::id> producer_id_{};
  std::atomic<std::thread::id> consumer_id_{};
};

}  // namespace facejax
