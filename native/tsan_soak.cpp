// ThreadSanitizer soak for the native host runtime (SURVEY.md §5 "race
// detection": the reference has none; our C++ gets TSan in CI).
//
// Exercises the seqlock PolicyBuffer with a writer thread + two reader
// threads under TSan, PLUS a payload-consistency check (every byte of a
// snapshot must carry the same generation value — a torn read that
// escaped the seq protocol would mix generations).
//
// The seqlock payload is racy BY DESIGN: a reader may copy bytes while
// the writer overwrites them, then DISCARDS the snapshot when the
// sequence numbers disagree. TSan cannot see the discard, so the two
// memcpy calls are suppressed via the companion tsan_suppressions.txt
// ("race:policy_buffer_write" / "race:policy_buffer_read"); everything
// else — the sequence protocol itself, the stamp, the allocator, any
// accidental shared state added later — stays under full TSan watch.
//
// Build & run (tests/test_native.py::test_tsan_soak):
//   g++ -std=c++17 -O1 -g -fsanitize=thread -pthread \
//       -o tsan_soak tsan_soak.cpp
//   TSAN_OPTIONS="suppressions=tsan_suppressions.txt exitcode=66" \
//       ./tsan_soak
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

// The soak links the runtime source directly so TSan instruments the
// exact code the .so ships (the ctypes build uses the same file).
#include "qm_native.cpp"

namespace {

constexpr uint64_t kPayload = 4096;
constexpr int kWrites = 200000;

std::atomic<bool> done{false};
std::atomic<long> torn{0};
std::atomic<long> snapshots{0};

void writer(PolicyBuffer* b) {
  std::vector<unsigned char> buf(kPayload);
  for (int i = 1; i <= kWrites; ++i) {
    std::memset(buf.data(), i & 0xff, kPayload);
    policy_buffer_write(b, buf.data(), kPayload, double(i));
  }
  done.store(true, std::memory_order_release);
}

void reader(PolicyBuffer* b) {
  std::vector<unsigned char> buf(kPayload);
  double stamp = 0.0;
  while (!done.load(std::memory_order_acquire)) {
    if (!policy_buffer_read(b, buf.data(), kPayload, &stamp)) continue;
    snapshots.fetch_add(1, std::memory_order_relaxed);
    unsigned char first = buf[0];
    for (uint64_t k = 1; k < kPayload; ++k) {
      if (buf[k] != first) {
        torn.fetch_add(1, std::memory_order_relaxed);
        break;
      }
    }
  }
}

}  // namespace

int main() {
  PolicyBuffer* b = policy_buffer_create(kPayload);
  std::thread w(writer, b);
  std::thread r1(reader, b);
  std::thread r2(reader, b);
  w.join();
  r1.join();
  r2.join();
  long t = torn.load(), s = snapshots.load();
  policy_buffer_destroy(b);
  std::printf("tsan_soak: %ld snapshots, %ld torn\n", s, t);
  if (t != 0 || s == 0) {
    std::printf("FAIL: torn snapshots escaped the seqlock protocol\n");
    return 1;
  }
  std::printf("OK\n");
  return 0;
}
