// Native host runtime: bulk generators + parallel verifier.
//
// Re-creates the reference library's host-side C components with the same
// observable behavior (reference: /root/reference/src/rand.c MT19937-64/32
// streams; /root/reference/src/msb_64.c:2432-2505 parallel check/checksum;
// the absent zipf.c generator named in /root/reference/Makefile:20-21),
// implemented independently against the published algorithms.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------- MT19937-64
// Standard Mersenne Twister 19937-64 (Matsumoto & Nishimura), the same
// stream the reference's rand64_init/rand64_next produce.
class MT64 {
 public:
  explicit MT64(uint64_t seed) {
    mt_[0] = seed;
    for (int i = 1; i < kN; ++i) {
      mt_[i] =
          6364136223846793005ULL * (mt_[i - 1] ^ (mt_[i - 1] >> 62)) + i;
    }
    idx_ = kN;
  }

  uint64_t next() {
    if (idx_ >= kN) twist();
    uint64_t x = mt_[idx_++];
    x ^= (x >> 29) & 0x5555555555555555ULL;
    x ^= (x << 17) & 0x71D67FFFEDA60000ULL;
    x ^= (x << 37) & 0xFFF7EEE000000000ULL;
    x ^= x >> 43;
    return x;
  }

  double next_double() {  // [0,1) with 53-bit resolution
    return (next() >> 11) * (1.0 / 9007199254740992.0);
  }

 private:
  static constexpr int kN = 312;
  static constexpr int kM = 156;
  static constexpr uint64_t kMatrixA = 0xB5026F5AA96619E9ULL;
  static constexpr uint64_t kUpper = 0xFFFFFFFF80000000ULL;
  static constexpr uint64_t kLower = 0x7FFFFFFFULL;

  void twist() {
    for (int i = 0; i < kN; ++i) {
      uint64_t x = (mt_[i] & kUpper) | (mt_[(i + 1) % kN] & kLower);
      uint64_t xa = (x >> 1) ^ ((x & 1) ? kMatrixA : 0);
      mt_[i] = mt_[(i + kM) % kN] ^ xa;
    }
    idx_ = 0;
  }

  uint64_t mt_[kN];
  int idx_;
};

// splittable 32-bit finalizer mix (same as models/distributions._hash_u32)
inline uint32_t hash_u32(uint32_t x) {
  x = (x ^ (x >> 16)) * 0x7FEB352Du;
  x = (x ^ (x >> 15)) * 0x846CA68Bu;
  return x ^ (x >> 16);
}

template <typename F>
void parallel_for(size_t n, int threads, F f) {
  if (threads <= 1 || n < (size_t)threads * 4096) {
    f(0, n, 0);
    return;
  }
  std::vector<std::thread> pool;
  size_t chunk = n / threads;
  for (int t = 0; t < threads; ++t) {
    size_t lo = t * chunk;
    size_t hi = (t + 1 == threads) ? n : lo + chunk;
    pool.emplace_back([=] { f(lo, hi, t); });
  }
  for (auto& th : pool) th.join();
}

int hw_threads() {
  unsigned h = std::thread::hardware_concurrency();
  return h ? (int)h : 1;
}

}  // namespace

extern "C" {

// ---- generators --------------------------------------------------------

void mt64_fill(uint64_t seed, uint64_t* out, size_t n) {
  MT64 g(seed);
  for (size_t i = 0; i < n; ++i) out[i] = g.next();
}

void mt64_fill_u32(uint64_t seed, uint32_t* out, size_t n) {
  // low 32 bits of the 64-bit stream (matches utils.rng.uniform_u32)
  MT64 g(seed);
  for (size_t i = 0; i < n; ++i) out[i] = (uint32_t)g.next();
}

// parallel uniform fill: each worker runs an independently-seeded stream
void uniform_fill_u32_par(uint64_t seed, uint32_t* out, size_t n,
                          int threads) {
  if (threads <= 0) threads = hw_threads();
  parallel_for(n, threads, [&](size_t lo, size_t hi, int t) {
    MT64 g(seed * 0x9E3779B97F4A7C15ULL + (uint64_t)t + 1);
    for (size_t i = lo; i < hi; ++i) out[i] = (uint32_t)g.next();
  });
}

// Zipf(theta) over num_items ranks via inverse-CDF table + binary search;
// optional value shuffling through the hash mix (zipf.c analog).
void zipf_fill_u32(uint64_t seed, double theta, uint32_t num_items,
                   int shuffle, uint32_t* out, size_t n, int threads) {
  std::vector<double> cdf(num_items);
  double acc = 0.0;
  for (uint32_t i = 0; i < num_items; ++i) {
    acc += 1.0 / std::pow((double)(i + 1), theta);
    cdf[i] = acc;
  }
  for (uint32_t i = 0; i < num_items; ++i) cdf[i] /= acc;
  if (threads <= 0) threads = hw_threads();
  parallel_for(n, threads, [&](size_t lo, size_t hi, int t) {
    MT64 g(seed * 0x9E3779B97F4A7C15ULL + (uint64_t)t + 1);
    for (size_t i = lo; i < hi; ++i) {
      double u = g.next_double();
      uint32_t a = 0, b = num_items - 1;
      while (a < b) {
        uint32_t m = a + (b - a) / 2;
        if (cdf[m] < u) a = m + 1; else b = m;
      }
      out[i] = shuffle ? hash_u32(a) : a;
    }
  });
}

// ---- verifier (check() analog, msb_64.c:2432-2505) ---------------------

// returns 1 if ascending, 0 otherwise; *checksum = additive mod-2^64 sum
int check_sorted_u32(const uint32_t* keys, size_t n, uint64_t* checksum,
                     int threads) {
  if (threads <= 0) threads = hw_threads();
  std::atomic<int> ok{1};
  std::atomic<uint64_t> sum{0};
  parallel_for(n, threads, [&](size_t lo, size_t hi, int t) {
    uint64_t s = 0;
    int good = 1;
    uint32_t prev = lo ? keys[lo - 1] : 0;
    for (size_t i = lo; i < hi; ++i) {
      if (keys[i] < prev) good = 0;
      prev = keys[i];
      s += keys[i];
    }
    if (!good) ok.store(0);
    sum.fetch_add(s);
  });
  if (checksum) *checksum = sum.load();
  return ok.load();
}

int check_sorted_u64(const uint64_t* keys, size_t n, uint64_t* checksum,
                     int threads) {
  if (threads <= 0) threads = hw_threads();
  std::atomic<int> ok{1};
  std::atomic<uint64_t> sum{0};
  parallel_for(n, threads, [&](size_t lo, size_t hi, int t) {
    uint64_t s = 0;
    int good = 1;
    uint64_t prev = lo ? keys[lo - 1] : 0;
    for (size_t i = lo; i < hi; ++i) {
      if (keys[i] < prev) good = 0;
      prev = keys[i];
      s += keys[i];
    }
    if (!good) ok.store(0);
    sum.fetch_add(s);
  });
  if (checksum) *checksum = sum.load();
  return ok.load();
}

// key==rid payload-integrity mode (msb_64.c:2461)
int check_same_u32(const uint32_t* keys, const uint32_t* rids, size_t n,
                   int threads) {
  if (threads <= 0) threads = hw_threads();
  std::atomic<int> ok{1};
  parallel_for(n, threads, [&](size_t lo, size_t hi, int t) {
    for (size_t i = lo; i < hi; ++i) {
      if (keys[i] != rids[i]) { ok.store(0); return; }
    }
  });
  return ok.load();
}

}  // extern "C"
