// Native host-side data ops for mhrec_tpu.
//
// The training input pipeline's irregular hot path is negative sampling:
// per-sample without-replacement draws excluding a per-row blacklist
// (reference trainset.py:70-108 runs this in Python DataLoader workers).
// These OpenMP kernels draw whole batches in parallel; exposed through
// ctypes with a numpy fallback (mhrec_tpu/native/__init__.py).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC mhrec_native.cpp -o libmhrec_native.so

#include <cstdint>
#include <random>
#include <unordered_set>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint64_t mix_seed(uint64_t seed, uint64_t row) {
  uint64_t z = seed + 0x9E3779B97F4A7C15ULL * (row + 1);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

}  // namespace

extern "C" {

// Uniform negatives without replacement from items [1, item_num), excluding
// a per-row blacklist (0 entries ignored). out: [B, K]; blacklist: [B, Lb].
void sample_negatives_uniform(int64_t* out, int64_t B, int64_t K,
                              const int64_t* blacklist, int64_t Lb,
                              int64_t item_num, uint64_t seed) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    std::mt19937_64 rng(mix_seed(seed, (uint64_t)b));
    std::uniform_int_distribution<int64_t> dist(1, item_num - 1);
    std::unordered_set<int64_t> taboo;
    taboo.reserve((size_t)(Lb + K) * 2);
    for (int64_t j = 0; j < Lb; ++j) {
      int64_t v = blacklist[b * Lb + j];
      if (v > 0) taboo.insert(v);
    }
    int64_t n = 0;
    int64_t guard = 0;
    const int64_t max_tries = 64 * K + 1024;
    while (n < K && guard < max_tries) {
      ++guard;
      int64_t cand = dist(rng);
      if (taboo.count(cand)) continue;
      taboo.insert(cand);
      out[b * K + n++] = cand;
    }
    // degenerate corpora: fill remaining with-replacement (non-blacklisted
    // preferred, any item as last resort)
    while (n < K) {
      int64_t cand = dist(rng);
      out[b * K + n++] = cand;
    }
  }
}

// Pool-based variant: candidates drawn uniformly from pool[0..pool_n).
void sample_negatives_pool(int64_t* out, int64_t B, int64_t K,
                           const int64_t* blacklist, int64_t Lb,
                           const int64_t* pool, int64_t pool_n,
                           uint64_t seed) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    std::mt19937_64 rng(mix_seed(seed, (uint64_t)b));
    std::uniform_int_distribution<int64_t> dist(0, pool_n - 1);
    std::unordered_set<int64_t> taboo;
    taboo.reserve((size_t)(Lb + K) * 2);
    for (int64_t j = 0; j < Lb; ++j) {
      int64_t v = blacklist[b * Lb + j];
      if (v > 0) taboo.insert(v);
    }
    int64_t n = 0;
    int64_t guard = 0;
    const int64_t max_tries = 64 * K + 1024;
    while (n < K && guard < max_tries) {
      ++guard;
      int64_t cand = pool[dist(rng)];
      if (taboo.count(cand)) continue;
      taboo.insert(cand);
      out[b * K + n++] = cand;
    }
    while (n < K) {
      int64_t cand = pool[dist(rng)];
      if (!taboo.count(cand) || (int64_t)taboo.size() >= pool_n + Lb) {
        out[b * K + n++] = cand;
      } else {
        // pool nearly exhausted: accept repeats of non-blacklisted items
        out[b * K + n++] = cand;
      }
    }
  }
}

// Weighted (popularity CDF) variant: with replacement, blacklist-rejected.
// cdf: [pool_n] nondecreasing in (0, 1].
void sample_negatives_weighted(int64_t* out, int64_t B, int64_t K,
                               const int64_t* blacklist, int64_t Lb,
                               const int64_t* pool, const double* cdf,
                               int64_t pool_n, uint64_t seed) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    std::mt19937_64 rng(mix_seed(seed, (uint64_t)b));
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    std::unordered_set<int64_t> taboo;
    for (int64_t j = 0; j < Lb; ++j) {
      int64_t v = blacklist[b * Lb + j];
      if (v > 0) taboo.insert(v);
    }
    int64_t n = 0;
    int64_t guard = 0;
    const int64_t max_tries = 64 * K + 1024;
    while (n < K) {
      double u = unif(rng);
      // binary search in cdf
      int64_t lo = 0, hi = pool_n - 1;
      while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (cdf[mid] < u) lo = mid + 1; else hi = mid;
      }
      int64_t cand = pool[lo];
      ++guard;
      if (guard < max_tries && taboo.count(cand)) continue;
      out[b * K + n++] = cand;
    }
  }
}

}  // extern "C"
