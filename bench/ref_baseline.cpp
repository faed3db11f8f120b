// Single-core C++ baseline for the diff hot loop, measured locally since
// the reference binary cannot be built here (empty submodules).
//
// Clean-room replica of what kmdiff executes per distinct k-mer inside
// km::KmerMerger::merge (reference: include/kmdiff/merge.hpp:68-103 +
// include/kmdiff/model.hpp:133-176): a k-way heap merge over S sorted
// per-sample (kmer, count) streams, then the HAWK Poisson LRT with a
// precomputed log-factorial table and the chi-square(1) upper tail
// chi2_sf(x) = erfc(sqrt(x/2)).
//
// The optional third argument is the k-mer key width in uint64 WORDS —
// the reference compiles one Kmer<KSIZE> instantiation per k regime
// (src/main.cc:29-50, KMER_LIST "32 64 96 128"): 1 word serves k<=32,
// 2 words k<=64, 4 words k<=128. Multiword keys pay wider comparisons in
// the heap and wider stream storage, exactly like km::Kmer's array of
// uint64 blocks.
//
// Build: g++ -O3 -march=native -o ref_baseline ref_baseline.cpp
// Run:   ./ref_baseline [n_kmers_per_sample] [n_samples] [key_words=1]
// Output: one line "<kmers_merged_and_tested_per_sec>"

#include <algorithm>
#include <array>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <random>
#include <vector>

static std::vector<double> log_fact;

static void init_log_fact(size_t n) {
  log_fact.resize(n);
  log_fact[0] = 0.0;
  for (size_t i = 1; i < n; ++i) log_fact[i] = log_fact[i - 1] + std::log((double)i);
}

static inline double lf(uint64_t k) {
  return k < log_fact.size() ? log_fact[k] : std::lgamma((double)k + 1.0);
}

static inline double poisson_prob(uint64_t k, double lambda) {
  if (lambda <= 0.0) return 0.0;
  return -lambda + (double)k * std::log(lambda) - lf(k);
}

template <size_t W>
static int run(size_t n_per_sample, size_t S) {
  const size_t n_controls = S / 2;
  using Key = std::array<uint64_t, W>;

  init_log_fact(10000);

  // synthetic sorted per-sample streams over a shared k-mer universe
  std::mt19937_64 rng(42);
  std::vector<std::vector<Key>> kmers(S);
  std::vector<std::vector<uint32_t>> counts(S);
  for (size_t s = 0; s < S; ++s) {
    kmers[s].resize(n_per_sample);
    counts[s].resize(n_per_sample);
    for (size_t i = 0; i < n_per_sample; ++i) {
      uint64_t v = rng() >> 2;  // ~75% overlap across samples
      for (size_t w = 0; w < W; ++w) kmers[s][i][w] = v;  // same-universe words
      counts[s][i] = 1 + (rng() & 0x1f);
    }
    std::sort(kmers[s].begin(), kmers[s].end());
  }

  double total_c = 0, total_k = 0;
  for (size_t s = 0; s < S; ++s)
    for (size_t i = 0; i < n_per_sample; ++i)
      (s < n_controls ? total_c : total_k) += counts[s][i];

  using HeapItem = std::pair<Key, uint32_t>;  // (kmer, sample)
  std::priority_queue<HeapItem, std::vector<HeapItem>, std::greater<HeapItem>> heap;
  std::vector<size_t> pos(S, 0);
  for (size_t s = 0; s < S; ++s) heap.push({kmers[s][0], (uint32_t)s});

  std::vector<uint32_t> row(S, 0);
  size_t n_distinct = 0, n_sig = 0;
  const double threshold = 0.05 / 1e5;

  auto t0 = std::chrono::steady_clock::now();
  while (!heap.empty()) {
    Key cur = heap.top().first;
    std::fill(row.begin(), row.end(), 0);
    while (!heap.empty() && heap.top().first == cur) {
      uint32_t s = heap.top().second;
      heap.pop();
      row[s] = counts[s][pos[s]];
      if (++pos[s] < n_per_sample) heap.push({kmers[s][pos[s]], s});
    }
    // HAWK Poisson LRT (model.hpp:142-176)
    uint64_t sum_c = 0, sum_k = 0;
    for (size_t s = 0; s < n_controls; ++s) sum_c += row[s];
    for (size_t s = n_controls; s < S; ++s) sum_k += row[s];
    double mean = (double)(sum_c + sum_k) / (total_c + total_k);
    double alt = poisson_prob(sum_c, (double)sum_c) + poisson_prob(sum_k, (double)sum_k);
    double null_ = poisson_prob(sum_c, mean * total_c) + poisson_prob(sum_k, mean * total_k);
    double lr_ = alt - null_;
    if (lr_ < 0) lr_ = 0;
    double p = std::erfc(std::sqrt(lr_));  // chi2_sf(2*LR, 1)
    if (p <= threshold) ++n_sig;
    ++n_distinct;
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  // n_sig printed to stderr so the loop cannot be optimized away
  std::fprintf(stderr, "distinct=%zu sig=%zu secs=%.3f words=%zu\n", n_distinct,
               n_sig, secs, W);
  std::printf("%.1f\n", (double)n_distinct / secs);
  return 0;
}

int main(int argc, char** argv) {
  const size_t n_per_sample = argc > 1 ? std::strtoull(argv[1], nullptr, 10) : (1ull << 20);
  const size_t S = argc > 2 ? std::strtoull(argv[2], nullptr, 10) : 20;
  const size_t W = argc > 3 ? std::strtoull(argv[3], nullptr, 10) : 1;
  switch (W) {
    case 1: return run<1>(n_per_sample, S);
    case 2: return run<2>(n_per_sample, S);
    case 4: return run<4>(n_per_sample, S);
    default:
      std::fprintf(stderr, "key_words must be 1, 2, or 4\n");
      return 2;
  }
}
