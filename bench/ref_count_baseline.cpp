// Single-core C++ counting baseline, measured locally since the reference's
// counting engine (the kmtricks binary, invoked by kmdiff count —
// /root/reference/src/cmd.cpp:34-44) cannot be built here (empty submodule).
//
// Clean-room replica of the kmtricks-shaped per-sample counting loop:
// FASTA parse -> 2-bit encode (code = (ascii>>1)&3: A=0,C=1,T=2,G=3, the
// kmtricks encoding) -> canonical k-mers (lexicographic min of the encoded
// k-mer and its reverse complement) -> sort -> run-length count -> hard-min
// filter -> abundance histogram. This is the honest single-core unit of
// work our fused device counting kernel replaces (kmdiff_tpu/ops/codec.py);
// partition bucketing is a byte-cheap hash on top of either path and is
// excluded from both sides.
//
// Build: g++ -O3 -march=native -o ref_count_baseline ref_count_baseline.cpp
// Usage: ref_count_baseline <k> <hard_min> <fasta1> [fasta2 ...]
// Output: one line "<bases_per_sec>" on stdout; stats on stderr.
// k <= 32 (one uint64 key) — matches the bench cohort's k=31.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace {

// code = (c >> 1) & 3 gives A=0,C=1,T=2,G=3; complement = code ^ 2
inline int base_code(unsigned char c) {
  switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'T': case 't': return 2;
    case 'G': case 'g': return 3;
    default: return -1;
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s k hard_min fasta...\n", argv[0]);
    return 2;
  }
  const unsigned k = std::strtoul(argv[1], nullptr, 10);
  const uint64_t hard_min = std::strtoull(argv[2], nullptr, 10);
  if (k < 2 || k > 32) { std::fprintf(stderr, "need 2<=k<=32\n"); return 2; }

  const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
  const unsigned rc_shift = 2 * (k - 1);

  uint64_t total_bases = 0, total_distinct = 0, total_kept = 0;
  std::vector<uint64_t> hist(256, 0);

  auto t0 = std::chrono::steady_clock::now();
  std::vector<uint64_t> kmers;
  std::string line, seq;

  for (int a = 3; a < argc; ++a) {
    std::ifstream f(argv[a]);
    if (!f) { std::fprintf(stderr, "missing %s\n", argv[a]); return 2; }
    kmers.clear();

    auto flush_seq = [&]() {
      if (seq.size() < k) { seq.clear(); return; }
      total_bases += seq.size();
      uint64_t fwd = 0, rev = 0;
      unsigned have = 0;  // consecutive valid bases in the rolling window
      for (unsigned char c : seq) {
        int code = base_code(c);
        if (code < 0) { have = 0; fwd = rev = 0; continue; }
        fwd = ((fwd << 2) | (uint64_t)code) & mask;
        rev = (rev >> 2) | ((uint64_t)(code ^ 2) << rc_shift);
        if (++have >= k) kmers.push_back(std::min(fwd, rev));
      }
      seq.clear();
    };

    while (std::getline(f, line)) {
      if (!line.empty() && line[0] == '>') flush_seq();
      else seq += line;
    }
    flush_seq();

    std::sort(kmers.begin(), kmers.end());
    size_t i = 0;
    while (i < kmers.size()) {
      size_t j = i + 1;
      while (j < kmers.size() && kmers[j] == kmers[i]) ++j;
      uint64_t count = j - i;
      ++total_distinct;
      if (count >= hard_min) {
        ++total_kept;
        hist[std::min<uint64_t>(count, 255)]++;
      }
      i = j;
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();

  uint64_t hist_mass = 0;
  for (size_t c = 0; c < hist.size(); ++c) hist_mass += c * hist[c];
  std::fprintf(stderr,
               "bases=%llu distinct=%llu kept=%llu hist_mass=%llu secs=%.3f\n",
               (unsigned long long)total_bases,
               (unsigned long long)total_distinct,
               (unsigned long long)total_kept,
               (unsigned long long)hist_mass, secs);
  std::printf("%.1f\n", total_bases / secs);
  return 0;
}
