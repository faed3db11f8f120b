// Reference-exact diff oracle: an independent C++ re-execution of kmdiff's
// entire diff pipeline (merge -> HAWK Poisson LRT -> multiple-testing
// correction -> significant-set output) used to break the golden-value
// circularity: the kmdiff binary itself cannot be built here (empty kmtricks
// submodule), but every piece of its *numerics* is specified by small
// vendored sources, which this oracle reproduces verbatim-semantics:
//
//   * PoissonLikelihood::process — reference include/kmdiff/model.hpp:133-176
//     (double sums, int-truncated poisson_prob args, LR<0 clip, the
//     descending-product log-factorial table of src/log_factorial_table.cpp)
//   * chi^2_1 upper tail — the reference's actual alglib implementation,
//     linked from the VENDORED sources (thirdparty/alglib/src) at build time
//   * histogram-derived totals — src/kmtricks_utils.cpp:78-139
//     (total -= j * unique_bin[j-1] for j in [1, ab_min))
//   * merge observer pre-filter p <= alpha/cutoff — merge.hpp:78,
//     diff.hpp:147 (ab_mins all 1, recurrence 1: diff.hpp:109)
//   * correctors with strict '<' and mutating state — src/corrector.cpp:9-116
//   * sorted-aggregator ascending-p walk with stop-at-first-rejection for
//     Benjamini/Holm — aggregator.hpp:286-310; order-free filter otherwise
//   * CONTROL -> control file, CASE+NO -> case file routing —
//     aggregator.hpp:151-163
//
// It reads the kmtricks-format run directory our `count` produces (the same
// layout the reference's checked-in fixture uses) and emits canonical sorted
// survivor tables, which tests/test_ref_oracle.py compares against the
// product pipeline's FASTA outputs.
//
// Build (see tests/test_ref_oracle.py):
//   g++ -O2 -I$ALGLIB ref_oracle.cpp $ALGLIB/{specialfunctions,ap,
//       alglibinternal,alglibmisc}.cpp ../kmdiff_tpu/native/io_codec.cpp
//       ../kmdiff_tpu/native/lz4_codec.cpp -o ref_oracle
//
// Usage:
//   ref_oracle <run_dir> <out_dir> <nb_controls> <nb_cases> <alpha> <cutoff>
//              <corr1,corr2,...>   (corrs: disabled bonferroni benjamini
//                                   holm sidak)
// Writes <out_dir>/<corr>_{control,case}.txt with lines
//   <seq>\t<p %.17g>\t<mean_control_scaled %.17g>\t<mean_case %.17g>
// sorted by sequence, plus one stdout JSON line with the counters.

#include <algorithm>
#include <array>
#include <chrono>
#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <map>
#include <queue>
#include <random>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <vector>

#include <specialfunctions.h>

extern "C" {
// kmdiff_tpu/native/io_codec.cpp (our own clean-room LZ4 frame decoder)
long lz4_frame_decompress(const uint8_t* src, long src_len, uint8_t* dst,
                          long dst_cap);
}

namespace {

// --------------------------------------------------------------------------
// log-factorial table with the reference's exact summation order
// (src/log_factorial_table.cpp: res += log(k); k-- — DESCENDING)
// --------------------------------------------------------------------------

struct LogFactTable {
  std::vector<double> table;
  explicit LogFactTable(size_t size) {
    table.reserve(size);
    for (size_t i = 0; i < size; ++i) table.push_back(compute(i));
  }
  static double compute(size_t k) {
    double res = 0;
    while (k > 1) {
      res += std::log((double)k);
      k--;
    }
    return res;
  }
  double operator[](size_t i) const {
    return i < table.size() ? table[i] : compute(i);
  }
};

// --------------------------------------------------------------------------
// run-dir readers (kmtricks v1.1.1 formats; layout documented in
// kmdiff_tpu/io/kmtricks.py and reverse-checked against the reference
// fixture tests/data_test/km_out_dir)
// --------------------------------------------------------------------------

struct Sample {
  std::string id;
  uint64_t ab_min = 0;  // fof override; 0 = use run config
};

std::vector<Sample> read_fof(const std::string& run_dir) {
  std::ifstream f(run_dir + "/kmtricks.fof");
  if (!f) { std::fprintf(stderr, "no kmtricks.fof\n"); std::exit(2); }
  std::vector<Sample> out;
  std::string line;
  while (std::getline(f, line)) {
    size_t colon = line.find(':');
    if (colon == std::string::npos) continue;
    Sample s;
    s.id = line.substr(0, colon);
    while (!s.id.empty() && (s.id.back() == ' ' || s.id.back() == '\t'))
      s.id.pop_back();
    while (!s.id.empty() && (s.id.front() == ' ' || s.id.front() == '\t'))
      s.id.erase(s.id.begin());
    if (s.id.empty()) continue;
    size_t bang = line.find('!', colon);
    if (bang != std::string::npos)
      s.ab_min = std::strtoull(line.c_str() + bang + 1, nullptr, 10);
    out.push_back(std::move(s));
  }
  return out;
}

struct Config {
  uint32_t kmer_size = 0;
  uint32_t nb_partitions = 0;
  uint64_t abundance_min = 0;
};

Config read_config(const std::string& run_dir) {
  Config cfg;
  std::string path = run_dir + "/kmdiff-count.opt";
  std::string ab_key = "abundance_min";
  struct stat st;
  if (stat(path.c_str(), &st) != 0) {
    path = run_dir + "/options.txt";
    ab_key = "c_ab_min";
  }
  std::ifstream f(path);
  std::string line;
  while (f && std::getline(f, line)) {
    if (line.find("kmer_size") == std::string::npos) continue;
    std::stringstream ss(line);
    std::string opt;
    while (std::getline(ss, opt, ',')) {
      size_t eq = opt.find('=');
      if (eq == std::string::npos) continue;
      std::string key = opt.substr(0, eq);
      uint64_t val = std::strtoull(opt.c_str() + eq + 1, nullptr, 10);
      if (key.find("kmer_size") != std::string::npos) cfg.kmer_size = val;
      else if (key.find(ab_key) != std::string::npos) cfg.abundance_min = val;
    }
  }
  // partitions = subdir count of counts/ (src/kmtricks_utils.cpp:56-63)
  std::string cdir = run_dir + "/counts";
  DIR* d = opendir(cdir.c_str());
  if (d) {
    while (dirent* e = readdir(d)) {
      if (e->d_name[0] == '.') continue;
      cfg.nb_partitions++;
    }
    closedir(d);
  }
  if (!cfg.kmer_size || !cfg.nb_partitions) {
    std::fprintf(stderr, "bad run-dir config\n");
    std::exit(2);
  }
  return cfg;
}

std::vector<uint8_t> read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) { std::fprintf(stderr, "missing %s\n", path.c_str()); std::exit(2); }
  f.seekg(0, std::ios::end);
  std::vector<uint8_t> buf((size_t)f.tellg());
  f.seekg(0);
  f.read((char*)buf.data(), buf.size());
  return buf;
}

uint32_t rd32(const uint8_t* p) { uint32_t v; std::memcpy(&v, p, 4); return v; }
uint64_t rd64(const uint8_t* p) { uint64_t v; std::memcpy(&v, p, 8); return v; }

// per-sample total k-mer mass from the histogram, minus sub-ab_min mass
// (src/kmtricks_utils.cpp:78-139)
uint64_t hist_total(const std::string& path, uint64_t ab_min) {
  auto buf = read_file(path);
  if (buf.size() < 93 || std::memcmp(buf.data(), "kmtricks", 8) != 0) {
    std::fprintf(stderr, "bad hist %s\n", path.c_str());
    std::exit(2);
  }
  const uint8_t* p = buf.data() + 13 + 8 + 8;  // header + type + ksize/idx
  uint64_t lower = rd64(p), upper = rd64(p + 8);
  uint64_t total = rd64(p + 24);
  const uint8_t* uvec = p + 64;
  uint64_t nbins = upper - lower + 1;
  for (uint64_t j = 1; j < ab_min; ++j) {
    if (j - 1 < nbins) total -= j * rd64(uvec + (j - 1) * 8);
  }
  return total;
}

struct KmerStream {
  std::vector<uint8_t> payload;  // decoded records
  size_t n = 0, rec = 0, nw = 0, cbytes = 0;
  size_t pos = 0;
  void key(size_t i, uint64_t* out) const {
    const uint8_t* r = payload.data() + i * rec;
    for (size_t w = 0; w < nw; ++w) out[w] = rd64(r + w * 8);
  }
  uint64_t count(size_t i) const {
    const uint8_t* c = payload.data() + i * rec + nw * 8;
    uint64_t v = 0;
    std::memcpy(&v, c, cbytes);  // little-endian host
    return v;
  }
};

KmerStream read_kmer_file(const std::string& path, uint32_t expect_k) {
  auto buf = read_file(path);
  if (buf.size() < 41 || std::memcmp(buf.data(), "kmtricks", 8) != 0) {
    std::fprintf(stderr, "bad kmer file %s\n", path.c_str());
    std::exit(2);
  }
  bool compressed = buf[12];
  uint32_t ksize = rd32(buf.data() + 21);
  uint32_t slots = rd32(buf.data() + 25);
  uint32_t cbytes = rd32(buf.data() + 29);
  if (ksize != expect_k || slots != 1) {
    std::fprintf(stderr, "unexpected layout in %s\n", path.c_str());
    std::exit(2);
  }
  KmerStream s;
  s.nw = (ksize + 31) / 32;
  s.cbytes = cbytes;
  s.rec = s.nw * 8 + cbytes;
  const uint8_t* body = buf.data() + 41;
  long body_len = (long)buf.size() - 41;
  if (compressed) {
    long cap = std::max<long>(4 * body_len, 1 << 16);
    for (;;) {
      s.payload.resize(cap);
      long n = lz4_frame_decompress(body, body_len, s.payload.data(), cap);
      if (n >= 0) { s.payload.resize(n); break; }
      if (n == -2 && cap < (1L << 33)) { cap *= 4; continue; }
      std::fprintf(stderr, "lz4 error in %s\n", path.c_str());
      std::exit(2);
    }
  } else {
    s.payload.assign(body, body + body_len);
  }
  if (s.payload.size() % s.rec) {
    std::fprintf(stderr, "ragged payload in %s\n", path.c_str());
    std::exit(2);
  }
  s.n = s.payload.size() / s.rec;
  return s;
}

// --------------------------------------------------------------------------
// the model (verbatim semantics of model.hpp:133-176)
// --------------------------------------------------------------------------

enum class Sign { CONTROL, CASE, NO };

struct Model {
  uint64_t sum_controls, sum_cases;
  const LogFactTable& lf;

  double poisson_prob(int k, double lambda) const {
    if (lambda <= 0) return 0;
    if (k < 0) k = 0;
    return (-lambda + (k * std::log(lambda) - lf[(size_t)k]));
  }

  // counts row -> (p, sign, scaled mean_control, mean_case)
  void process(const uint64_t* row, size_t nc, size_t S, double& p,
               Sign& sign, double& mc, double& mk) const {
    double sum_c = 0, sum_k = 0;
    for (size_t s = 0; s < nc; ++s) sum_c += (double)row[s];
    for (size_t s = nc; s < S; ++s) sum_k += (double)row[s];

    double mean = (sum_c + sum_k) / (double)(sum_controls + sum_cases);

    double alt = 0, null_ = 0;
    alt += poisson_prob((int)sum_c, sum_c);
    alt += poisson_prob((int)sum_k, sum_k);
    null_ += poisson_prob((int)sum_c, mean * sum_controls);
    null_ += poisson_prob((int)sum_k, mean * sum_cases);

    double lr = alt - null_;
    if (lr < 0) lr = 0;
    p = alglib::chisquarecdistribution(1, 2 * lr);

    // sign + the SCALED control mean returned/serialized by the reference
    double mc_scaled = sum_c * (double)sum_cases / (double)sum_controls;
    if (mc_scaled < sum_k) sign = Sign::CASE;
    else if (mc_scaled > sum_k) sign = Sign::CONTROL;
    else sign = Sign::NO;
    mc = mc_scaled;
    mk = sum_k;
  }
};

// --------------------------------------------------------------------------
// correctors (src/corrector.cpp:9-116; strict '<', mutating state)
// --------------------------------------------------------------------------

struct Corrector {
  enum Type { NOTHING, BONFERRONI, BENJAMINI, HOLM, SIDAK } type;
  double threshold;
  uint64_t total;
  uint64_t rank = 1;          // benjamini
  uint64_t holm_total;        // holm's decrementing denominator
  bool order_dependent() const {
    return type == BENJAMINI || type == HOLM;
  }
  bool apply(double p) {
    switch (type) {
      case BONFERRONI: return p < (threshold / total);
      case SIDAK: return p < (1 - std::pow(1 - threshold, 1.0 / total));
      case NOTHING: return p < threshold;
      case BENJAMINI:
        if (p < ((rank / (double)total) * threshold)) { rank++; return true; }
        return false;
      case HOLM: return p < (threshold / holm_total--);
    }
    return false;
  }
};

Corrector make_corrector(const std::string& name, double alpha,
                         uint64_t total) {
  Corrector c{Corrector::NOTHING, alpha, total};
  c.holm_total = total;
  if (name == "bonferroni") c.type = Corrector::BONFERRONI;
  else if (name == "benjamini") c.type = Corrector::BENJAMINI;
  else if (name == "holm") c.type = Corrector::HOLM;
  else if (name == "sidak") c.type = Corrector::SIDAK;
  else if (name == "disabled" || name == "nothing") c.type = Corrector::NOTHING;
  else { std::fprintf(stderr, "unknown corrector %s\n", name.c_str()); std::exit(2); }
  return c;
}

// --------------------------------------------------------------------------
// survivors + output
// --------------------------------------------------------------------------

struct Survivor {
  std::array<uint64_t, 4> kmer{};
  double p, mc, mk;
  uint8_t sign;
  std::vector<uint64_t> row;  // per-sample counts (pop mode only)
};

// --------------------------------------------------------------------------
// population-stratification corrector, verbatim reference semantics
// (pop_strat_corrector: popstrat.hpp:147-367, src/popstrat.cpp:136-370;
// solver: glm_irls src/linear_model.cpp:297-410 with Doolittle no-pivot
// LU inverse linear_model.cpp:95-189). Clean-room transcription of the
// same semantics the product's host parity path implements
// (kmdiff_tpu/core/linear_model.py, pipeline/popstrat.py compat mode).
// --------------------------------------------------------------------------

using Mat = std::vector<std::vector<double>>;

bool lu_inverse(const Mat& m, Mat& inv) {
  // Doolittle LU without pivoting; returns false on singular/nan
  const size_t n = m.size();
  Mat lower(n, std::vector<double>(n, 0.0));
  Mat upper(n, std::vector<double>(n, 0.0));
  for (size_t i = 0; i < n; ++i) {
    for (size_t k = i; k < n; ++k) {
      double s = 0;
      for (size_t j = 0; j < i; ++j) s += lower[i][j] * upper[j][k];
      upper[i][k] = m[i][k] - s;
    }
    lower[i][i] = 1.0;
    for (size_t k = i + 1; k < n; ++k) {
      double s = 0;
      for (size_t j = 0; j < i; ++j) s += lower[k][j] * upper[j][i];
      lower[k][i] = (m[k][i] - s) / upper[i][i];
    }
  }
  double det = 1.0;
  for (size_t i = 0; i < n; ++i) det *= upper[i][i];
  if (det == 0.0 || std::isnan(det)) return false;
  inv.assign(n, std::vector<double>(n, 0.0));
  for (size_t c = 0; c < n; ++c) {
    std::vector<double> y(n, 0.0), x(n, 0.0);
    for (size_t r = 0; r < n; ++r) {
      double s = 0;
      for (size_t j = 0; j < r; ++j) s += lower[r][j] * y[j];
      y[r] = (r == c ? 1.0 : 0.0) - s;
    }
    for (size_t rr = n; rr-- > 0;) {
      double s = 0;
      for (size_t j = rr + 1; j < n; ++j) s += upper[rr][j] * x[j];
      x[rr] = (y[rr] - s) / upper[rr][rr];
      if (std::isnan(x[rr])) return false;
    }
    for (size_t r = 0; r < n; ++r) inv[r][c] = x[r];
  }
  return true;
}

double sigmoid(double v) { return 1.0 / (1.0 + std::exp(-v)); }

// glm_irls semantics: mse-delta stop (1e-6), g floor 1e-305 row masking,
// returned weights lag the last solve, singular Hessian freezes
std::vector<double> glm_irls(const Mat& x, const std::vector<double>& y,
                             int max_iters) {
  const size_t n = x.size(), F = x[0].size();
  std::vector<double> weight(F, 1.0), mu(n), eta(n);
  for (size_t i = 0; i < n; ++i) {
    mu[i] = (y[i] + 0.5) / 2.0;
    eta[i] = std::log(mu[i] / (1.0 - mu[i]));
  }
  double prev_error = 1e18;
  int iters = 0;
  while (true) {
    std::vector<double> g(n);
    bool any_good = false;
    for (size_t i = 0; i < n; ++i) {
      g[i] = mu[i] * (1.0 - mu[i]);
      if (g[i] > 1e-305) any_good = true;
    }
    if (!any_good) break;
    double error = 0;
    for (size_t i = 0; i < n; ++i) error += (y[i] - mu[i]) * (y[i] - mu[i]);
    error /= (double)n;
    if (std::fabs(error - prev_error) < 1e-6) break;
    prev_error = error;

    // H = Xg^T diag(g) Xg; rhs = Xg^T (g * z), z = eta + (y - mu)/(g+floor)
    Mat H(F, std::vector<double>(F, 0.0));
    std::vector<double> rhs(F, 0.0);
    for (size_t i = 0; i < n; ++i) {
      if (!(g[i] > 1e-305)) continue;
      const double z = eta[i] + (y[i] - mu[i]) / (g[i] + 1e-305);
      const double gz = g[i] * z;
      for (size_t a = 0; a < F; ++a) {
        rhs[a] += x[i][a] * gz;
        const double xga = x[i][a] * g[i];
        for (size_t b = 0; b < F; ++b) H[a][b] += xga * x[i][b];
      }
    }
    Mat Hinv;
    if (!lu_inverse(H, Hinv)) break;
    std::vector<double> w(F, 0.0);
    for (size_t a = 0; a < F; ++a)
      for (size_t b = 0; b < F; ++b) w[a] += Hinv[a][b] * rhs[b];
    iters++;
    if (iters >= max_iters) break;
    weight = w;
    for (size_t i = 0; i < n; ++i) {
      double e = 0;
      for (size_t a = 0; a < F; ++a) e += x[i][a] * w[a];
      eta[i] = e;
      mu[i] = sigmoid(e);
    }
  }
  return weight;
}

// reference standardize() VERBATIM, bugs included (src/popstrat.cpp:
// 325-369): column means divided by the COLUMN count, row i scaled by
// stddev[i] (the stddev of COLUMN i), rows >= F untouched; alt's last
// (ratio) column untouched (loop bounds at ncols(null))
void compat_standardize(Mat& null_f, Mat& alt_f) {
  const size_t n = null_f.size(), F = null_f[0].size();
  std::vector<double> means(F, 0.0);
  for (size_t i = 0; i < n; ++i)
    for (size_t j = 0; j < F; ++j) means[j] += null_f[i][j];
  for (size_t j = 1; j < F; ++j) means[j] /= (double)F;  // bug: ncols
  std::vector<double> stddev(std::max(n, F), 0.0);
  for (size_t i = 0; i < n; ++i)
    for (size_t j = 1; j < F; ++j) {
      const double d = null_f[i][j] - means[j];
      stddev[j] += d * d;
    }
  for (size_t j = 1; j < F; ++j) stddev[j] = std::sqrt(stddev[j] / n);
  for (size_t i = 0; i < n; ++i) {
    const double s = stddev[i];  // bug: row index
    if (std::fabs(s) > 1e-305) {
      for (size_t j = 1; j < F; ++j) {
        null_f[i][j] = (null_f[i][j] - means[j]) / s;
        alt_f[i][j] = (alt_f[i][j] - means[j]) / s;
      }
    }
  }
}

double likelihood_product(const Mat& feats, const std::vector<double>& w,
                          const std::vector<double>& y) {
  double out = 1.0;
  for (size_t i = 0; i < feats.size(); ++i) {
    double z = 0;
    for (size_t a = 0; a < w.size(); ++a) z += feats[i][a] * w[a];
    const double p = sigmoid(z);
    out *= (y[i] == 1.0 ? p : 1.0 - p);
  }
  return out;
}

struct PopStrat {
  Mat alt_features;       // [n, F+1], standardized, last col = ratio slot
  std::vector<double> Y;  // Control=1, Case=0 (popstrat.cpp:164-172)
  std::vector<double> totals;
  double null_prod = 0.0;
  int max_iter = 100;     // reference default s_max_iter
  double eps = 1e-30;     // reference default s_epsilon

  void init(const Mat& Z, size_t npc, const std::vector<double>& tot,
            size_t nb_controls) {
    const size_t n = tot.size();
    totals = tot;
    Y.assign(n, 0.0);
    for (size_t i = 0; i < nb_controls; ++i) Y[i] = 1.0;
    // null = [1 | PC1..npc | totals]; alt = [null | 0]
    Mat null_f(n), alt_f(n);
    for (size_t i = 0; i < n; ++i) {
      null_f[i].push_back(1.0);
      for (size_t j = 0; j < npc; ++j) null_f[i].push_back(Z[i][j]);
      null_f[i].push_back(tot[i]);
      alt_f[i] = null_f[i];
      alt_f[i].push_back(0.0);
    }
    compat_standardize(null_f, alt_f);
    alt_features = alt_f;
    const auto w = glm_irls(null_f, Y, max_iter);
    null_prod = likelihood_product(null_f, w, Y);
  }

  double correct(const std::vector<uint64_t>& row) {
    const size_t n = Y.size();
    Mat feats = alt_features;
    for (size_t i = 0; i < n; ++i)
      feats[i].back() = (double)row[i] / totals[i];
    const auto w = glm_irls(feats, Y, max_iter);
    double alt_prod = likelihood_product(feats, w, Y);
    double np_ = null_prod;
    if (np_ == 0.0 && alt_prod == 0.0) { np_ = 0.001; alt_prod = 1.0; }
    double llr = -2.0 * std::log(np_ / alt_prod);
    if (std::fabs(llr) < eps || llr < 0.0 || std::isnan(alt_prod)) llr = 0.0;
    return alglib::chisquarecdistribution(1, llr);
  }
};

Mat read_pcs(const std::string& path, size_t n_rows) {
  std::ifstream f(path);
  Mat out;
  std::string line;
  while (std::getline(f, line)) {
    std::stringstream ss(line);
    std::vector<double> row;
    double v;
    while (ss >> v) row.push_back(v);
    if (!row.empty()) out.push_back(row);
  }
  if (out.size() != n_rows) {
    std::fprintf(stderr, "pcs file has %zu rows, want %zu\n", out.size(),
                 n_rows);
    std::exit(2);
  }
  return out;
}

std::string decode_kmer(const uint64_t* words, uint32_t k) {
  // 2-bit codes (A=0,C=1,T=2,G=3), 32 bases/word, first base highest
  // within each word, final partial word right-aligned in its LOW bits
  static const char DEC[4] = {'A', 'C', 'T', 'G'};
  std::string out(k, 'N');
  size_t nw = (k + 31) / 32;
  size_t base = 0;
  for (size_t w = 0; w < nw; ++w) {
    size_t lo = w * 32;
    size_t hi = std::min<size_t>(k, lo + 32);
    size_t width = hi - lo;
    uint64_t v = words[w];
    for (size_t i = 0; i < width; ++i) {
      out[base + width - 1 - i] = DEC[v & 3];
      v >>= 2;
    }
    base += width;
  }
  return out;
}

}  // namespace

// Scalar popstrat corrector throughput (the reference's hot loop #2:
// one glm_irls logistic fit + likelihood products PER significant k-mer,
// popstrat.hpp:249-333) on a synthetic cohort — the single-core baseline
// for bench.py's popstrat_vs_baseline ratio. Same design shape as
// bench/config_probe.py's device measurement: [1 | PC1..npc | totals]
// null features + the per-k-mer ratio column.
static int popbench_main(int argc, char** argv) {
  const size_t B = argc > 2 ? std::strtoull(argv[2], nullptr, 10) : 16384;
  const size_t S = argc > 3 ? std::strtoull(argv[3], nullptr, 10) : 100;
  const size_t npc = argc > 4 ? std::strtoull(argv[4], nullptr, 10) : 2;
  std::mt19937_64 rng(42);
  std::uniform_real_distribution<double> upc(-1.0, 1.0);
  std::uniform_real_distribution<double> utot(9e5, 1.1e6);
  std::uniform_int_distribution<uint64_t> ucnt(0, 50);

  Mat Z(S, std::vector<double>(npc));
  std::vector<double> totals(S);
  for (size_t i = 0; i < S; ++i) {
    for (size_t j = 0; j < npc; ++j) Z[i][j] = upc(rng);
    totals[i] = utot(rng);
  }
  PopStrat ps;
  ps.init(Z, npc, totals, S / 2);

  std::vector<std::vector<uint64_t>> rows(B, std::vector<uint64_t>(S));
  for (size_t b = 0; b < B; ++b)
    for (size_t i = 0; i < S; ++i) rows[b][i] = ucnt(rng);

  double acc = 0.0;
  auto t0 = std::chrono::steady_clock::now();
  for (size_t b = 0; b < B; ++b) acc += ps.correct(rows[b]);
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  std::fprintf(stderr, "popbench B=%zu S=%zu npc=%zu acc=%.6f secs=%.3f\n",
               B, S, npc, acc, secs);
  std::printf("%.1f\n", (double)B / secs);
  return 0;
}

int main(int argc, char** argv) {
  if (argc >= 2 && std::string(argv[1]) == "popbench")
    return popbench_main(argc, argv);
  if (argc != 8 && argc != 11) {
    std::fprintf(stderr,
                 "usage: %s run_dir out_dir nb_controls nb_cases alpha "
                 "cutoff corr1[,corr2...] [pop pcs_full.tsv npc]\n",
                 argv[0]);
    return 2;
  }
  const bool pop_mode = argc == 11 && std::string(argv[8]) == "pop";
  const std::string pcs_path = pop_mode ? argv[9] : "";
  const size_t npc = pop_mode ? std::strtoull(argv[10], nullptr, 10) : 0;
  const std::string run_dir = argv[1], out_dir = argv[2];
  const size_t nb_controls = std::strtoull(argv[3], nullptr, 10);
  const size_t nb_cases = std::strtoull(argv[4], nullptr, 10);
  const double alpha = std::strtod(argv[5], nullptr);
  const double cutoff = std::strtod(argv[6], nullptr);
  std::vector<std::string> corrs;
  {
    std::stringstream ss(argv[7]);
    std::string c;
    while (std::getline(ss, c, ',')) corrs.push_back(c);
  }
  mkdir(out_dir.c_str(), 0755);

  Config cfg = read_config(run_dir);
  auto fof = read_fof(run_dir);
  const size_t S = nb_controls + nb_cases;
  if (fof.size() != S) { std::fprintf(stderr, "fof size mismatch\n"); return 2; }

  // histogram-derived totals
  uint64_t sum_controls = 0, sum_cases = 0;
  std::vector<double> totals(S);
  for (size_t i = 0; i < S; ++i) {
    uint64_t ab = fof[i].ab_min ? fof[i].ab_min : cfg.abundance_min;
    uint64_t t = hist_total(run_dir + "/histograms/" + fof[i].id + ".hist", ab);
    totals[i] = (double)t;
    if (i < nb_controls) sum_controls += t; else sum_cases += t;
  }

  LogFactTable lf(10000);
  Model model{sum_controls, sum_cases, lf};
  const double prefilter = alpha / cutoff;
  const size_t nw = (cfg.kmer_size + 31) / 32;

  uint64_t total_tested = 0;
  std::vector<Survivor> survivors;

  // per-partition k-way heap merge over the per-sample sorted streams
  for (uint32_t part = 0; part < cfg.nb_partitions; ++part) {
    std::vector<KmerStream> streams(S);
    for (size_t s = 0; s < S; ++s) {
      streams[s] = read_kmer_file(
          run_dir + "/counts/partition_" + std::to_string(part) + "/" +
              fof[s].id + ".kmer.lz4",
          cfg.kmer_size);
    }
    using Key = std::array<uint64_t, 4>;
    using Item = std::pair<Key, uint32_t>;  // (kmer words, sample)
    std::priority_queue<Item, std::vector<Item>, std::greater<Item>> heap;
    auto push_next = [&](uint32_t s) {
      if (streams[s].pos < streams[s].n) {
        Key k{};
        streams[s].key(streams[s].pos, k.data());
        heap.push({k, s});
      }
    };
    for (uint32_t s = 0; s < S; ++s) push_next(s);

    std::vector<uint64_t> row(S);
    while (!heap.empty()) {
      Key cur = heap.top().first;
      std::fill(row.begin(), row.end(), 0);
      while (!heap.empty() && heap.top().first == cur) {
        uint32_t s = heap.top().second;
        heap.pop();
        row[s] = streams[s].count(streams[s].pos);
        streams[s].pos++;
        push_next(s);
      }
      double p, mc, mk;
      Sign sign;
      model.process(row.data(), nb_controls, S, p, sign, mc, mk);
      total_tested++;
      if (p <= prefilter) {
        Survivor sv;
        for (size_t w = 0; w < nw; ++w) sv.kmer[w] = cur[w];
        sv.p = p; sv.mc = mc; sv.mk = mk; sv.sign = (uint8_t)sign;
        if (pop_mode) sv.row = row;
        survivors.push_back(sv);
      }
    }
  }

  if (pop_mode) {
    // replace survivor p-values with the popstrat-corrected LRT p
    // (reference do_pop: diff.hpp:166-225 + popstrat.hpp:249-333)
    PopStrat ps;
    ps.init(read_pcs(pcs_path, S), npc, totals, nb_controls);
    for (auto& sv : survivors) sv.p = ps.correct(sv.row);
  }

  std::printf("{\"total_tested\": %" PRIu64 ", \"survivors\": %zu",
              total_tested, survivors.size());

  for (const auto& cname : corrs) {
    Corrector corr = make_corrector(cname, alpha, total_tested);
    std::vector<const Survivor*> kept;
    if (corr.order_dependent()) {
      // ascending-p walk with stop-at-first-rejection
      // (aggregator.hpp:286-310); ties cannot change the accepted SET
      // because both boundaries are non-decreasing in rank
      std::vector<const Survivor*> sorted;
      sorted.reserve(survivors.size());
      for (const auto& s : survivors) sorted.push_back(&s);
      std::stable_sort(sorted.begin(), sorted.end(),
                       [](const Survivor* a, const Survivor* b) {
                         return a->p < b->p;
                       });
      for (const Survivor* s : sorted) {
        if (!corr.apply(s->p)) break;
        kept.push_back(s);
      }
    } else {
      for (const auto& s : survivors)
        if (corr.apply(s.p)) kept.push_back(&s);
    }

    // canonical sorted output per routed class
    std::stable_sort(kept.begin(), kept.end(),
                     [](const Survivor* a, const Survivor* b) {
                       return a->kmer < b->kmer;
                     });
    size_t n_control = 0, n_case = 0;
    std::ofstream fc(out_dir + "/" + cname + "_control.txt");
    std::ofstream fk(out_dir + "/" + cname + "_case.txt");
    char line[512];
    for (const Survivor* s : kept) {
      std::string seq = decode_kmer(s->kmer.data(), cfg.kmer_size);
      std::snprintf(line, sizeof line, "%s\t%.17g\t%.17g\t%.17g\n",
                    seq.c_str(), s->p, s->mc, s->mk);
      // CONTROL -> control file; CASE and NO -> case file
      // (aggregator.hpp:151-163)
      if (s->sign == (uint8_t)Sign::CONTROL) { fc << line; n_control++; }
      else { fk << line; n_case++; }
    }
    std::printf(", \"%s\": [%zu, %zu]", cname.c_str(), n_control, n_case);
  }
  std::printf("}\n");
  return 0;
}
