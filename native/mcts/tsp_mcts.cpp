// MCTS TSP refinement solver driven by diffusion heatmaps.
//
// Capability parity with the reference's tsp_mcts C++ tool (adapted from
// Spider-scnu/TSP; see /root/reference/tsp_mcts/code): heatmap-seeded
// candidate sets, probabilistic initial tours, candidate-restricted
// first-improvement 2-opt, UCB-guided simulated k-opt action chains with
// weight back-propagation, random-restart outer loop under a T*N-second
// budget, and gap statistics vs the optimal tours embedded in the instance
// file.
//
// Redesign (same algorithm, clean engineering):
// - no globals / hard-coded paths or instance counts (the reference requires
//   editing TSP_IO.h:17,292 per run); everything is CLI-configured
// - one Solver object per instance; instances run on a std::thread pool
//   (replacing the 16-process shell fan-out of solve-*.sh)
// - numerically safe softmax sampling for the initial tour (the reference's
//   e^{100*heat} can overflow)
//
// Algorithmic semantics retained from the reference for parity:
//   int distances with coordinates magnified x10000 and rounded
//   candidate sets: cities sorted by desc heat, truncated at heat < 1e-4
//   weight init = 100 * heat; UCB potential W/avgW + alpha*sqrt(ln(S+1)/
//     (ln(e)*(chosen+1))); action depth cap; backprop beta*(e^{delta/L}-1)
//
// Build: make -C native   ->  native/build/tsp_mcts
// Usage:
//   tsp_mcts --instances tsp500_test.txt --heatmaps 'heatmap/tsp500_{i}.txt' \
//            --output stats.txt [--tours tours.txt] [--time 0.1] [--h 10] \
//            [--alpha 1] [--beta 10] [--max_depth 10] [--threads 16] \
//            [--start 0] [--count -1] [--seed 489663920]

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <mutex>
#include <numeric>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kNull = -1;
constexpr long long kInf = 1000000000LL;
constexpr double kMagnify = 10000.0;

struct Params {
  double alpha = 1.0;     // UCB exploration weight
  double beta = 10.0;     // backprop increase rate
  double h = 10.0;        // simulations per round = h * n
  double time_per_city = 0.10;  // seconds of budget per city
  int max_depth = 10;     // k-opt chain depth cap
  unsigned seed = 489663920;
};

struct Instance {
  std::vector<double> x, y;   // raw coordinates
  std::vector<int> opt_tour;  // 0-indexed, length n
};

class Solver {
 public:
  Solver(const Instance& inst, const std::vector<double>& heat_sym,
         const Params& p)
      : p_(p), n_(static_cast<int>(inst.x.size())), heat_(heat_sym),
        rng_(p.seed) {
    xs_.resize(n_);
    ys_.resize(n_);
    for (int i = 0; i < n_; ++i) {
      xs_[i] = inst.x[i] * kMagnify;
      ys_[i] = inst.y[i] * kMagnify;
    }
    dist_.assign(static_cast<size_t>(n_) * n_, 0);
    for (int i = 0; i < n_; ++i)
      for (int j = 0; j < n_; ++j)
        dist_[idx(i, j)] =
            (i == j) ? kInf : int_dist(i, j);
    weight_.resize(static_cast<size_t>(n_) * n_);
    for (size_t k = 0; k < weight_.size(); ++k) weight_[k] = 100.0 * heat_[k];
    chosen_.assign(static_cast<size_t>(n_) * n_, 0);
    build_candidates();
    nxt_.assign(n_, kNull);
    prv_.assign(n_, kNull);
    best_nxt_ = nxt_;
    best_prv_ = prv_;
  }

  // Run the restart loop under the time budget; returns best int distance.
  long long solve() {
    auto t0 = std::chrono::steady_clock::now();
    const double budget = p_.time_per_city * n_;
    auto elapsed = [&] {
      return std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                           t0)
          .count();
    };
    best_dist_ = kInf;
    total_sims_ = 0;
    init_tour();
    two_opt();
    mcts(t0, budget);
    while (elapsed() < budget) {
      init_tour();
      two_opt();
      mcts(t0, budget);
    }
    nxt_ = best_nxt_;
    prv_ = best_prv_;
    return best_dist_;
  }

  double tour_double_distance() const {
    double s = 0;
    int cur = 0;
    for (int i = 0; i < n_; ++i) {
      const int nx = best_nxt_[cur];
      const double dx = xs_[cur] - xs_[nx], dy = ys_[cur] - ys_[nx];
      s += std::sqrt(dx * dx + dy * dy);
      cur = nx;
    }
    return s / kMagnify;
  }

  std::vector<int> tour() const {
    std::vector<int> t;
    t.reserve(n_ + 1);
    int cur = 0;
    for (int i = 0; i <= n_; ++i) {
      t.push_back(cur);
      cur = best_nxt_[cur];
    }
    return t;
  }

 private:
  size_t idx(int i, int j) const { return static_cast<size_t>(i) * n_ + j; }

  long long int_dist(int i, int j) const {
    const double dx = xs_[i] - xs_[j], dy = ys_[i] - ys_[j];
    return static_cast<long long>(0.5 + std::sqrt(dx * dx + dy * dy));
  }
  long long d(int i, int j) const { return dist_[idx(i, j)]; }

  // Candidate sets: cities in descending heat order, truncated where the
  // best remaining heat drops below 1e-4 (TSP_Basic_Functions.h:183-212).
  void build_candidates() {
    cand_off_.assign(n_ + 1, 0);
    std::vector<std::vector<int>> tmp(n_);
    std::vector<int> order(n_);
    for (int i = 0; i < n_; ++i) {
      std::iota(order.begin(), order.end(), 0);
      std::sort(order.begin(), order.end(), [&](int a, int b) {
        return heat_[idx(i, a)] > heat_[idx(i, b)];
      });
      for (int j : order) {
        if (j == i) continue;
        if (heat_[idx(i, j)] < 1e-4) break;
        tmp[i].push_back(j);
      }
      cand_off_[i + 1] = cand_off_[i] + static_cast<int>(tmp[i].size());
    }
    cand_.reserve(cand_off_[n_]);
    for (auto& v : tmp) cand_.insert(cand_.end(), v.begin(), v.end());
  }
  int cand_count(int i) const { return cand_off_[i + 1] - cand_off_[i]; }
  int candidate(int i, int k) const { return cand_[cand_off_[i] + k]; }

  // Probabilistic construction: next city ~ softmax(weight[cur][.]) over
  // unselected cities (TSP_Init.h:61-97, overflow-safe).
  void init_tour() {
    std::vector<char> sel(n_, 0);
    std::vector<int> seq;
    seq.reserve(n_);
    int cur = 0;
    seq.push_back(cur);
    sel[cur] = 1;
    std::vector<int> rem(n_ - 1);
    {
      int k = 0;
      for (int i = 0; i < n_; ++i)
        if (i != cur) rem[k++] = i;
    }
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    while (!rem.empty()) {
      double wmax = -1e300;
      for (int j : rem) wmax = std::max(wmax, weight_[idx(cur, j)]);
      double total = 0;
      probs_.resize(rem.size());
      for (size_t k = 0; k < rem.size(); ++k) {
        probs_[k] = std::exp(weight_[idx(cur, rem[k])] - wmax);
        total += probs_[k];
      }
      double r = uni(rng_) * total, acc = 0;
      size_t pick = rem.size() - 1;
      for (size_t k = 0; k < rem.size(); ++k) {
        acc += probs_[k];
        if (r <= acc) {
          pick = k;
          break;
        }
      }
      const int nxt_city = rem[pick];
      rem[pick] = rem.back();
      rem.pop_back();
      seq.push_back(nxt_city);
      sel[nxt_city] = 1;
      cur = nxt_city;
    }
    for (int i = 0; i < n_; ++i) {
      const int a = seq[i], b = seq[(i + 1) % n_];
      nxt_[a] = b;
      prv_[b] = a;
    }
    note_if_best();
  }

  long long tour_distance() const {
    long long s = 0;
    for (int i = 0; i < n_; ++i) s += d(i, nxt_[i]);
    return s;
  }

  void note_if_best() {
    const long long td = tour_distance();
    if (td < best_dist_) {
      best_dist_ = td;
      best_nxt_ = nxt_;
      best_prv_ = prv_;
    }
  }

  // Reverse the linked sub-path from a to b (inclusive).
  void reverse_path(int a, int b) {
    int cur = a, nx = nxt_[cur];
    while (true) {
      std::swap(nxt_[cur], prv_[cur]);
      if (cur == b) break;
      cur = nx;
      nx = nxt_[cur];
    }
  }

  bool adjacent_or_same(int i, int j) const {
    return i == j || nxt_[i] == j || nxt_[j] == i;
  }

  void bump_weight(int a, int b, double inc) {
    weight_[idx(a, b)] += inc;
    weight_[idx(b, a)] += inc;
  }
  void bump_chosen(int a, int b) {
    ++chosen_[idx(a, b)];
    ++chosen_[idx(b, a)];
  }

  // Candidate-restricted first-improvement 2-opt (TSP_2Opt.h).
  void two_opt() {
    bool improved = true;
    while (improved) {
      improved = false;
      for (int i = 0; i < n_ && !improved; ++i) {
        const int cn = cand_count(i);
        for (int k = 0; k < cn; ++k) {
          const int j = candidate(i, k);
          if (adjacent_or_same(i, j)) continue;
          const int inext = nxt_[i], jnext = nxt_[j];
          bump_chosen(i, j);
          bump_chosen(inext, jnext);
          ++total_sims_;
          const long long delta =
              d(i, inext) + d(j, jnext) - d(i, j) - d(inext, jnext);
          if (delta > 0) {
            const long long before = tour_distance();
            reverse_path(inext, j);
            nxt_[i] = j;
            prv_[j] = i;
            nxt_[inext] = jnext;
            prv_[jnext] = inext;
            const double inc =
                p_.beta *
                (std::exp(static_cast<double>(delta) / before) - 1.0);
            bump_weight(i, j, inc);
            bump_weight(inext, jnext, inc);
            improved = true;
            break;
          }
        }
      }
    }
    note_if_best();
  }

  double avg_weight(int c) const {
    double s = 0;
    for (int j = 0; j < n_; ++j)
      if (j != c) s += weight_[idx(c, j)];
    return s / (n_ - 1);
  }

  double potential(int a, int b, double avg_w) const {
    return weight_[idx(a, b)] / avg_w +
           p_.alpha * std::sqrt(std::log(static_cast<double>(total_sims_) + 1.0) /
                                (chosen_[idx(a, b)] + 1.0));
  }

  // Choose a_{i+1}: candidates of cur with potential >= 1, excluding begin
  // and the current successor; sampled proportional to potential.
  int choose_city(int cur, int begin) {
    const double avg_w = avg_weight(cur);
    const int cn = cand_count(cur);
    promising_.clear();
    pot_.clear();
    double total = 0;
    for (int k = 0; k < cn; ++k) {
      const int c = candidate(cur, k);
      if (c == begin || c == nxt_[cur]) continue;
      const double pot = potential(cur, c, avg_w);
      if (pot < 1.0) continue;
      promising_.push_back(c);
      pot_.push_back(pot);
      total += pot;
    }
    if (promising_.empty()) return kNull;
    std::uniform_real_distribution<double> uni(0.0, total);
    double r = uni(rng_), acc = 0;
    for (size_t k = 0; k < promising_.size(); ++k) {
      acc += pot_[k];
      if (r <= acc) return promising_[k];
    }
    return promising_.back();
  }

  // Simulate one k-opt action chain from begin; returns best real gain and
  // fills action_ with the chain truncated at its best depth
  // (TSP_MCTS.h:103-181).
  long long simulate_action(int begin) {
    const int b1 = nxt_[begin];
    // snapshot for restoration
    backup_nxt_ = nxt_;
    backup_prv_ = prv_;

    nxt_[begin] = kNull;
    prv_[b1] = kNull;
    action_.assign({begin, b1});
    gains_.assign(1, d(begin, b1));
    real_gains_.assign(1, 0LL);  // gain - d(b1, begin) == 0 for the trivial close
    real_gains_[0] = gains_[0] - d(b1, begin);

    int cur = b1;
    bool changed = false;
    while (true) {
      const int a_next = choose_city(cur, begin);
      if (a_next == kNull) break;
      bump_chosen(cur, a_next);
      const int b_next = prv_[a_next];
      action_.push_back(a_next);
      action_.push_back(b_next);
      gains_.push_back(gains_.back() - d(cur, a_next) + d(a_next, b_next));
      real_gains_.push_back(gains_.back() - d(b_next, begin));
      reverse_path(cur, b_next);
      nxt_[cur] = a_next;
      prv_[a_next] = cur;
      prv_[b_next] = kNull;
      changed = true;
      cur = b_next;
      if (real_gains_.back() > 0 ||
          static_cast<int>(real_gains_.size()) > p_.max_depth)
        break;
    }

    // restore
    nxt_ = backup_nxt_;
    prv_ = backup_prv_;
    (void)changed;

    // best depth
    long long best_gain = -kInf;
    size_t best_i = 1;
    for (size_t i = 1; i < real_gains_.size(); ++i)
      if (real_gains_[i] > best_gain) {
        best_gain = real_gains_[i];
        best_i = i;
      }
    if (real_gains_.size() == 1) return -kInf;  // no extension found
    action_.resize(2 * (best_i + 1));
    return best_gain;
  }

  void execute_action(const std::vector<int>& act) {
    const int begin = act[0];
    int cur = act[1];
    nxt_[begin] = kNull;
    prv_[cur] = kNull;
    const size_t pairs = act.size() / 2;
    for (size_t i = 1; i < pairs; ++i) {
      const int a = act[2 * i], b = act[2 * i + 1];
      reverse_path(cur, b);
      nxt_[cur] = a;
      prv_[a] = cur;
      prv_[b] = kNull;
      cur = b;
    }
    // close the loop: a_1's open slot connects to the final dangling b_k
    nxt_[begin] = cur;
    prv_[cur] = begin;
  }

  void backprop(long long before, long long delta,
                const std::vector<int>& act) {
    if (delta <= 0) return;
    const double inc =
        p_.beta * (std::exp(static_cast<double>(delta) /
                            static_cast<double>(before)) -
                   1.0);
    const size_t pairs = act.size() / 2;
    for (size_t i = 0; i < pairs; ++i) {
      const int second = act[2 * i + 1];
      const int third = (i + 1 < pairs) ? act[2 * i + 2] : act[0];
      bump_weight(second, third, inc);
    }
  }

  void mcts(std::chrono::steady_clock::time_point t0, double budget) {
    auto elapsed = [&] {
      return std::chrono::duration<double>(std::chrono::steady_clock::now() -
                                           t0)
          .count();
    };
    std::uniform_int_distribution<int> pick(0, n_ - 1);
    while (elapsed() < budget) {
      const long long before = tour_distance();
      long long best_delta = -kInf;
      best_action_.clear();
      const int max_sims = static_cast<int>(p_.h * n_);
      for (int s = 0; s < max_sims; ++s) {
        const long long delta = simulate_action(pick(rng_));
        ++total_sims_;
        if (delta > best_delta) {
          best_delta = delta;
          best_action_ = action_;
        }
        if (best_delta > 0) break;
      }
      backprop(before, best_delta, best_action_);
      if (best_delta > 0 && !best_action_.empty()) {
        execute_action(best_action_);
        note_if_best();
      } else {
        break;
      }
    }
  }

  const Params p_;
  const int n_;
  std::vector<double> xs_, ys_;
  std::vector<long long> dist_;
  std::vector<double> heat_, weight_;
  std::vector<int> chosen_;
  std::vector<int> cand_, cand_off_;
  std::vector<int> nxt_, prv_, best_nxt_, best_prv_;
  std::vector<int> backup_nxt_, backup_prv_;
  std::vector<int> promising_, action_, best_action_;
  std::vector<double> pot_, probs_;
  std::vector<long long> gains_, real_gains_;
  long long best_dist_ = kInf;
  long long total_sims_ = 0;
  std::mt19937 rng_;
};

// ---- I/O -----------------------------------------------------------------

std::vector<Instance> read_instances(const std::string& path) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "cannot open instance file " << path << "\n";
    std::exit(2);
  }
  std::vector<Instance> out;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty()) continue;
    const auto sep = line.find(" output ");
    Instance inst;
    {
      std::istringstream ps(line.substr(0, sep));
      double a, b;
      while (ps >> a >> b) {
        inst.x.push_back(a);
        inst.y.push_back(b);
      }
    }
    if (sep != std::string::npos) {
      std::istringstream ts(line.substr(sep + 8));
      int t;
      std::vector<int> tour;
      while (ts >> t) tour.push_back(t - 1);
      if (!tour.empty()) tour.pop_back();  // drop repeated first city
      inst.opt_tour = tour;
    }
    out.push_back(std::move(inst));
  }
  return out;
}

// Heatmap text formats (both get the averaged symmetrization of the
// reference reader, TSP_IO.h:461-492):
//  - dense:  first token is n, then n*n doubles
//  - sparse: "SPARSE n nnz" then nnz lines "i j v" (everything else 0) —
//    at V=10000 a dense text heatmap is ~860 MB/instance, so the converter
//    (difusco_tpu/decode/mcts.py) writes only the nonzero entries
std::vector<double> read_heatmap(const std::string& path, int n) {
  std::ifstream f(path);
  if (!f) {
    std::cerr << "cannot open heatmap " << path << "\n";
    std::exit(2);
  }
  std::string first;
  f >> first;
  if (first == "SPARSE") {
    int hn = 0;
    long long nnz = 0;
    f >> hn >> nnz;
    if (hn != n) {
      std::cerr << "heatmap size " << hn << " != instance size " << n << "\n";
      std::exit(2);
    }
    std::vector<double> hs(static_cast<size_t>(n) * n, 0.0);
    for (long long e = 0; e < nnz; ++e) {
      int i, j;
      double v;
      f >> i >> j >> v;
      if (!f || i < 0 || i >= n || j < 0 || j >= n) {
        std::cerr << "bad sparse heatmap entry in " << path << "\n";
        std::exit(2);
      }
      hs[static_cast<size_t>(i) * n + j] = v;
    }
    for (int i = 0; i < n; ++i)
      for (int j = i + 1; j < n; ++j) {
        const double m = (hs[static_cast<size_t>(i) * n + j] +
                          hs[static_cast<size_t>(j) * n + i]) /
                         2.0;
        hs[static_cast<size_t>(i) * n + j] = m;
        hs[static_cast<size_t>(j) * n + i] = m;
      }
    return hs;
  }
  const int hn = std::stoi(first);
  if (hn != n) {
    std::cerr << "heatmap size " << hn << " != instance size " << n << "\n";
    std::exit(2);
  }
  std::vector<double> h(static_cast<size_t>(n) * n);
  for (auto& v : h) f >> v;
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j) {
      const double m =
          (h[static_cast<size_t>(i) * n + j] + h[static_cast<size_t>(j) * n + i]) /
          2.0;
      h[static_cast<size_t>(i) * n + j] = m;
      h[static_cast<size_t>(j) * n + i] = m;
    }
  return h;
}

std::string subst(const std::string& pattern, int i) {
  const auto pos = pattern.find("{i}");
  if (pos == std::string::npos) return pattern;
  return pattern.substr(0, pos) + std::to_string(i) + pattern.substr(pos + 3);
}

double opt_double_distance(const Instance& inst) {
  if (inst.opt_tour.empty()) return 0.0;
  double s = 0;
  const int n = static_cast<int>(inst.x.size());
  for (int i = 0; i < n; ++i) {
    const int a = inst.opt_tour[i], b = inst.opt_tour[(i + 1) % n];
    const double dx = inst.x[a] - inst.x[b], dy = inst.y[a] - inst.y[b];
    s += std::sqrt(dx * dx + dy * dy);
  }
  return s;
}

}  // namespace

int main(int argc, char** argv) {
  std::string instances_path, heatmap_pattern, output_path = "stats.txt",
                                               tours_path;
  Params params;
  int threads = static_cast<int>(std::thread::hardware_concurrency());
  int start = 0, count = -1;

  for (int i = 1; i < argc; ++i) {
    const std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) {
        std::cerr << "missing value for " << a << "\n";
        std::exit(2);
      }
      return argv[++i];
    };
    if (a == "--instances") instances_path = next();
    else if (a == "--heatmaps") heatmap_pattern = next();
    else if (a == "--output") output_path = next();
    else if (a == "--tours") tours_path = next();
    else if (a == "--time") params.time_per_city = std::stod(next());
    else if (a == "--h") params.h = std::stod(next());
    else if (a == "--alpha") params.alpha = std::stod(next());
    else if (a == "--beta") params.beta = std::stod(next());
    else if (a == "--max_depth") params.max_depth = std::stoi(next());
    else if (a == "--seed") params.seed = static_cast<unsigned>(std::stoul(next()));
    else if (a == "--threads") threads = std::stoi(next());
    else if (a == "--start") start = std::stoi(next());
    else if (a == "--count") count = std::stoi(next());
    else {
      std::cerr << "unknown flag " << a << "\n";
      return 2;
    }
  }
  if (instances_path.empty() || heatmap_pattern.empty()) {
    std::cerr << "usage: tsp_mcts --instances F --heatmaps 'pat_{i}.txt' "
                 "[--output F] [--tours F] [--time 0.1] [--h 10] [--alpha 1] "
                 "[--beta 10] [--max_depth 10] [--threads N] [--start I] "
                 "[--count N] [--seed S]\n";
    return 2;
  }

  auto instances = read_instances(instances_path);
  const int total = static_cast<int>(instances.size());
  const int end =
      (count < 0) ? total : std::min(total, start + count);

  std::vector<double> my_dist(total, 0), opt_dist(total, 0), secs(total, 0);
  std::vector<std::vector<int>> tours(total);
  std::atomic<int> cursor{start};
  std::mutex io_mu;

  auto worker = [&] {
    while (true) {
      const int i = cursor.fetch_add(1);
      if (i >= end) break;
      const int n = static_cast<int>(instances[i].x.size());
      auto heat = read_heatmap(subst(heatmap_pattern, i), n);
      Params p = params;
      p.seed = params.seed + static_cast<unsigned>(i);
      Solver solver(instances[i], heat, p);
      const auto t0 = std::chrono::steady_clock::now();
      solver.solve();
      secs[i] = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
      my_dist[i] = solver.tour_double_distance();
      opt_dist[i] = opt_double_distance(instances[i]);
      tours[i] = solver.tour();
      std::lock_guard<std::mutex> g(io_mu);
      std::printf("inst %d: my=%.6f opt=%.6f gap=%.4f%% time=%.1fs\n", i,
                  my_dist[i], opt_dist[i],
                  opt_dist[i] > 0
                      ? 100.0 * (my_dist[i] - opt_dist[i]) / opt_dist[i]
                      : 0.0,
                  secs[i]);
      std::fflush(stdout);
    }
  };

  threads = std::max(1, std::min(threads, end - start));
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();

  double sum_my = 0, sum_opt = 0, sum_gap = 0;
  int n_done = 0;
  for (int i = start; i < end; ++i) {
    sum_my += my_dist[i];
    sum_opt += opt_dist[i];
    if (opt_dist[i] > 0) sum_gap += (my_dist[i] - opt_dist[i]) / opt_dist[i];
    ++n_done;
  }
  std::ofstream out(output_path);
  out << "instances " << n_done << "\n";
  out << "avg_my_distance " << sum_my / n_done << "\n";
  out << "avg_opt_distance " << sum_opt / n_done << "\n";
  out << "avg_gap_percent " << 100.0 * sum_gap / n_done << "\n";
  std::printf("avg gap: %.4f%% over %d instances -> %s\n",
              100.0 * sum_gap / n_done, n_done, output_path.c_str());

  if (!tours_path.empty()) {
    std::ofstream tf(tours_path);
    for (int i = start; i < end; ++i) {
      for (size_t k = 0; k < tours[i].size(); ++k)
        tf << tours[i][k] + 1 << (k + 1 < tours[i].size() ? ' ' : '\n');
    }
  }
  return 0;
}
