// mis_ils: maximum-independent-set heuristic via iterated local search.
//
// Clean-room implementation of the Andrade–Resende–Werneck local-search
// scheme ((1,2)-swaps + force-insert perturbations) used here as the
// framework's built-in MIS labeler. Plays the role of the reference's
// external KaMIS `redumis` binary (reference solvers/kamis.py:81-134) and
// speaks the same CLI protocol so the Python KaMIS driver can run it
// unmodified:
//
//   mis_ils <graph.metis> --output=<file> [--time_limit=SECS] [--seed=N]
//
// Input:  METIS adjacency format — header "n m", then n lines of 1-indexed
//         neighbor lists (the format solve_kamis writes).
// Output: n lines of 0/1 (the `.result` format MISDataset reads).
//
// Algorithm per ILS round:
//   1. make the solution maximal (insert all free vertices)
//   2. (1,2)-swaps to a local optimum: for u in S, if two non-adjacent
//      neighbors v,w have u as their ONLY solution neighbor, swap u -> {v,w}
//   3. perturb: force-insert a random non-solution vertex, evicting its
//      solution neighbors; accept equal-or-better, else revert to best
//      with small probability of a plateau walk

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <random>
#include <sstream>
#include <string>
#include <vector>

using Clock = std::chrono::steady_clock;

struct Graph {
  int n = 0;
  std::vector<int> off;   // CSR offsets, size n+1
  std::vector<int> nbr;   // CSR neighbors
  // dense adjacency bitrows for O(1) adjacency tests (n <= ~16k: <= 32 MB)
  int words = 0;
  std::vector<uint64_t> bits;
  bool has_bits = false;

  void build_bits() {
    if ((int64_t)n * n > (int64_t)16384 * 16384) return;
    words = (n + 63) / 64;
    bits.assign((size_t)n * words, 0);
    for (int u = 0; u < n; u++)
      for (int k = off[u]; k < off[u + 1]; k++) {
        int v = nbr[k];
        bits[(size_t)u * words + v / 64] |= 1ull << (v % 64);
      }
    has_bits = true;
  }
  bool adjacent(int u, int v) const {
    if (has_bits) return bits[(size_t)u * words + v / 64] >> (v % 64) & 1;
    const int *lo = nbr.data() + off[u], *hi = nbr.data() + off[u + 1];
    return std::binary_search(lo, hi, v);
  }
};

static Graph read_metis(const std::string& path) {
  std::ifstream f(path);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(2); }
  std::string line;
  // skip comment lines (%)
  do { std::getline(f, line); } while (!line.empty() && line[0] == '%');
  std::istringstream hdr(line);
  int n = 0; long m = 0; hdr >> n >> m;
  Graph g; g.n = n;
  std::vector<std::vector<int>> adj(n);
  for (int u = 0; u < n; u++) {
    if (!std::getline(f, line)) line.clear();
    while (!line.empty() && line[0] == '%') std::getline(f, line);
    std::istringstream ls(line);
    int v1;
    while (ls >> v1) {
      int v = v1 - 1;  // METIS is 1-indexed
      if (v >= 0 && v < n && v != u) adj[u].push_back(v);
    }
  }
  // symmetrize + dedupe (be liberal in what we accept)
  for (int u = 0; u < n; u++)
    for (int v : adj[u]) if (u < v) adj[v].push_back(u);
  g.off.assign(n + 1, 0);
  for (int u = 0; u < n; u++) {
    std::sort(adj[u].begin(), adj[u].end());
    adj[u].erase(std::unique(adj[u].begin(), adj[u].end()), adj[u].end());
    g.off[u + 1] = g.off[u] + (int)adj[u].size();
  }
  g.nbr.reserve(g.off[n]);
  for (int u = 0; u < n; u++)
    g.nbr.insert(g.nbr.end(), adj[u].begin(), adj[u].end());
  g.build_bits();
  return g;
}

struct Solution {
  const Graph* g;
  std::vector<uint8_t> in_sol;
  std::vector<int> tight;  // number of solution neighbors
  int size = 0;

  explicit Solution(const Graph& gr)
      : g(&gr), in_sol(gr.n, 0), tight(gr.n, 0) {}

  void insert(int v) {
    in_sol[v] = 1; size++;
    for (int k = g->off[v]; k < g->off[v + 1]; k++) tight[g->nbr[k]]++;
  }
  void remove(int v) {
    in_sol[v] = 0; size--;
    for (int k = g->off[v]; k < g->off[v + 1]; k++) tight[g->nbr[k]]--;
  }
  bool is_free(int v) const { return !in_sol[v] && tight[v] == 0; }
};

// insert every free vertex (random order) until the solution is maximal
static void make_maximal(Solution& s, std::mt19937& rng,
                         std::vector<int>& scratch) {
  scratch.clear();
  for (int v = 0; v < s.g->n; v++) if (s.is_free(v)) scratch.push_back(v);
  std::shuffle(scratch.begin(), scratch.end(), rng);
  for (int v : scratch) if (s.is_free(v)) s.insert(v);
}

// one pass of (1,2)-swaps; returns true if any swap was applied
static bool one_two_swaps(Solution& s, std::mt19937& rng) {
  const Graph& g = *s.g;
  bool improved = false;
  std::vector<int> sol;
  for (int v = 0; v < g.n; v++) if (s.in_sol[v]) sol.push_back(v);
  std::shuffle(sol.begin(), sol.end(), rng);
  std::vector<int> cand;
  for (int u : sol) {
    if (!s.in_sol[u]) continue;  // may have been removed by an earlier swap
    cand.clear();
    for (int k = g.off[u]; k < g.off[u + 1]; k++) {
      int v = g.nbr[k];
      if (!s.in_sol[v] && s.tight[v] == 1) cand.push_back(v);
    }
    if ((int)cand.size() < 2) continue;
    for (size_t a = 0; a + 1 < cand.size() && s.in_sol[u]; a++)
      for (size_t b = a + 1; b < cand.size(); b++)
        if (!g.adjacent(cand[a], cand[b])) {
          s.remove(u);
          s.insert(cand[a]);
          s.insert(cand[b]);
          improved = true;
          break;
        }
  }
  return improved;
}

static void local_search(Solution& s, std::mt19937& rng,
                         std::vector<int>& scratch) {
  make_maximal(s, rng, scratch);
  while (one_two_swaps(s, rng)) make_maximal(s, rng, scratch);
}

int main(int argc, char** argv) {
  std::string graph_path, out_path;
  double time_limit = 10.0;
  uint64_t seed = 1;
  int accept_band = 1;   // keep walking while within best-accept_band
  int kick_period = 37;  // every kick_period rounds use a 2-vertex kick
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a.rfind("--output=", 0) == 0) out_path = a.substr(9);
    else if (a.rfind("--time_limit=", 0) == 0) time_limit = std::atof(a.c_str() + 13);
    else if (a.rfind("--accept_band=", 0) == 0) accept_band = std::atoi(a.c_str() + 14);
    else if (a.rfind("--kick_period=", 0) == 0) kick_period = std::atoi(a.c_str() + 14);
    else if (a.rfind("--seed=", 0) == 0) seed = std::strtoull(a.c_str() + 7, nullptr, 10);
    else if (a.rfind("--", 0) == 0) { /* ignore unknown KaMIS flags */ }
    else graph_path = a;
  }
  if (graph_path.empty() || out_path.empty()) {
    std::fprintf(stderr,
                 "usage: mis_ils <graph.metis> --output=FILE "
                 "[--time_limit=SECS] [--seed=N]\n");
    return 2;
  }
  Graph g = read_metis(graph_path);
  std::mt19937 rng((uint32_t)seed);
  Solution cur(g);
  std::vector<int> scratch;
  local_search(cur, rng, scratch);
  std::vector<uint8_t> best = cur.in_sol;
  int best_size = cur.size;

  auto t0 = Clock::now();
  std::uniform_int_distribution<int> pick(0, g.n > 0 ? g.n - 1 : 0);
  std::uniform_real_distribution<double> unif(0.0, 1.0);
  long rounds = 0, stall = 0;
  const long stall_limit = 60000;  // full restart after this many
                                   // non-improving rounds (basin hop)
  while (std::chrono::duration<double>(Clock::now() - t0).count() < time_limit) {
    rounds++;
    if (++stall > stall_limit) {
      stall = 0;
      cur = Solution(g);
      local_search(cur, rng, scratch);
    }
    // perturb: force-insert a random outside vertex, evicting its
    // solution neighbors (1 eviction typical; occasionally a 2-vertex kick)
    int kicks = (rounds % kick_period == 0) ? 2 : 1;
    for (int k = 0; k < kicks; k++) {
      int v = pick(rng);
      if (cur.in_sol[v]) continue;
      for (int j = g.off[v]; j < g.off[v + 1]; j++) {
        int u = g.nbr[j];
        if (cur.in_sol[u]) cur.remove(u);
      }
      cur.insert(v);
    }
    local_search(cur, rng, scratch);
    if (cur.size > best_size) {
      best_size = cur.size;
      best = cur.in_sol;
      stall = 0;
    } else if (cur.size < best_size - accept_band) {
      // wandered too far below the best: restart the walk from it
      cur = Solution(g);
      for (int v = 0; v < g.n; v++) if (best[v]) cur.insert(v);
    }
  }

  std::ofstream out(out_path);
  for (int v = 0; v < g.n; v++) out << int(best[v]) << "\n";
  std::fprintf(stderr, "mis_ils: n=%d best=%d rounds=%ld\n", g.n, best_size,
               rounds);
  return 0;
}
