// Held-Karp 1-tree lower bound via subgradient ascent (Held & Karp 1971).
//
// Native equivalent of difusco_tpu/ops/held_karp.py::held_karp_lower_bound —
// same ascent schedule (lam0=2.0, halve after `patience` non-improving
// iterations, step t = lam * (UB - lb) / ||deg-2||^2), fp64 throughout, so
// the printed bound is certified at full precision. Purpose: make the
// V=10000 bounds tractable (the numpy path is ~1h/instance at V=10000; this
// runs the same 150 ascent iterations in ~20-30s).
//
// The bound depends only on coordinates: for ANY node potentials pi the
// minimum 1-tree weight under reduced costs d(i,j)+pi_i+pi_j minus
// 2*sum(pi) lower-bounds every Hamiltonian cycle. The 1-tree MST is over
// the COMPLETE graph (candidate-set restrictions would invalidate the
// certificate), computed with dense O(V^2) Prim on a precomputed distance
// matrix with the potentials folded in lazily per row.
//
// Usage: hk_bound <coords.txt> [--iterations N] [--ub U] [--lam0 L]
//                 [--patience P]
//   coords.txt: V lines of "x y". Prints "LB <value>" on success.
//   --ub: known tour cost for step sizing (nearest-neighbor tour if absent;
//         correctness of the bound never depends on it).
#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Minimum 1-tree under reduced costs D[u][v] + pi[u] + pi[v].
// Node 0 is the special node: MST over 1..V-1 plus node 0's two cheapest
// incident edges. Returns weight; fills deg.
double min_one_tree(const std::vector<double>& D, const std::vector<double>& pi,
                    int V, std::vector<int>& deg,
                    std::vector<double>& mind, std::vector<int>& parent) {
  std::fill(deg.begin(), deg.end(), 0);
  std::vector<char> in_tree(V, 0);
  in_tree[0] = 1;
  in_tree[1] = 1;
  const double* row1 = &D[(size_t)1 * V];
  for (int v = 0; v < V; ++v) mind[v] = row1[v] + pi[1] + pi[v];
  mind[0] = kInf;
  std::fill(parent.begin(), parent.end(), 1);
  double weight = 0.0;
  for (int it = 0; it < V - 2; ++it) {
    int u = -1;
    double bestd = kInf;
    for (int v = 0; v < V; ++v) {
      if (!in_tree[v] && mind[v] < bestd) {
        bestd = mind[v];
        u = v;
      }
    }
    weight += bestd;
    deg[u] += 1;
    deg[parent[u]] += 1;
    in_tree[u] = 1;
    const double* rowu = &D[(size_t)u * V];
    const double pu = pi[u];
    for (int v = 0; v < V; ++v) {
      double c = rowu[v] + pu + pi[v];
      if (c < mind[v]) {
        mind[v] = c;
        parent[v] = u;
      }
    }
  }
  // node 0: two cheapest incident edges
  const double* row0 = &D[0];
  int a = -1, b = -1;
  double wa = kInf, wb = kInf;
  for (int v = 1; v < V; ++v) {
    double c = row0[v] + pi[0] + pi[v];
    if (c < wa) {
      wb = wa;
      b = a;
      wa = c;
      a = v;
    } else if (c < wb) {
      wb = c;
      b = v;
    }
  }
  weight += wa + wb;
  deg[0] += 2;
  deg[a] += 1;
  deg[b] += 1;
  return weight;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s coords.txt [--iterations N] [--ub U] [--lam0 L] "
                 "[--patience P]\n",
                 argv[0]);
    return 2;
  }
  int iterations = 1000, patience = 20;
  double ub = -1.0, lam0 = 2.0;
  for (int i = 2; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--iterations") && i + 1 < argc)
      iterations = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--ub") && i + 1 < argc)
      ub = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--lam0") && i + 1 < argc)
      lam0 = std::atof(argv[++i]);
    else if (!std::strcmp(argv[i], "--patience") && i + 1 < argc)
      patience = std::atoi(argv[++i]);
    else {
      std::fprintf(stderr, "unknown arg: %s\n", argv[i]);
      return 2;
    }
  }

  std::vector<double> xs, ys;
  {
    FILE* f = std::fopen(argv[1], "r");
    if (!f) {
      std::fprintf(stderr, "cannot open %s\n", argv[1]);
      return 2;
    }
    double x, y;
    while (std::fscanf(f, "%lf %lf", &x, &y) == 2) {
      xs.push_back(x);
      ys.push_back(y);
    }
    std::fclose(f);
  }
  const int V = (int)xs.size();
  if (V < 3) {
    std::printf("LB 0.0\n");
    return 0;
  }

  std::vector<double> D((size_t)V * V);
  for (int i = 0; i < V; ++i) {
    double* row = &D[(size_t)i * V];
    for (int j = 0; j < V; ++j) {
      double dx = xs[i] - xs[j], dy = ys[i] - ys[j];
      row[j] = std::sqrt(dx * dx + dy * dy);
    }
  }

  std::vector<int> deg(V), parent(V);
  std::vector<double> mind(V), pi(V, 0.0), best_pi(V, 0.0);

  if (ub <= 0.0) {
    // nearest-neighbor tour for step sizing
    std::vector<char> vis(V, 0);
    vis[0] = 1;
    int cur = 0;
    double cost = 0.0;
    for (int k = 0; k < V - 1; ++k) {
      const double* row = &D[(size_t)cur * V];
      int nxt = -1;
      double bd = kInf;
      for (int v = 0; v < V; ++v)
        if (!vis[v] && row[v] < bd) {
          bd = row[v];
          nxt = v;
        }
      cost += bd;
      vis[nxt] = 1;
      cur = nxt;
    }
    ub = cost + D[(size_t)cur * V];
  }

  double best = -kInf, lam = lam0;
  int stall = 0;
  for (int it = 0; it < iterations; ++it) {
    double w = min_one_tree(D, pi, V, deg, mind, parent);
    double psum = 0.0;
    for (int v = 0; v < V; ++v) psum += pi[v];
    double lb = w - 2.0 * psum;
    if (lb > best + 1e-12) {
      best = lb;
      best_pi = pi;
      stall = 0;
    } else if (++stall >= patience) {
      lam *= 0.5;
      stall = 0;
      if (lam < 1e-6) break;
    }
    double gnorm = 0.0;
    for (int v = 0; v < V; ++v) {
      double g = deg[v] - 2;
      gnorm += g * g;
    }
    if (gnorm == 0.0) {  // the 1-tree is a tour: bound is tight
      if (lb > best) best = lb;
      break;
    }
    double t = lam * std::max(ub - lb, 1e-12) / gnorm;
    for (int v = 0; v < V; ++v) pi[v] += t * (deg[v] - 2);
  }
  // re-certify at the best potentials (mirrors the python fp64 recompute)
  double w = min_one_tree(D, best_pi, V, deg, mind, parent);
  double psum = 0.0;
  for (int v = 0; v < V; ++v) psum += best_pi[v];
  best = w - 2.0 * psum;
  std::printf("LB %.10f\n", best);
  return 0;
}
