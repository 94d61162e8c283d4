// Greedy edge-insertion tour merge — native CPU implementation.
//
// Capability parity with the reference's Cython merge
// (difusco/utils/cython_merge/cython_merge.pyx:19-120): sort all edges by
// -heat/dist ascending, insert an edge iff both endpoints are path endpoints
// of different fragments, stop at N-1 insertions, close the cycle.
//
// Redesign: the union-find over path endpoints is replaced by O(1)
// endpoint linking (other_end pointers), and multi-sample batches are
// decoded on a std::thread pool instead of a Python multiprocessing.Pool.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <thread>
#include <vector>

namespace {

struct MergeResult {
  int iterations;
};

// Merge one (N, N) heatmap into a tour adjacency. heat must already be
// symmetrized (A + A^T). out_adj is an N*N 0/1 int32 buffer.
MergeResult merge_one(const double* points, const double* heat, int n,
                      int32_t* out_adj, int32_t* out_tour) {
  const int64_t nn = static_cast<int64_t>(n) * n;
  std::vector<double> ratio(nn);
  for (int i = 0; i < n; ++i) {
    const double xi = points[2 * i], yi = points[2 * i + 1];
    for (int j = 0; j < n; ++j) {
      const double dx = xi - points[2 * j], dy = yi - points[2 * j + 1];
      const double d = std::sqrt(dx * dx + dy * dy);
      ratio[static_cast<int64_t>(i) * n + j] =
          (i == j || d <= 0.0) ? HUGE_VAL
                               : -heat[static_cast<int64_t>(i) * n + j] / d;
    }
  }
  std::vector<int64_t> order(nn);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return ratio[a] < ratio[b]; });

  std::vector<int> deg(n, 0), other_end(n);
  std::vector<std::array<int, 2>> nbr(n, {-1, -1});
  std::iota(other_end.begin(), other_end.end(), 0);
  std::fill(out_adj, out_adj + nn, 0);

  int added = 0, iterations = 0;
  for (int64_t e : order) {
    if (added == n - 1) break;
    ++iterations;
    const int a = static_cast<int>(e / n), b = static_cast<int>(e % n);
    if (a == b || deg[a] >= 2 || deg[b] >= 2 || other_end[a] == b) continue;
    const int ea = other_end[a], eb = other_end[b];
    other_end[ea] = eb;
    other_end[eb] = ea;
    nbr[a][deg[a]++] = b;
    nbr[b][deg[b]++] = a;
    out_adj[static_cast<int64_t>(a) * n + b] = 1;
    out_adj[static_cast<int64_t>(b) * n + a] = 1;
    ++added;
  }
  // close the cycle
  int e0 = -1, e1 = -1;
  for (int i = 0; i < n; ++i)
    if (deg[i] < 2) {
      if (e0 < 0)
        e0 = i;
      else
        e1 = i;
    }
  if (e0 >= 0 && e1 >= 0) {
    nbr[e0][deg[e0]++] = e1;
    nbr[e1][deg[e1]++] = e0;
    out_adj[static_cast<int64_t>(e0) * n + e1] = 1;
    out_adj[static_cast<int64_t>(e1) * n + e0] = 1;
  }
  // walk the tour: start at 0, step to the max-index neighbor != prev
  // (mirrors tsp_utils.py:134-142)
  if (out_tour != nullptr) {
    int cur = 0, prev = -1;
    out_tour[0] = 0;
    for (int i = 1; i <= n; ++i) {
      const int n0 = nbr[cur][0], n1 = nbr[cur][1];
      const int mx = std::max(n0, n1), mn = std::min(n0, n1);
      const int nxt = (mx == prev) ? mn : mx;
      out_tour[i] = nxt;
      prev = cur;
      cur = nxt;
    }
  }
  return {iterations};
}

}  // namespace

extern "C" {

// points: (n, 2) float64; heats: (s, n, n) float64 symmetrized;
// out_adj: (s, n, n) int32; out_tours: (s, n+1) int32 or null;
// out_iters: (s,) int32. n_threads <= 0 -> hardware concurrency.
void merge_batch(const double* points, const double* heats, int s, int n,
                 int32_t* out_adj, int32_t* out_tours, int32_t* out_iters,
                 int n_threads) {
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, s));
  const int64_t nn = static_cast<int64_t>(n) * n;

  auto work = [&](int tid) {
    for (int i = tid; i < s; i += n_threads) {
      MergeResult r =
          merge_one(points, heats + i * nn, n, out_adj + i * nn,
                    out_tours ? out_tours + static_cast<int64_t>(i) * (n + 1)
                              : nullptr);
      out_iters[i] = r.iterations;
    }
  };
  if (n_threads == 1) {
    work(0);
    return;
  }
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work, t);
  for (auto& th : pool) th.join();
}

}  // extern "C"
