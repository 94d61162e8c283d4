"""Held–Karp 1-tree lower bound for Euclidean TSP instances.

Purpose: independently certify benchmark gaps. The committed TSP test splits
carry best-known labels produced by this framework's own decode/MCTS stack
(there is no external Concorde/LKH in this environment — the reference
labels its data with those, data/generate_tsp_data.py:46-67). A Held–Karp
lower bound is solver-free mathematics: for ANY node potentials pi, the
minimum 1-tree weight under reduced costs d(i,j) + pi_i + pi_j, minus
2*sum(pi), lower-bounds every Hamiltonian cycle. Maximizing over pi by
subgradient ascent (Held & Karp 1971) typically reaches 99-99.9% of the
optimum, so

    gap_vs_HK_LB = (tour_cost - LB) / LB

is a certified upper bound on the true optimality gap — no circularity.

Pure numpy; O(V^2) memory, O(V^2) per ascent iteration (vectorized Prim).
For large V a jitted JAX 1-tree (``use_jax=True``) folds the potentials into
Prim's row access lazily — no O(V^2) reduced-cost matrix is ever
materialized. The V-step Prim loop is pinned to the CPU backend: thousands
of tiny sequential fori_loop steps stall on the remote-tunnel TPU backend
(each step is latency-bound, not compute-bound), while CPU runs them
compiled and fast. For production bound computation prefer
native/build/hk_bound (same ascent schedule in C++, ~1000x faster at large
V; scripts/compute_hk_bounds.py --native).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np


@functools.lru_cache(maxsize=4)
def _one_tree_jax_fn(V: int):
    """Compile a (D, pi) -> (weight, deg) minimum-1-tree for fixed V.

    Reduced cost of row u is D[u] + pi[u] + pi, formed lazily per Prim step
    (O(V) per step, O(V^2) total — but never an O(V^2) temporary).
    Pinned to the CPU backend: the V-step serial fori_loop is latency-bound
    and stalls on a remote-tunnel TPU backend (ADVICE r2)."""
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]

    INF = jnp.float32(3.4e38)

    def one_tree(D, pi):
        pi = pi.astype(jnp.float32)

        def row(u):
            return D[u] + pi[u] + pi

        deg0 = jnp.zeros(V, jnp.int32)
        in_tree0 = jnp.zeros(V, bool).at[0].set(True).at[1].set(True)
        mind0 = jnp.where(jnp.arange(V) == 0, INF, row(1))
        parent0 = jnp.ones(V, jnp.int32)

        def body(_, carry):
            weight, deg, in_tree, mind, parent = carry
            masked = jnp.where(in_tree, INF, mind)
            u = jnp.argmin(masked)
            weight = weight + masked[u]
            deg = deg.at[u].add(1).at[parent[u]].add(1)
            in_tree = in_tree.at[u].set(True)
            ru = row(u)
            better = ru < mind
            mind = jnp.where(better, ru, mind)
            parent = jnp.where(better, u, parent)
            return weight, deg, in_tree, mind, parent

        weight, deg, *_ = jax.lax.fori_loop(
            0, V - 2, body, (jnp.float32(0.0), deg0, in_tree0, mind0, parent0)
        )
        d0 = jnp.where(jnp.arange(V) == 0, INF, row(0))
        a = jnp.argmin(d0)
        w0a = d0[a]
        d0b = d0.at[a].set(INF)
        b = jnp.argmin(d0b)
        weight = weight + w0a + d0b[b]
        deg = deg.at[0].add(2).at[a].add(1).at[b].add(1)
        return weight, deg

    return jax.jit(one_tree, device=cpu)


def _min_one_tree(D: np.ndarray) -> Tuple[float, np.ndarray]:
    """Minimum 1-tree of a complete graph with weight matrix D.

    Node 0 is the special '1' node: MST over nodes 1..V-1 plus node 0's two
    cheapest incident edges. Returns (weight, degree vector).
    """
    V = D.shape[0]
    deg = np.zeros(V, np.int64)
    # Prim over nodes 1..V-1, started at node 1
    INF = np.float64("inf")
    in_tree = np.zeros(V, bool)
    in_tree[0] = True  # excluded from the MST part
    in_tree[1] = True
    mind = D[1].astype(np.float64).copy()
    mind[0] = INF
    parent = np.ones(V, np.int64)
    weight = 0.0
    for _ in range(V - 2):
        mind_masked = np.where(in_tree, INF, mind)
        u = int(np.argmin(mind_masked))
        weight += mind_masked[u]
        deg[u] += 1
        deg[parent[u]] += 1
        in_tree[u] = True
        better = D[u] < mind
        np.copyto(mind, D[u], where=better)
        np.copyto(parent, u, where=better)
    # node 0: two cheapest edges
    d0 = D[0].astype(np.float64).copy()
    d0[0] = INF
    a = int(np.argmin(d0))
    w0a = d0[a]
    d0[a] = INF
    b = int(np.argmin(d0))
    weight += w0a + d0[b]
    deg[0] += 2
    deg[a] += 1
    deg[b] += 1
    return float(weight), deg


def held_karp_lower_bound(
    points: np.ndarray,
    upper_bound: Optional[float] = None,
    iterations: int = 1000,
    lam0: float = 2.0,
    patience: int = 20,
    seed: int = 0,
    use_jax: bool = False,
) -> float:
    """Maximize the 1-tree bound by subgradient ascent over node potentials.

    Args:
      points: (V, 2) float coordinates.
      upper_bound: a known tour cost (step sizing only — correctness of the
        bound does NOT depend on it; any pi yields a valid bound). When
        None, a nearest-neighbor tour cost is used.
      iterations: ascent iterations.
      lam0: initial step-size multiplier (halved after ``patience``
        non-improving iterations, Held-Karp II schedule).

    Returns:
      The best (largest) certified lower bound found.
    """
    pts = np.asarray(points, np.float64)
    V = pts.shape[0]
    if V < 3:
        return 0.0
    D = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))

    if upper_bound is None:
        # nearest-neighbor tour for step sizing
        visited = np.zeros(V, bool)
        cur, cost = 0, 0.0
        visited[0] = True
        for _ in range(V - 1):
            d = np.where(visited, np.inf, D[cur])
            nxt = int(np.argmin(d))
            cost += d[nxt]
            visited[nxt] = True
            cur = nxt
        upper_bound = cost + D[cur, 0]

    if use_jax:
        # fast path: jitted lazy-reduced-cost Prim (no O(V^2) temporary).
        # fp32 ascent, then ONE fp64 numpy recompute at the best potentials
        # so the returned bound is certified at full precision.
        import jax.numpy as jnp

        fn = _one_tree_jax_fn(V)
        Dd = jnp.asarray(D, jnp.float32)

    pi = np.zeros(V, np.float64)
    best = -np.inf
    best_pi = pi.copy()
    lam = lam0
    stall = 0
    for _ in range(iterations):
        if use_jax:
            w, deg = fn(Dd, np.asarray(pi, np.float32))
            w = float(w)
            deg = np.asarray(deg, np.int64)
        else:
            Dr = D + pi[:, None] + pi[None, :]
            w, deg = _min_one_tree(Dr)
        lb = w - 2.0 * pi.sum()
        if lb > best + 1e-12:
            best = lb
            best_pi = pi.copy()
            stall = 0
        else:
            stall += 1
            if stall >= patience:
                lam *= 0.5
                stall = 0
                if lam < 1e-6:
                    break
        g = deg - 2
        gnorm = float((g * g).sum())
        if gnorm == 0:
            # the 1-tree is a tour: bound is tight, stop
            best = max(best, lb)
            break
        t = lam * max(upper_bound - lb, 1e-12) / gnorm
        pi = pi + t * g
    if use_jax:
        # certify: exact fp64 1-tree at the best potentials found
        Dr = D + best_pi[:, None] + best_pi[None, :]
        w, _ = _min_one_tree(Dr)
        best = w - 2.0 * best_pi.sum()
    return float(best)
