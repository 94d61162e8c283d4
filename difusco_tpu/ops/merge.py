"""Greedy tour construction (edge-insertion merge) from diffusion heatmaps.

Capability parity with the reference decoders:
- ``numpy_merge`` (difusco/utils/tsp_utils.py:52-78) and the Cython
  ``merge_cython`` (difusco/utils/cython_merge/cython_merge.pyx:19-120):
  sort all candidate edges by -heat/dist; insert an edge iff both endpoints
  have degree < 2 and it does not close a short cycle; stop after V-1
  insertions; close the final Hamiltonian cycle.
- the tour walk of ``merge_tours`` (tsp_utils.py:134-142).

TPU-native redesign (the reference's serial CPU bottleneck): the union-find
of the Cython version is replaced by O(1) *endpoint linking* — for every path
fragment only its two endpoints carry ``other_end`` pointers, so an edge
insertion updates two scalars and needs no find/path-compression. That makes
the merge a ``lax.while_loop`` with constant-size state, vmappable over the
parallel-sampling axis so k chains decode concurrently on device (the
reference forks a multiprocessing.Pool of CPU workers, tsp_utils.py:121-126).

Sparse graphs supply only the kNN candidate edges; fragments that remain when
candidates run out are linked endpoint-to-endpoint in index order, matching
the reference's behavior on zero-score edges (its argsort places them last in
flat index order) — 2-opt then cleans up either way.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# NumPy oracle (kept simple and readable; used for differential tests and as
# a host fallback — plays the role of the reference's numpy_merge)
# ---------------------------------------------------------------------------


def merge_heatmap_numpy(points: np.ndarray, heat: np.ndarray) -> Tuple[np.ndarray, int]:
    """Greedy edge-insertion merge on the host.

    Args:
      points: (V, 2); heat: (V, V) symmetrized heatmap (A + A^T).
    Returns:
      (adj, iterations): dense 0/1 tour adjacency (symmetric) and the number
      of sorted edges examined (the reference's ``merge_iterations``).
    """
    V = points.shape[0]
    dists = np.linalg.norm(points[:, None] - points[None], axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = -heat / dists
    ratio[np.arange(V), np.arange(V)] = np.inf  # self-edges last / never
    order = np.argsort(ratio.flatten())

    deg = np.zeros(V, np.int32)
    other_end = np.arange(V, dtype=np.int32)
    adj = np.zeros((V, V), np.int32)
    added = 0
    iterations = 0
    for e in order:
        if added == V - 1:
            break
        iterations += 1
        a, b = e // V, e % V
        if a == b or deg[a] >= 2 or deg[b] >= 2 or other_end[a] == b:
            continue
        ea, eb = other_end[a], other_end[b]
        other_end[ea], other_end[eb] = eb, ea
        deg[a] += 1
        deg[b] += 1
        adj[a, b] = adj[b, a] = 1
        added += 1
    # close the cycle between the two remaining endpoints
    ends = np.where(deg < 2)[0]
    if len(ends) == 2:
        adj[ends[0], ends[1]] = adj[ends[1], ends[0]] = 1
    return adj, iterations


# ---------------------------------------------------------------------------
# On-device merge
# ---------------------------------------------------------------------------


def _link_step(state, a, b):
    """Insert edge (a, b) if valid; returns updated state. State:
    deg (V,), other_end (V,), nbr (V, 2), added (scalar)."""
    deg, other_end, nbr, added = state
    ok = (
        (a != b)
        & (deg[a] < 2)
        & (deg[b] < 2)
        & (other_end[a] != b)
        & (added < deg.shape[0] - 1)
    )

    ea = other_end[a]
    eb = other_end[b]
    new_other = other_end.at[ea].set(eb).at[eb].set(ea)
    new_nbr = nbr.at[a, deg[a]].set(b).at[b, deg[b]].set(a)
    new_deg = deg.at[a].add(1).at[b].add(1)

    deg = jnp.where(ok, new_deg, deg)
    other_end = jnp.where(ok, new_other, other_end)
    nbr = jnp.where(ok, new_nbr, nbr)
    added = added + ok.astype(jnp.int32)
    return (deg, other_end, nbr, added), ok


def _merge_edge_list(edges_a, edges_b, V):
    """Run the insertion loop over a sorted candidate edge list, then link
    remaining fragments in index order and close the cycle.

    Returns (nbr (V,2) adjacency-slot table, iterations)."""
    E = edges_a.shape[0]
    deg = jnp.zeros((V,), jnp.int32)
    other_end = jnp.arange(V, dtype=jnp.int32)
    nbr = jnp.full((V, 2), -1, jnp.int32)
    added = jnp.int32(0)

    def cond(s):
        (deg, other_end, nbr, added), idx = s
        return (added < V - 1) & (idx < E)

    def body(s):
        state, idx = s
        state, _ = _link_step(state, edges_a[idx], edges_b[idx])
        return state, idx + 1

    (deg, other_end, nbr, added), iters = jax.lax.while_loop(
        cond, body, ((deg, other_end, nbr, added), jnp.int32(0))
    )

    # completion sweep: connect lowest-index endpoints until a single path
    # remains (only triggers for sparse candidate lists that ran dry)
    iota = jnp.arange(V, dtype=jnp.int32)
    big = jnp.int32(V + 1)

    def cc(s):
        deg, other_end, nbr, added = s
        return added < V - 1

    def cb(s):
        deg, other_end, nbr, added = s
        a = jnp.argmin(jnp.where(deg < 2, iota, big)).astype(jnp.int32)
        valid = (deg < 2) & (iota != a) & (iota != other_end[a])
        b = jnp.argmin(jnp.where(valid, iota, big)).astype(jnp.int32)
        state, _ = _link_step((deg, other_end, nbr, added), a, b)
        return state

    deg, other_end, nbr, added = jax.lax.while_loop(
        cc, cb, (deg, other_end, nbr, added)
    )

    # close the final cycle: the two deg<2 endpoints
    a = jnp.argmin(jnp.where(deg < 2, iota, big)).astype(jnp.int32)
    bmask = (deg < 2) & (iota != a)
    b = jnp.argmin(jnp.where(bmask, iota, big)).astype(jnp.int32)
    nbr = nbr.at[a, deg[a]].set(b).at[b, deg[b]].set(a)
    return nbr, iters


@functools.partial(jax.jit, static_argnames=())
def _merge_dense_device(points: jnp.ndarray, heat: jnp.ndarray):
    V = points.shape[0]
    d = points[:, None, :] - points[None, :, :]
    dists = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ratio = -heat / jnp.where(dists > 0, dists, 1.0)
    ratio = jnp.where(jnp.eye(V, dtype=bool), jnp.inf, ratio)
    order = jnp.argsort(ratio.reshape(-1)).astype(jnp.int32)
    return _merge_edge_list(order // V, order % V, V)


def _merge_sparse_device(points, heat_edges, src, dst):
    """Sparse variant: candidate edges (src, dst) with heat values."""
    V = points.shape[0]
    pe = jnp.take(points, src, axis=0) - jnp.take(points, dst, axis=0)
    dists = jnp.sqrt(jnp.sum(pe * pe, axis=-1))
    ratio = -heat_edges / jnp.where(dists > 0, dists, 1.0)
    ratio = jnp.where(src == dst, jnp.inf, ratio)
    order = jnp.argsort(ratio).astype(jnp.int32)
    return _merge_edge_list(jnp.take(src, order), jnp.take(dst, order), V)


def symmetrize_fixed_degree(heat: jnp.ndarray, neighbors: jnp.ndarray) -> jnp.ndarray:
    """Symmetrize per-edge heats in the fixed-degree layout.

    For edge (i, j=neighbors[i,k]) returns heat[i,k] + heat[j, m] where
    neighbors[j,m] == i (0 if the reverse edge is absent) — the fixed-degree
    equivalent of the reference's COO A + A^T densification
    (tsp_utils.py:109-115), computed with gathers only.

    heat/neighbors: (V, K).
    """
    V, K = heat.shape
    nbr_of_nbr = jnp.take(neighbors, neighbors, axis=0)  # (V, K, K)
    heat_of_nbr = jnp.take(heat, neighbors, axis=0)  # (V, K, K)
    i_idx = jnp.arange(V, dtype=neighbors.dtype)[:, None, None]
    rev = jnp.sum(jnp.where(nbr_of_nbr == i_idx, heat_of_nbr, 0.0), axis=-1)
    return heat + rev


@jax.jit
def symmetrize_fixed_degree_batch(heat: jnp.ndarray, neighbors: jnp.ndarray) -> jnp.ndarray:
    """Batched symmetrization: heat (S, V, K), shared neighbors (V, K)."""
    return jax.vmap(lambda h: symmetrize_fixed_degree(h, neighbors))(heat)


def tour_from_adjacency(nbr: jnp.ndarray) -> jnp.ndarray:
    """Walk the 2-regular adjacency-slot table into a closed tour (V+1,).

    Mirrors the reference walk (tsp_utils.py:134-142): start at node 0,
    always step to the largest-index neighbor that is not the previous node.
    """
    V = nbr.shape[0]

    def step(carry, _):
        cur, prev = carry
        n0 = nbr[cur, 0]
        n1 = nbr[cur, 1]
        cand_max = jnp.maximum(n0, n1)
        cand_min = jnp.minimum(n0, n1)
        nxt = jnp.where(cand_max == prev, cand_min, cand_max)
        # degenerate single-slot nodes (n == -1) never occur post-close
        return (nxt, cur), nxt

    (_, _), seq = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(-1)), None, length=V
    )
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), seq])


@jax.jit
def merge_heatmap_device(
    points: jnp.ndarray,
    heat: jnp.ndarray,
    edge_index: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode heatmap(s) to closed tours, fully on device.

    Args:
      points: (V, 2).
      heat: dense (S, V, V) *unsymmetrized* heatmaps (the function applies
        A + A^T like tsp_utils.py:105-107), or sparse (S, E) edge heats.
      edge_index: (2, E) for the sparse form (single-instance indices).

    Returns:
      (tours (S, V+1), iterations (S,)).
    """
    if heat.ndim == 2 and edge_index is None:
        heat = heat[None]

    if edge_index is None:
        sym = heat + jnp.swapaxes(heat, -1, -2)
        nbrs, iters = jax.vmap(lambda h: _merge_dense_device(points, h))(sym)
    else:
        src, dst = edge_index[0], edge_index[1]
        # symmetrize by listing each edge in both directions with the same heat
        src2 = jnp.concatenate([src, dst])
        dst2 = jnp.concatenate([dst, src])
        heat2 = jnp.concatenate([heat, heat], axis=-1)
        if heat2.ndim == 1:
            heat2 = heat2[None]
        nbrs, iters = jax.vmap(
            lambda h: _merge_sparse_device(points, h, src2, dst2)
        )(heat2)

    tours = jax.vmap(tour_from_adjacency)(nbrs)
    return tours, iters
