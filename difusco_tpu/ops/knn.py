"""kNN graph construction for sparse TSP.

Capability parity with the reference's sklearn KDTree query
(difusco/co_datasets/tsp_graph_dataset.py:55-62): each node's k nearest
neighbors *including itself* (the KDTree query returns the query point at
distance 0 first), in ascending distance order.

TPU-native redesign: exact top-k over the pairwise distance matrix with
``lax.top_k``, row-chunked so TSP-10000 never materializes the full
(V, V) matrix at once. Returns the fixed-degree (V, K) neighbor layout the
sparse GNN consumes directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "row_chunk"))
def knn_graph(points: jnp.ndarray, k: int, row_chunk: int = 2048) -> jnp.ndarray:
    """Fixed-degree kNN neighbor table.

    Args:
      points: (V, 2) coordinates.
      k: neighbors per node (the reference's ``sparse_factor``).
      row_chunk: rows of the distance matrix computed per step.

    Returns:
      neighbors: (V, K) int32, ascending distance, self first.
    """
    V = points.shape[0]
    pts = points.astype(jnp.float32)
    n_chunks = -(-V // row_chunk)
    pad = n_chunks * row_chunk - V
    # pad rows far away so padded queries don't matter (they are sliced off)
    pts_pad = jnp.concatenate(
        [pts, jnp.full((pad, 2), 1e6, jnp.float32)], axis=0
    )

    def chunk(carry, rows):
        d = rows[:, None, :] - pts[None, :, :]
        dist2 = jnp.sum(d * d, axis=-1)  # (chunk, V)
        _, idx = jax.lax.top_k(-dist2, k)
        return carry, idx.astype(jnp.int32)

    _, idx = jax.lax.scan(
        chunk, None, pts_pad.reshape(n_chunks, row_chunk, 2)
    )
    return idx.reshape(n_chunks * row_chunk, k)[:V]


def knn_graph_numpy(points: np.ndarray, k: int, row_chunk: int = 1024) -> np.ndarray:
    """Host oracle via brute force (ties broken by index, like argsort).

    Row-chunked with argpartition so TSP-10000 needs O(chunk * V) memory
    instead of the O(V^2 * 2) pairwise-difference tensor."""
    pts = np.asarray(points, np.float64)
    V = pts.shape[0]
    out = np.empty((V, k), np.int32)
    sq = np.sum(pts * pts, axis=1)
    for s in range(0, V, row_chunk):
        e = min(s + row_chunk, V)
        # squared distances are monotone in distance; exact, no sqrt needed
        d = sq[s:e, None] + sq[None, :] - 2.0 * (pts[s:e] @ pts.T)
        cand = np.argpartition(d, kth=k - 1, axis=1)[:, :k]
        cd = np.take_along_axis(d, cand, axis=1)
        # ascending distance, ties broken by original index (argsort parity)
        order = np.lexsort((cand, cd), axis=1)
        out[s:e] = np.take_along_axis(cand, order, axis=1)
    return out
