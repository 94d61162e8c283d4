"""Batched 2-opt tour refinement as a jitted on-device loop.

Capability parity with reference ``batched_two_opt_torch``
(difusco/utils/tsp_utils.py:12-49): per iteration compute the full (B, V, V)
pairwise move-delta matrix

    change[i, j] = d(t_i, t_j) + d(t_{i+1}, t_{j+1}) - d(t_i, t_{i+1}) - d(t_j, t_{j+1})

mask to the strict upper triangle (j >= i+2), take each sample's best move and
apply the segment reversal t[i+1..j] -> reversed. Loop until no sample has an
improving move (< -1e-6) or ``max_iterations``.

TPU-native redesign:
- the whole refinement is ONE ``lax.while_loop`` inside jit: no host round
  trips per iteration (the reference syncs ``min_change`` to the host and
  runs a python for-loop over the batch for the flips)
- the segment reversal with dynamic endpoints is index arithmetic:
  p -> i+1 + j - p inside the window, identity outside, then one gather —
  no dynamic-shape slicing
- flips are masked per sample: a sample only applies its own move when it is
  improving (the reference applies every sample's argmin whenever the global
  best is improving, temporarily worsening converged samples; masking is a
  strict quality improvement with identical termination)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 2) x (..., M, 2) -> (..., N, M) euclidean distances."""
    d = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


@functools.partial(jax.jit, static_argnames=("max_iterations", "parity"))
def batched_two_opt(
    points: jnp.ndarray, tours: jnp.ndarray, max_iterations: int = 1000,
    parity: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine closed tours with first-order 2-opt moves.

    Args:
      points: (V, 2) float coordinates shared by the batch, or (B, V, 2)
        per-instance coordinates.
      tours: (B, V+1) int32, closed (tours[:, 0] == tours[:, -1]).
      max_iterations: iteration cap (reference default 1000).
      parity: reproduce the reference's per-sample apply rule exactly for
        A/B decoding comparisons. The reference (tsp_utils.py:39-42) applies
        each sample's argmin over ``triu(change, 2)`` whenever the GLOBAL
        min is < -1e-6; since the triu mask contributes zero entries, a
        sample with no negative move argmins to index 0 -> the empty slice
        tour[1:1] -> a no-op. Net behavioral difference vs the default mode:
        in parity mode a sample applies moves in the (-1e-6, 0) band, the
        default masks them (strictly-better semantics, documented deviation).

    Returns:
      (tours, iterations): refined closed tours and the number of improvement
      iterations executed (the reference's ``2opt_iterations`` metric).
    """
    points = points.astype(jnp.float32)
    tours = tours.astype(jnp.int32)
    B, Vp1 = tours.shape
    V = Vp1 - 1
    pos = jnp.arange(Vp1, dtype=jnp.int32)
    per_instance = points.ndim == 3

    def gather_pts(idx):  # (B, V) -> (B, V, 2)
        if per_instance:
            return jnp.take_along_axis(
                points, jnp.broadcast_to(idx[:, :, None], idx.shape + (2,)), axis=1
            )
        return jnp.take(points, idx, axis=0)

    def body(state):
        tours, it, _ = state
        head = gather_pts(tours[:, :-1])  # (B, V, 2)
        nxt = gather_pts(tours[:, 1:])  # (B, V, 2)

        d_ij = _pairwise_dist(head, head)  # (B, V, V)
        d_i1j1 = _pairwise_dist(nxt, nxt)
        d_ii1 = jnp.linalg.norm(head - nxt, axis=-1)  # (B, V)

        change = d_ij + d_i1j1 - d_ii1[:, :, None] - d_ii1[:, None, :]
        change = jnp.triu(change, k=2)  # j >= i + 2

        flat = change.reshape(B, -1)
        best = jnp.min(flat, axis=-1)  # (B,)
        arg = jnp.argmin(flat, axis=-1)
        mi = (arg // V).astype(jnp.int32)  # (B,)
        mj = (arg % V).astype(jnp.int32)

        if parity:
            # reference gate (tsp_utils.py:39): flips apply only while the
            # GLOBAL best move clears -1e-6; it breaks before applying on
            # the terminal iteration
            improving = (best < 0.0) & (jnp.min(best) < -1e-6)  # (B,)
        else:
            improving = best < -1e-6  # (B,)
        # reversal permutation: positions in [mi+1, mj] map to mi+1+mj-p
        lo = (mi + 1)[:, None]
        hi = mj[:, None]
        in_win = (pos[None, :] >= lo) & (pos[None, :] <= hi) & improving[:, None]
        perm = jnp.where(in_win, lo + hi - pos[None, :], pos[None, :])
        tours = jnp.take_along_axis(tours, perm, axis=1)
        # count only iterations that applied a flip (reference counter semantics)
        return tours, it + jnp.any(improving).astype(jnp.int32), jnp.min(best)

    def cond(state):
        _, it, min_change = state
        return (min_change < -1e-6) & (it < max_iterations)

    tours, iters, _ = jax.lax.while_loop(
        cond, body, (tours, jnp.int32(0), jnp.float32(-1.0))
    )
    return tours, iters


def tour_cost(points: jnp.ndarray, tours: jnp.ndarray) -> jnp.ndarray:
    """Closed-tour lengths: points (V, 2), tours (..., V+1) -> (...)
    (reference TSPEvaluator, tsp_utils.py:148-156)."""
    p = jnp.take(points, tours, axis=0)
    return jnp.sum(jnp.linalg.norm(p[..., 1:, :] - p[..., :-1, :], axis=-1), axis=-1)
