"""Host-side (numpy) tour utilities shared by the offline scripts.

The on-device jax cost lives in ops/two_opt.tour_cost; these CPU scripts
(HK bounds, MCTS protocol, label refinement) need the same arithmetic
without a device round-trip, and previously each re-implemented it.
"""

from __future__ import annotations

import numpy as np


def tour_cost_np(points: np.ndarray, tour: np.ndarray) -> float:
    """Euclidean length of ``tour`` over ``points`` (V, 2).

    Accepts open tours (V entries — the closing edge is added) and closed
    tours (first == last — the appended duplicate edge has length 0), so
    both conventions yield the cycle length.
    """
    tour = np.asarray(tour)
    closed = np.concatenate([tour, tour[:1]])
    d = points[closed[1:]] - points[closed[:-1]]
    return float(np.sqrt((d * d).sum(-1)).sum())
