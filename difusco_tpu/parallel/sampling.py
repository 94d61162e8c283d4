"""Sharded parallel diffusion sampling — the framework's north-star runtime.

The reference replicates points/x_T k-fold on ONE device and forks CPU
processes for decoding (pl_tsp_model.py:178-192, tsp_utils.py:121-126).
Here the particle axis is sharded over the mesh: each chip denoises its
shard of chains AND decodes them on device; best-of-k is a cross-chip
argmin on the (k,) cost vector. Per-chain PRNG comes from a single key
split over the full particle axis, so results are layout-invariant:
the same chains are produced regardless of how many chips shard them.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sharded_sampler(
    task, mesh: Mesh, n_samples: int, axis: str = "sample"
) -> Callable:
    """Wrap ``task.sample`` so the particle axis is sharded over ``mesh``.

    Returns sample_fn(params, points, key, neighbors=None) -> heatmaps with
    leading dim ``n_samples`` sharded over ``axis``.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def sample(params, points, key, neighbors):
        return task._sample(params, points, key, n_samples, neighbors=neighbors)

    jitted = jax.jit(
        sample,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=shard,
    )

    def wrapper(params, points, key, neighbors=None):
        return jitted(params, points, key, neighbors)

    return wrapper


def best_of_sharded(costs: jnp.ndarray) -> jnp.ndarray:
    """argmin over the (possibly sharded) cost vector; XLA lowers the
    reduction to a cross-chip collective when costs live on several chips."""
    return jnp.min(costs)
