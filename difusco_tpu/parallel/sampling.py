"""Sharded parallel diffusion sampling — the framework's north-star runtime.

The reference replicates points/x_T k-fold on ONE device and forks CPU
processes for decoding (pl_tsp_model.py:178-192, tsp_utils.py:121-126).
Here the particle axis is sharded over the mesh: each chip denoises its
shard of chains AND decodes them on device; best-of-k is a cross-chip
argmin on the (k,) cost vector followed by a gather of the winning TOUR
(XLA lowers both to collectives over ICI). Per-chain PRNG comes from a
single key split over the full particle axis, so results are
layout-invariant: the same chains are produced regardless of how many
chips shard them.
"""

from __future__ import annotations

from typing import Callable, Tuple

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


def make_sharded_evaluator(
    task, mesh: Mesh, n_samples: int, axis: str = "sample"
) -> Callable:
    """Whole sample->decode->best-of pipeline in ONE sharded jit.

    Each chip denoises and decodes its shard of the particle axis; the
    cross-chip argmin + winning-tour gather compile to XLA collectives.
    Requires the on-device merge backend (cfg.merge_backend == "device").

    Returns eval_fn(params, points, key, neighbors=None) ->
      (best_tour (V+1,), best_cost scalar, costs (n_samples,), work dict) —
    all replicated on every chip.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def run(params, points, key, neighbors):
        heat = task._sample(params, points, key, n_samples, neighbors=neighbors)
        heat = jax.lax.with_sharding_constraint(heat, shard)
        tours, costs, work = task.decode(points, heat, neighbors=neighbors)
        best = jnp.argmin(costs)
        return tours[best], costs[best], costs, work

    jitted = jax.jit(
        run,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=repl,
    )

    def wrapper(params, points, key, neighbors=None):
        return jitted(params, points, key, neighbors)

    return wrapper


def best_of_sharded(
    costs: jnp.ndarray, tours: jnp.ndarray = None
) -> Tuple[jnp.ndarray, ...]:
    """Cross-chip best-of on a (possibly sharded) cost vector.

    With ``tours`` (k, V+1): returns (best_tour, best_cost) — the argmin
    index selects the winning tour; when costs/tours are sharded over chips
    XLA lowers the reduction + gather to collectives.
    Without ``tours``: returns the min cost (scalar).
    """
    if tours is None:
        return jnp.min(costs)
    best = jnp.argmin(costs)
    return tours[best], costs[best]
