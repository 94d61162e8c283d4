"""Node-axis sharding of ONE giant sparse graph over the device mesh.

The reference has no analog: its only scale-with-N mechanisms are kNN
sparsification, activation checkpointing, and batch_size=1
(tsp_graph_dataset.py:55-62, gnn_encoder.py:428-441) — one TSP-10000
instance must fit one GPU. Here the fixed-degree layout makes the node axis
shardable the TPU way: annotate shardings on a Mesh and let XLA insert the
collectives.

Why it works: the sparse GatedGCN's only cross-node dataflow is the
per-layer neighbor gather of the compact (V, H) node tensor — on a sharded
mesh XLA lowers it to an all-gather of h (a few MB) while the heavy
(V, K, H) edge stream (K× larger) stays fully sharded, as do all matmuls,
norms, and the posterior sampling math. Per-shard compute is V/n_devices
rows; per-layer communication is O(V·H), independent of K.

Sharded sampling is numerically identical to single-device sampling on the
same inputs (tested on the virtual 8-device CPU mesh).

Padding: V is padded up to a multiple of the mesh's node-axis size. Padded
nodes self-loop and are never referenced by real nodes' neighbor lists;
message passing and LayerNorms are node-local, but the output head's
GroupNorm(32) — faithful to the reference's GroupNorm32 over all spatial
positions (gnn_encoder.py:316-322, nn.py:93-100) — pools statistics over
every edge slot, so padding perturbs real rows by O(pad fraction) through
those statistics only. Benchmark sizes (TSP-500/1000/10000) divide typical
mesh sizes exactly, so no padding occurs there.

A 2-D ("sample", "node") mesh composes this with particle sharding: chains
split over one axis, each chain's graph split over the other.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_graph(
    points: np.ndarray, neighbors: np.ndarray, multiple: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Pad (V, 2) points / (V, K) neighbors so V is a mesh-divisible size.

    Padded nodes sit at the origin and neighbor only themselves; real
    neighbor lists are untouched, so padded rows never influence real ones.

    Returns (points_padded, neighbors_padded, V_original).
    """
    V, K = neighbors.shape
    Vp = -(-V // multiple) * multiple
    if Vp == V:
        return points, neighbors, V
    pts = np.zeros((Vp, points.shape[1]), points.dtype)
    pts[:V] = points
    nbrs = np.tile(np.arange(Vp, dtype=neighbors.dtype)[:, None], (1, K))
    nbrs[:V] = neighbors
    return pts, nbrs, V


def make_node_sharded_sampler(
    task,
    mesh: Mesh,
    n_samples: int,
    node_axis: str = "node",
    sample_axis: Optional[str] = None,
) -> Callable:
    """Wrap ``task.sample`` (sparse path) with the node axis sharded.

    Args:
      task: a TSPTask with ``cfg.sparse_factor > 0``.
      mesh: mesh containing ``node_axis`` (and ``sample_axis`` if given).
      n_samples: diffusion chains; sharded over ``sample_axis`` when set.

    Returns sample_fn(params, points, key, neighbors) -> (S, V, K) heatmaps
    with V (and optionally S) sharded. Inputs must already be padded to the
    node-axis size (use :func:`pad_graph`).
    """
    repl = NamedSharding(mesh, P())
    node2d = NamedSharding(mesh, P(node_axis, None))
    out = NamedSharding(mesh, P(sample_axis, node_axis, None))

    def sample(params, points, key, neighbors):
        return task._sample(params, points, key, n_samples, neighbors=neighbors)

    jitted = jax.jit(
        sample,
        in_shardings=(repl, node2d, repl, node2d),
        out_shardings=out,
    )

    def wrapper(params, points, key, neighbors):
        V = points.shape[0]
        n_shards = mesh.shape[node_axis]
        if V % n_shards:
            raise ValueError(
                f"V={V} not divisible by node axis {n_shards}; pad_graph first"
            )
        return jitted(params, points, key, neighbors)

    return wrapper


def make_node_sharded_update(
    task, mesh: Mesh, optimizer, node_axis: str = "node"
):
    """Data-parallel-free training step for ONE giant sparse graph: the
    batch's node axis is sharded over the mesh, params/optimizer replicated.

    The loss is a mean over edge slots and every model op is either
    node-local or the (V, H) gather, so XLA lowers the sharded
    loss/grad to per-shard compute + an all-gather of h per layer + a psum
    of the scalar loss and the (replicated) parameter grads.

    Returns update(params, opt_state, batch, key) -> (params, opt_state,
    loss); batch arrays are (B, V, ...) with V divisible by the node axis.
    """
    import optax

    repl = NamedSharding(mesh, P())
    node = {
        "points": NamedSharding(mesh, P(None, node_axis, None)),
        "neighbors": NamedSharding(mesh, P(None, node_axis, None)),
        "edge_labels": NamedSharding(mesh, P(None, node_axis, None)),
    }

    def update(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(task.loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        update,
        in_shardings=(repl, repl, node, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def sample_giant_graph(
    task, mesh: Mesh, params, points, key, n_samples: int = 1,
    node_axis: str = "node", sample_axis: Optional[str] = None,
):
    """One-call convenience: kNN build + pad + node-sharded sampling.

    Returns (heatmaps (S, V, K), neighbors (V, K)) trimmed to the original V.
    """
    from difusco_tpu.ops.knn import knn_graph

    k = task.cfg.sparse_factor
    nbrs = np.asarray(knn_graph(jnp.asarray(points, jnp.float32), k))
    pts_p, nbrs_p, V = pad_graph(np.asarray(points, np.float32), nbrs, mesh.shape[node_axis])
    sampler = make_node_sharded_sampler(
        task, mesh, n_samples, node_axis=node_axis, sample_axis=sample_axis
    )
    heat = sampler(params, jnp.asarray(pts_p), key, jnp.asarray(nbrs_p))
    return heat[:, :V], nbrs
