"""Device mesh and sharding helpers.

The reference's only multi-device strategy is DDP data-parallel training
(train.py:113) plus single-device batch replication for parallel sampling
(pl_tsp_model.py:178-192). Here both are mesh axes:

- ``data``: training batch axis; XLA inserts the gradient psum over ICI.
- ``sample``: diffusion particle axis for inference; embarrassingly parallel,
  best-of-k via a tiny allgather/argmin at the end.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts (DCN across slices is handled by XLA's collective
lowering; no code changes).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX (the analog of PL's automatic DDP process
    launch, reference train.py:113). Call once per process BEFORE any other
    JAX API; afterwards ``jax.devices()`` spans every host and the same
    mesh/pjit code runs unchanged, with XLA routing collectives over
    ICI within a slice and DCN across slices.

    On TPU pods all three args are auto-detected from the environment;
    on CPU/GPU fleets pass them explicitly. Returns this process's index.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over (a prefix of) the visible devices.

    Args:
      shape: per-axis sizes; None = all devices on the first axis.
      axis_names: e.g. ("data",) or ("data", "sample").
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, axis: str) -> NamedSharding:
    """Shard the leading array dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a dict of host arrays with the leading dim sharded over ``axis``."""
    s = sharded(mesh, axis)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def put_global(tree, mesh: Mesh, spec: P, local_batches: bool = False):
    """Place a host-local pytree as GLOBAL jax.Arrays on ``mesh``.

    Single-process: plain ``device_put``. Multi-process (a mesh spanning
    several ``jax.distributed`` processes), two data contracts:

    - ``local_batches=False``: every process holds the SAME full-value tree
      (identically-seeded data iterators) and each builds its address-local
      shards via ``jax.make_array_from_process_local_data`` with
      ``global_shape == local_shape`` (the documented same-data-everywhere
      mode).
    - ``local_batches=True``: every process holds ONLY ITS OWN rows of the
      leading (sharded) axis; the global array is the concatenation over
      process ranks. This is the true multihost input-pipeline mode — each
      host reads a distinct data shard.

    Either way this is the TPU-native analog of DDP's per-rank batch split
    (reference train.py:113): one logical batch, XLA sees a single sharded
    array and inserts the gradient psum.
    """
    ns = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(tree, ns)

    def put(x):
        x = np.asarray(x)
        gshape = x.shape
        if local_batches:
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(ns, x, gshape)

    return jax.tree.map(put, tree)
