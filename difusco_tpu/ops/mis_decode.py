"""Greedy maximal-independent-set decoding from node probability heatmaps.

Capability parity with reference ``mis_decode_np``
(difusco/utils/mis_utils.py:3-18): visit nodes in decreasing predicted
probability; add a node unless already excluded, then exclude its neighbors.
Feasible-by-construction.

TPU-native redesign: the CSR row lookup per step becomes a padded
fixed-degree gather — ``neighbors`` (V, K) with a validity ``mask`` — and the
whole greedy pass is one ``lax.scan`` over the ranked nodes, vmappable over
the sample axis so best-of-k decoding runs on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse


def mis_decode_numpy(pred: np.ndarray, adj: "scipy.sparse.spmatrix") -> np.ndarray:
    """Host oracle, same contract as the reference decoder."""
    sol = np.zeros_like(pred, dtype=np.int64)
    csr = adj.tocsr()
    for node in np.argsort(-pred):
        if sol[node] == -1:
            continue
        sol[csr[node].nonzero()[1]] = -1
        sol[node] = 1
    return (sol == 1).astype(np.int64)


def mis_decode_device(
    pred: jnp.ndarray, neighbors: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """On-device greedy MIS decode.

    Args:
      pred: (V,) predicted probabilities.
      neighbors: (V, K) padded neighbor indices.
      mask: (V, K) 1.0 for real neighbors, 0.0 for padding.

    Returns (V,) 0/1 independent-set indicator.
    """
    V = pred.shape[0]
    order = jnp.argsort(-pred).astype(jnp.int32)

    def step(state, node):
        selected, excluded = state
        take = jnp.logical_not(excluded[node])
        nbrs = neighbors[node]
        nmask = (mask[node] > 0) & take
        # exclude neighbors first, then select the node — the self-loop the
        # MIS datasets add (mis_dataset.py:45-47) must not veto the node itself
        excluded = excluded.at[nbrs].max(nmask)
        selected = selected.at[node].max(take)
        return (selected, excluded), None

    (selected, _), _ = jax.lax.scan(
        step,
        (jnp.zeros((V,), bool), jnp.zeros((V,), bool)),
        order,
    )
    return selected.astype(jnp.int32)


def mis_decode_batch(
    preds: jnp.ndarray, neighbors: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """vmap over the sample axis: preds (S, V) -> (S, V) indicators."""
    return jax.vmap(lambda p: mis_decode_device(p, neighbors, mask))(preds)
