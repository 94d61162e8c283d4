"""Tests for the on-device MIS local search (ops/mis_local_search.py)."""

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from difusco_tpu.data.mis import graph_to_fixed_degree
from difusco_tpu.ops.mis_decode import mis_decode_device
from difusco_tpu.ops.mis_local_search import (
    mis_local_search_device,
    mis_local_search_numpy,
)


def _graph(V=60, p=0.15, seed=0, pad_to=None):
    g = nx.erdos_renyi_graph(V, p, seed=seed)
    edges = np.array(
        [(a, b) for a, b in g.edges] + [(b, a) for a, b in g.edges]
    ).T
    deg = np.bincount(edges[0], minlength=V)
    K = int(deg.max())
    nbrs, mask = graph_to_fixed_degree(edges, V, K)
    Vp = pad_to or V
    out_n = np.zeros((Vp, K), np.int32)
    out_m = np.zeros((Vp, K), np.float32)
    out_n[:V], out_m[:V] = nbrs, mask
    node_mask = np.zeros(Vp, np.float32)
    node_mask[:V] = 1.0
    return g, out_n, out_m, node_mask


def _is_independent(x, g):
    chosen = {i for i in range(len(x)) if x[i]}
    return not any(a in chosen and b in chosen for a, b in g.edges if a != b)


class TestMISLocalSearch:
    def test_feasible_and_never_worse(self):
        for seed in range(3):
            g, nbrs, mask, nm = _graph(seed=seed)
            rng = np.random.default_rng(seed)
            pred = rng.random(len(nm)).astype(np.float32)
            x0 = mis_decode_device(jnp.asarray(pred), jnp.asarray(nbrs),
                                   jnp.asarray(mask))
            x0 = np.asarray(x0) * (nm > 0)
            out = mis_local_search_device(
                jnp.asarray(x0), jnp.asarray(pred), jnp.asarray(nbrs),
                jnp.asarray(mask), jnp.asarray(nm),
                jax.random.PRNGKey(seed), rounds=64,
            )
            out = np.asarray(out)
            assert _is_independent(out, g)
            assert out.sum() >= x0.sum()
            assert not out[nm == 0].any(), "padding node selected"

    def test_improves_over_greedy_on_er(self):
        """Across several ER graphs the LS must strictly improve at least
        one random-priority greedy decode (greedy is not maximal-quality)."""
        gains = []
        for seed in range(4):
            g, nbrs, mask, nm = _graph(V=80, p=0.2, seed=10 + seed)
            pred = np.random.default_rng(seed).random(len(nm)).astype(np.float32)
            x0 = np.asarray(mis_decode_device(
                jnp.asarray(pred), jnp.asarray(nbrs), jnp.asarray(mask)))
            x0 = x0 * (nm > 0)
            out = np.asarray(mis_local_search_device(
                jnp.asarray(x0), jnp.asarray(pred), jnp.asarray(nbrs),
                jnp.asarray(mask), jnp.asarray(nm),
                jax.random.PRNGKey(seed), rounds=128,
            ))
            gains.append(int(out.sum()) - int(x0.sum()))
        assert max(gains) >= 1, f"no improvement anywhere: {gains}"

    def test_matches_numpy_oracle_quality(self):
        """Device and host searches are independent implementations of the
        same move set — their best set sizes must agree within 1 node."""
        g, nbrs, mask, nm = _graph(V=70, p=0.15, seed=42)
        pred = np.random.default_rng(7).random(len(nm)).astype(np.float32)
        x0 = np.asarray(mis_decode_device(
            jnp.asarray(pred), jnp.asarray(nbrs), jnp.asarray(mask)))
        x0 = x0 * (nm > 0)
        dev = np.asarray(mis_local_search_device(
            jnp.asarray(x0), jnp.asarray(pred), jnp.asarray(nbrs),
            jnp.asarray(mask), jnp.asarray(nm), jax.random.PRNGKey(0),
            rounds=128,
        ))
        host = mis_local_search_numpy(x0, pred, nbrs, mask, nm, rounds=128)
        assert _is_independent(dev, g) and _is_independent(host, g)
        assert abs(int(dev.sum()) - int(host.sum())) <= 1

    def test_self_loops_do_not_block(self):
        """MIS datasets add self-loops (reference mis_dataset.py:43-48); a
        node's self-edge must not veto its own selection (regression: Luby
        rounds previously added nothing on real dataset graphs)."""
        g, nbrs, mask, nm = _graph(V=40, p=0.15, seed=9)
        V = 40
        # append a self-loop column like the dataset layout does
        nbrs = np.concatenate([nbrs, np.arange(V, dtype=np.int32)[:, None]], 1)
        mask = np.concatenate([mask, np.ones((V, 1), np.float32)], 1)
        pred = np.random.default_rng(0).random(V).astype(np.float32)
        out = np.asarray(mis_local_search_device(
            jnp.zeros(V, jnp.int32), jnp.asarray(pred), jnp.asarray(nbrs),
            jnp.asarray(mask), jnp.asarray(nm), jax.random.PRNGKey(0),
            rounds=32,
        ))
        assert out.sum() >= 3, "self-loops blocked every addition"
        assert _is_independent(out, g)

    def test_padded_batch_vmap(self):
        """vmap over samples with padded node axis (the task layout)."""
        g, nbrs, mask, nm = _graph(V=50, p=0.2, seed=3, pad_to=64)
        S = 4
        preds = np.random.default_rng(0).random((S, 64)).astype(np.float32)
        x0 = np.stack([
            np.asarray(mis_decode_device(jnp.asarray(p), jnp.asarray(nbrs),
                                         jnp.asarray(mask))) * (nm > 0)
            for p in preds
        ])
        fn = jax.vmap(
            lambda x, p, k: mis_local_search_device(
                x, p, jnp.asarray(nbrs), jnp.asarray(mask), jnp.asarray(nm),
                k, rounds=32),
        )
        keys = jax.random.split(jax.random.PRNGKey(1), S)
        outs = np.asarray(fn(jnp.asarray(x0), jnp.asarray(preds), keys))
        for s in range(S):
            assert _is_independent(outs[s], g)
            assert outs[s].sum() >= x0[s].sum()
            assert not outs[s][nm == 0].any()
