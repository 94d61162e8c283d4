"""Node-axis sharding of one giant sparse graph: parity with unsharded."""

import jax
import jax.numpy as jnp
import numpy as np

from difusco_tpu.config import Config
from difusco_tpu.ops.knn import knn_graph
from difusco_tpu.parallel.graph_shard import (
    make_node_sharded_sampler,
    pad_graph,
    sample_giant_graph,
)
from difusco_tpu.parallel.mesh import make_mesh
from difusco_tpu.tasks.tsp import TSPTask


def _cfg(**kw):
    d = dict(
        task="tsp",
        diffusion_type="categorical",
        diffusion_steps=50,
        inference_diffusion_steps=4,
        n_layers=2,
        hidden_dim=64,
        sparse_factor=8,
    )
    d.update(kw)
    return Config(**d)


def _setup(V=100, K=8, seed=0):
    cfg = _cfg(sparse_factor=K)
    task = TSPTask(cfg)
    rng = np.random.default_rng(seed)
    pts = rng.random((V, 2)).astype(np.float32)
    nbrs = np.asarray(knn_graph(jnp.asarray(pts), K))
    batch = {
        "points": pts[None],
        "edge_labels": np.zeros((1, V, K), np.float32),
        "neighbors": nbrs[None],
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)
    return task, params, pts, nbrs


class TestPadGraph:
    def test_pad_shapes_and_self_loops(self):
        rng = np.random.default_rng(0)
        pts = rng.random((10, 2)).astype(np.float32)
        nbrs = np.asarray(knn_graph(jnp.asarray(pts), 4))
        pp, nn, V = pad_graph(pts, nbrs, 8)
        assert V == 10 and pp.shape == (16, 2) and nn.shape == (16, 4)
        assert (nn[10:] == np.arange(10, 16)[:, None]).all()
        assert (nn[:10] == nbrs).all()

    def test_no_pad_needed(self):
        rng = np.random.default_rng(0)
        pts = rng.random((16, 2)).astype(np.float32)
        nbrs = np.asarray(knn_graph(jnp.asarray(pts), 4))
        pp, nn, V = pad_graph(pts, nbrs, 8)
        assert pp is pts and nn is nbrs and V == 16


class TestNodeSharding:
    def test_matches_unsharded(self):
        """Node-sharded sampling == single-device result on the same padded
        inputs (the draw of x_T is shape-dependent, so parity is defined on
        identical padded shapes)."""
        task, params, pts, nbrs = _setup(V=100, K=8)
        key = jax.random.PRNGKey(7)
        pp, nn, V = pad_graph(pts, nbrs, 8)
        ref = task.sample(params, jnp.asarray(pp), key, 2, neighbors=jnp.asarray(nn))

        mesh = make_mesh((8,), ("node",))
        sampler = make_node_sharded_sampler(task, mesh, 2)
        heat = sampler(params, jnp.asarray(pp), key, jnp.asarray(nn))
        assert heat.shape == (2, 104, 8)
        np.testing.assert_allclose(np.asarray(heat), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_padding_coupling_is_groupnorm_only(self):
        """With x_T fixed, the padded graph's pre-head features for real rows
        equal the unpadded ones; only the output head's GroupNorm (which,
        like the reference's GroupNorm32, pools over every edge slot) sees
        the pad rows. Verified via small relative output deviation."""
        task, params, pts, nbrs = _setup(V=100, K=8)
        pp, nn, V = pad_graph(pts, nbrs, 8)
        rng = np.random.default_rng(5)
        xt = rng.standard_normal((1, 104, 8)).astype(np.float32)
        t = jnp.full((1,), 10.0)
        full = task.model.apply(
            params, t, jnp.asarray(xt), points=jnp.asarray(pp[None]),
            neighbors=jnp.asarray(nn[None]),
        )
        trim = task.model.apply(
            params, t, jnp.asarray(xt[:, :V]), points=jnp.asarray(pts[None]),
            neighbors=jnp.asarray(nbrs[None]),
        )
        dev = np.abs(np.asarray(full[:, :V]) - np.asarray(trim))
        scale = np.abs(np.asarray(trim)).mean() + 1e-8
        assert dev.mean() / scale < 0.2, dev.mean() / scale

    def test_2d_mesh_sample_and_node(self):
        task, params, pts, nbrs = _setup(V=64, K=8)
        key = jax.random.PRNGKey(3)
        ref = task.sample(params, jnp.asarray(pts), key, 4, neighbors=jnp.asarray(nbrs))

        mesh = make_mesh((4, 2), ("sample", "node"))
        sampler = make_node_sharded_sampler(
            task, mesh, 4, node_axis="node", sample_axis="sample"
        )
        heat = sampler(params, jnp.asarray(pts), key, jnp.asarray(nbrs))
        np.testing.assert_allclose(np.asarray(heat), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_indivisible_raises(self):
        task, params, pts, nbrs = _setup(V=100, K=8)
        mesh = make_mesh((8,), ("node",))
        sampler = make_node_sharded_sampler(task, mesh, 1)
        try:
            sampler(params, jnp.asarray(pts), jax.random.PRNGKey(0), jnp.asarray(nbrs))
            assert False, "expected ValueError"
        except ValueError:
            pass

    def test_node_sharded_training_matches_unsharded(self):
        """One update step on a giant graph with the node axis sharded must
        produce the same loss and parameters as the single-device step."""
        import optax

        from difusco_tpu.parallel.graph_shard import make_node_sharded_update

        task, params, pts, nbrs = _setup(V=64, K=8, seed=2)
        rng = np.random.default_rng(3)
        labels = (rng.random((1, 64, 8)) < 0.1).astype(np.float32)
        batch = {
            "points": jnp.asarray(pts[None]),
            "neighbors": jnp.asarray(nbrs[None]),
            "edge_labels": jnp.asarray(labels),
        }
        key = jax.random.PRNGKey(11)

        opt = optax.adamw(1e-3)

        def ref_update(p, o, b, k):
            loss, g = jax.value_and_grad(task.loss_fn)(p, b, k)
            u, o = opt.update(g, o, p)
            return optax.apply_updates(p, u), o, loss

        p_ref, _, loss_ref = jax.jit(ref_update)(
            params, opt.init(params), batch, key
        )

        mesh = make_mesh((8,), ("node",))
        upd = make_node_sharded_update(task, mesh, opt)
        p_sh, _, loss_sh = upd(params, opt.init(params), batch, key)

        np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
        flat_ref = jax.tree.leaves(p_ref)
        flat_sh = jax.tree.leaves(p_sh)
        for a, b in zip(flat_ref, flat_sh):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_sample_giant_graph_end_to_end(self):
        """Convenience wrapper: kNN + pad + shard + trim, then decode."""
        task, params, pts, _ = _setup(V=100, K=8)
        mesh = make_mesh((8,), ("node",))
        heat, nbrs = sample_giant_graph(
            task, mesh, params, pts, jax.random.PRNGKey(1), n_samples=2
        )
        assert heat.shape == (2, 100, 8) and nbrs.shape == (100, 8)
        tours, costs, _ = task.decode(
            jnp.asarray(pts), heat, neighbors=jnp.asarray(nbrs)
        )
        assert tours.shape == (2, 101)
        assert bool(jnp.isfinite(costs).all()) and float(jnp.min(costs)) > 0
