"""Tests for mesh sharding: dp training and sample-sharded inference on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from difusco_tpu.config import Config
from difusco_tpu.parallel.mesh import make_mesh, shard_batch, sharded
from difusco_tpu.parallel.sampling import make_sharded_sampler
from difusco_tpu.tasks.tsp import TSPTask
from difusco_tpu.train.trainer import Trainer


def _cfg(**kw):
    d = dict(
        task="tsp",
        diffusion_type="categorical",
        diffusion_steps=50,
        inference_diffusion_steps=4,
        n_layers=2,
        hidden_dim=64,
    )
    d.update(kw)
    return Config(**d)


def _toy_batch(rng, B, V):
    pts = rng.random((B, V, 2)).astype(np.float32)
    adj = np.zeros((B, V, V), np.float32)
    for b in range(B):
        perm = rng.permutation(V)
        adj[b, perm[:-1], perm[1:]] = 1
        adj[b, perm[-1], perm[0]] = 1
    return {"points": pts, "adj": adj}


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh((8,), ("data",))
        assert mesh.shape == {"data": 8}
        mesh2 = make_mesh((4, 2), ("data", "sample"))
        assert mesh2.shape == {"data": 4, "sample": 2}

    def test_shard_batch_places_arrays(self):
        mesh = make_mesh((8,), ("data",))
        rng = np.random.default_rng(0)
        batch = _toy_batch(rng, 8, 8)
        sb = shard_batch(batch, mesh)
        assert sb["points"].sharding == sharded(mesh, "data")


class TestDataParallelTraining:
    def test_dp_loss_matches_single_device(self):
        """The dp-sharded update must compute the same loss as 1-device."""
        rng = np.random.default_rng(1)
        batch = _toy_batch(rng, 8, 10)
        cfg = _cfg()

        task1 = TSPTask(cfg)
        t1 = Trainer(task1, cfg)
        _, h1 = t1.fit(iter([batch]), total_steps=1, log_every=1, seed=0)

        task8 = TSPTask(cfg)
        mesh = make_mesh((8,), ("data",))
        t8 = Trainer(task8, cfg, mesh=mesh)
        _, h8 = t8.fit(iter([batch]), total_steps=1, log_every=1, seed=0)

        assert abs(h1[-1]["train/loss"] - h8[-1]["train/loss"]) < 1e-4

    def test_dp_multi_step(self):
        rng = np.random.default_rng(2)
        cfg = _cfg()
        task = TSPTask(cfg)
        mesh = make_mesh((8,), ("data",))
        trainer = Trainer(task, cfg, mesh=mesh)
        batches = iter([_toy_batch(rng, 8, 10) for _ in range(5)])
        _, hist = trainer.fit(batches, total_steps=5, log_every=1, seed=0)
        assert len(hist) == 5
        assert all(np.isfinite(h["train/loss"]) for h in hist)


class TestShardedSampling:
    def test_sharded_sampler_matches_unsharded(self):
        """Sharding the particle axis must not change the sampled chains."""
        rng = np.random.default_rng(3)
        cfg = _cfg()
        task = TSPTask(cfg)
        batch = _toy_batch(rng, 2, 10)
        params = task.init_params(jax.random.PRNGKey(0), batch)
        pts = jnp.asarray(batch["points"][0])
        key = jax.random.PRNGKey(5)

        ref = task.sample(params, pts, key, 8)

        mesh = make_mesh((8,), ("sample",))
        sampler = make_sharded_sampler(task, mesh, 8)
        out = sampler(params, pts, key)
        assert out.shape == (8, 10, 10)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_sharded_decode_best_of(self):
        rng = np.random.default_rng(4)
        cfg = _cfg()
        task = TSPTask(cfg)
        batch = _toy_batch(rng, 2, 10)
        params = task.init_params(jax.random.PRNGKey(0), batch)
        pts = jnp.asarray(batch["points"][0])
        mesh = make_mesh((8,), ("sample",))
        sampler = make_sharded_sampler(task, mesh, 16)
        heat = sampler(params, pts, jax.random.PRNGKey(6))
        tours, costs, _ = task.decode(pts, heat)
        assert costs.shape == (16,)
        best = float(jnp.min(costs))
        assert np.isfinite(best) and best > 0

    def test_sharded_evaluator_returns_single_device_best_tour(self):
        """The one-jit sharded sample->decode->best-of pipeline must return
        exactly the tour the single-device path would pick."""
        from difusco_tpu.parallel.sampling import make_sharded_evaluator

        rng = np.random.default_rng(5)
        cfg = _cfg()
        task = TSPTask(cfg)
        batch = _toy_batch(rng, 2, 10)
        params = task.init_params(jax.random.PRNGKey(0), batch)
        pts = jnp.asarray(batch["points"][0])
        key = jax.random.PRNGKey(7)

        mesh = make_mesh((8,), ("sample",))
        evaluator = make_sharded_evaluator(task, mesh, 8)
        tour, cost, costs, work = evaluator(params, pts, key)

        heat_ref = task.sample(params, pts, key, 8)
        tours_ref, costs_ref, _ = task.decode(pts, heat_ref)
        i = int(jnp.argmin(costs_ref))
        np.testing.assert_allclose(
            np.asarray(costs), np.asarray(costs_ref), atol=1e-5
        )
        assert abs(float(cost) - float(costs_ref[i])) < 1e-5
        np.testing.assert_array_equal(np.asarray(tour), np.asarray(tours_ref[i]))

    def test_evaluate_instance_with_mesh_matches_unsharded(self):
        rng = np.random.default_rng(6)
        cfg = _cfg(parallel_sampling=8)
        task = TSPTask(cfg)
        batch = _toy_batch(rng, 2, 10)
        params = task.init_params(jax.random.PRNGKey(0), batch)
        pts = jnp.asarray(batch["points"][0])
        tour = jnp.asarray(
            np.concatenate([np.arange(10), [0]]).astype(np.int32)
        )
        key = jax.random.PRNGKey(8)
        m_ref = task.evaluate_instance(params, pts, tour, key)
        mesh = make_mesh((8,), ("sample",))
        m_sh = task.evaluate_instance(params, pts, tour, key, mesh=mesh)
        assert abs(m_ref["solved_cost"] - m_sh["solved_cost"]) < 1e-5
        assert task.last_best_tour.shape == (11,)

    def test_best_of_sharded_returns_tour(self):
        from difusco_tpu.parallel.sampling import best_of_sharded

        costs = jnp.asarray([3.0, 1.0, 2.0])
        tours = jnp.asarray([[0, 1, 2, 0], [2, 1, 0, 2], [1, 0, 2, 1]])
        t, c = best_of_sharded(costs, tours)
        assert float(c) == 1.0
        np.testing.assert_array_equal(np.asarray(t), [2, 1, 0, 2])
        assert float(best_of_sharded(costs)) == 1.0


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (2, 50, 50, 2)
        assert bool(jnp.isfinite(out).all())
