"""End-to-end task tests: tiny datasets, short training, full decode."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difusco_tpu.config import Config
from difusco_tpu.data.generate_tsp import generate as gen_tsp
from difusco_tpu.data.tsp import TSPDataset, write_tsp_file
from difusco_tpu.tasks.tsp import TSPTask
from difusco_tpu.tasks.mis import MISTask
from difusco_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tsp20_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "tsp20.txt")
    instances = gen_tsp(num_samples=48, num_nodes=20, seed=0)
    write_tsp_file(path, instances)
    return path


def _small_cfg(**kw):
    defaults = dict(
        task="tsp",
        diffusion_type="categorical",
        diffusion_schedule="cosine",
        diffusion_steps=100,
        inference_diffusion_steps=10,
        inference_schedule="cosine",
        n_layers=2,
        hidden_dim=64,
        batch_size=8,
        learning_rate=2e-3,
        two_opt_iterations=200,
    )
    defaults.update(kw)
    return Config(**defaults)


class TestTSPData:
    def test_roundtrip(self, tsp20_file):
        ds = TSPDataset(tsp20_file)
        assert len(ds) == 48
        ex = ds.get(0)
        assert ex["points"].shape == (20, 2)
        assert ex["adj"].shape == (20, 20)
        assert ex["adj"].sum() == 20  # one successor per node (closed tour)
        assert ex["tour"].shape == (21,)
        assert ex["tour"][0] == ex["tour"][-1]

    def test_sparse_layout(self, tsp20_file):
        ds = TSPDataset(tsp20_file, sparse_factor=6)
        ex = ds.get(0)
        assert ex["neighbors"].shape == (20, 6)
        assert ex["edge_labels"].shape == (20, 6)
        # self is first neighbor everywhere (KDTree convention)
        np.testing.assert_array_equal(ex["neighbors"][:, 0], np.arange(20))
        # every node has exactly one successor; with k=6 most are in the kNN
        assert 0 < ex["edge_labels"].sum() <= 20

    def test_batches(self, tsp20_file):
        ds = TSPDataset(tsp20_file)
        batches = list(ds.batches(8, seed=1))
        assert len(batches) == 6
        assert batches[0]["points"].shape == (8, 20, 2)


class TestTSPTrainingEndToEnd:
    def test_categorical_dense_learns_and_decodes(self, tsp20_file):
        cfg = _small_cfg()
        task = TSPTask(cfg)
        ds = TSPDataset(tsp20_file)
        trainer = Trainer(task, cfg)
        params, history = trainer.fit(
            ds.batches(8, seed=0, epochs=None), total_steps=120, log_every=20
        )
        losses = [h["train/loss"] for h in history]
        assert losses[-1] < losses[0] * 0.7, f"no learning: {losses}"

        # inference on a held-out instance
        ex = ds.get(0)
        m = task.evaluate_instance(
            params,
            jnp.asarray(ex["points"]),
            jnp.asarray(ex["tour"]),
            jax.random.PRNGKey(0),
        )
        assert m["solved_cost"] > 0
        assert m["gt_cost"] > 0
        # merge + 2-opt on TSP-20 lands close to the 2-opt label even with a
        # weak model; sanity bound only
        assert m["gap"] < 0.25, m

    def test_gaussian_dense_step(self, tsp20_file):
        cfg = _small_cfg(diffusion_type="gaussian", inference_trick="ddim")
        task = TSPTask(cfg)
        ds = TSPDataset(tsp20_file)
        batch = next(ds.batches(4))
        params = task.init_params(jax.random.PRNGKey(0), batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "tour"}
        loss = task.loss_fn(params, jb, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        # eps-MSE at init should be near 1 (predicting ~0 for unit noise)
        assert 0.3 < float(loss) < 3.0

        ex = ds.get(0)
        m = task.evaluate_instance(
            params,
            jnp.asarray(ex["points"]),
            jnp.asarray(ex["tour"]),
            jax.random.PRNGKey(0),
        )
        assert np.isfinite(m["solved_cost"])

    def test_categorical_sparse_pipeline(self, tsp20_file):
        cfg = _small_cfg(sparse_factor=8)
        task = TSPTask(cfg)
        ds = TSPDataset(tsp20_file, sparse_factor=8)
        batch = next(ds.batches(4))
        params = task.init_params(jax.random.PRNGKey(0), batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "tour"}
        loss = task.loss_fn(params, jb, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))

        ex = ds.get(0)
        m = task.evaluate_instance(
            params,
            jnp.asarray(ex["points"]),
            jnp.asarray(ex["tour"]),
            jax.random.PRNGKey(0),
            neighbors=jnp.asarray(ex["neighbors"]),
        )
        assert np.isfinite(m["solved_cost"])
        assert m["gap"] < 0.5

    def test_parallel_sampling_best_of_k(self, tsp20_file):
        cfg = _small_cfg(parallel_sampling=4, sequential_sampling=2)
        task = TSPTask(cfg)
        ds = TSPDataset(tsp20_file)
        batch = next(ds.batches(4))
        params = task.init_params(jax.random.PRNGKey(0), batch)
        ex = ds.get(1)
        m = task.evaluate_instance(
            params,
            jnp.asarray(ex["points"]),
            jnp.asarray(ex["tour"]),
            jax.random.PRNGKey(0),
        )
        assert np.isfinite(m["solved_cost"])


class TestMISEndToEnd:
    @pytest.fixture(scope="class")
    def mis_dir(self, tmp_path_factory):
        from difusco_tpu.data.generate_mis import main as gen_main

        d = str(tmp_path_factory.mktemp("mis"))
        gen_main([
            "gendata", "--model", "er", "--num_graphs", "12", "--min_n", "30",
            "--max_n", "40", "--er_p", "0.2", "--output_dir", d, "--label",
        ])
        return d

    def test_dataset(self, mis_dir):
        from difusco_tpu.data.mis import MISDataset

        ds = MISDataset(os.path.join(mis_dir, "*.gpickle"))
        assert len(ds) == 12
        ex = ds.get(0)
        V, K = ex["neighbors"].shape
        assert V == ds.max_nodes and K == ds.max_degree
        # labels are a valid independent set on real nodes (self-loops aside)
        n = int(ex["num_nodes"])
        sel = np.nonzero(ex["labels"][:n])[0]
        for i in sel:
            real = ex["neighbors"][i][ex["mask"][i] > 0]
            for j in real:
                if j != i:
                    assert ex["labels"][j] == 0

    def test_train_and_decode(self, mis_dir):
        from difusco_tpu.data.mis import MISDataset

        cfg = _small_cfg(task="mis", sparse_factor=-1)
        task = MISTask(cfg)
        ds = MISDataset(os.path.join(mis_dir, "*.gpickle"))
        trainer = Trainer(task, cfg)
        params, history = trainer.fit(
            ds.batches(4, seed=0, epochs=None), total_steps=40, log_every=10
        )
        assert np.isfinite(history[-1]["train/loss"])

        ex = ds.get(0)
        m = task.evaluate_instance(params, ex, jax.random.PRNGKey(0))
        # decoded set must be nonempty, feasible (checked in ops tests), and
        # no larger than impossible (<= num real nodes)
        assert 0 < m["solved_cost"] <= int(ex["num_nodes"])
        assert m["gt_cost"] > 0

    def test_gaussian_mis_step(self, mis_dir):
        from difusco_tpu.data.mis import MISDataset

        cfg = _small_cfg(task="mis", diffusion_type="gaussian")
        task = MISTask(cfg)
        ds = MISDataset(os.path.join(mis_dir, "*.gpickle"))
        batch = next(ds.batches(4))
        params = task.init_params(jax.random.PRNGKey(0), batch)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        loss = task.loss_fn(params, jb, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestMISGaussianEval:
    def test_gaussian_mis_inference(self, tmp_path_factory):
        from difusco_tpu.data.generate_mis import main as gen_main
        from difusco_tpu.data.mis import MISDataset

        d = str(tmp_path_factory.mktemp("misg"))
        gen_main([
            "gendata", "--model", "er", "--num_graphs", "4", "--min_n", "20",
            "--max_n", "24", "--er_p", "0.2", "--output_dir", d, "--label",
        ])
        cfg = _small_cfg(
            task="mis", diffusion_type="gaussian", inference_trick="ddim",
            sequential_sampling=2, parallel_sampling=2,
        )
        task = MISTask(cfg)
        ds = MISDataset(os.path.join(d, "*.gpickle"))
        batch = next(ds.batches(2))
        params = task.init_params(jax.random.PRNGKey(0), batch)
        m = task.evaluate_instance(params, ds.get(0), jax.random.PRNGKey(1))
        assert 0 <= m["solved_cost"] <= int(ds.get(0)["num_nodes"])
        assert np.isfinite(m["solved_cost"])
