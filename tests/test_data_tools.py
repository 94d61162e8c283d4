"""Tests for data tooling: image rasterizer, MIS solvers/aggregator,
merge backends, heatmap saving."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difusco_tpu.config import Config
from difusco_tpu.data.generate_tsp import generate as gen_tsp
from difusco_tpu.data.tsp import TSPDataset, write_tsp_file
from difusco_tpu.tasks.tsp import TSPTask


@pytest.fixture(scope="module")
def tsp_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("d") / "tsp16.txt")
    write_tsp_file(path, gen_tsp(num_samples=6, num_nodes=16, seed=0))
    return path


class TestImageDataset:
    def test_rasterize(self, tsp_file):
        from difusco_tpu.data.tsp_image import TSPImageDataset

        ds = TSPImageDataset(tsp_file, img_size=32)
        ex = ds.get(0)
        img = ex["image"]
        assert img.shape == (32, 32)
        assert img.max() == 1.0  # points drawn
        assert ((img > 0) & (img < 1)).any()  # tour lines drawn

    def test_trajectory_render(self, tsp_file):
        from difusco_tpu.data.tsp_image import render_denoising_trajectory

        ds = TSPDataset(tsp_file)
        ex = ds.get(0)
        heats = np.stack([ex["adj"] * f for f in (0.2, 0.6, 1.0)])
        frames = render_denoising_trajectory(ex["points"], heats, img_size=32)
        assert frames.shape == (3, 32, 32)
        # later frames (stronger heat) draw brighter lines
        line_mask = (frames[2] > 0) & (frames[2] < 1)
        assert frames[2][line_mask].mean() >= frames[0][line_mask].mean()


class TestMISSolvers:
    @pytest.fixture(scope="class")
    def graphs(self, tmp_path_factory):
        from difusco_tpu.data.generate_mis import main as gen_main

        d = str(tmp_path_factory.mktemp("g"))
        gen_main([
            "gendata", "--model", "er", "--num_graphs", "4", "--min_n", "20",
            "--max_n", "25", "--er_p", "0.2", "--output_dir", d,
        ])
        return d

    def test_greedy_solver_and_labels_readable(self, graphs, tmp_path):
        from difusco_tpu.data.mis_solvers import main as solver_main
        from difusco_tpu.data.mis import MISDataset

        out = str(tmp_path / "labels")
        solver_main([
            "solve", "--input", os.path.join(graphs, "*.gpickle"),
            "--output", out, "--solver", "greedy", "--workers", "1",
        ])
        ds = MISDataset(os.path.join(graphs, "*.gpickle"), label_dir=out)
        ex = ds.get(0)
        n = int(ex["num_nodes"])
        assert ex["labels"][:n].sum() > 0
        # labels form an independent set
        for i in np.nonzero(ex["labels"][:n])[0]:
            nb = ex["neighbors"][i][ex["mask"][i] > 0]
            for j in nb:
                if j != i:
                    assert ex["labels"][j] == 0

    def test_aggregate(self, graphs, tmp_path):
        from difusco_tpu.data.mis_solvers import main as solver_main

        out = str(tmp_path / "labels")
        solver_main([
            "solve", "--input", os.path.join(graphs, "*.gpickle"),
            "--output", out, "--solver", "greedy", "--workers", "1",
        ])
        csv_path = str(tmp_path / "r.csv")
        solver_main(["aggregate", "--input", out, "--csv", csv_path])
        with open(csv_path) as f:
            lines = f.read().splitlines()
        assert lines[0] == "graph,nodes,set_size"
        assert len(lines) == 5

    def test_external_solvers_raise_cleanly(self, graphs):
        from difusco_tpu.data.mis_solvers import solve_kamis, _load_graph
        import glob as g

        graph = _load_graph(sorted(g.glob(os.path.join(graphs, "*.gpickle")))[0])
        with pytest.raises(RuntimeError, match="redumis"):
            solve_kamis(graph)

    def test_fetch_optima_csv(self, graphs, tmp_path):
        import pickle

        from difusco_tpu.data.aggregate import main as agg_main

        # the fixture graphs are unlabeled, so optima come out as empty cells
        csv_path = str(tmp_path / "optima.csv")
        agg_main(["optima", "--input", os.path.join(graphs, "*.gpickle"),
                  "--output", csv_path])
        with open(csv_path) as f:
            lines = f.read().splitlines()
        assert lines[0] == "graph,nodes,edges,optimal_mis,optimal_mwis"
        assert len(lines) == 5
        # now attach labels and check optima are summed
        import glob as g
        first = sorted(g.glob(os.path.join(graphs, "*.gpickle")))[0]
        with open(first, "rb") as f:
            gr = pickle.load(f)
        for n in gr.nodes:
            gr.nodes[n]["label"] = 1 if n % 7 == 0 else 0
        labeled = str(tmp_path / "labeled.gpickle")
        with open(labeled, "wb") as f:
            pickle.dump(gr, f, protocol=4)
        agg_main(["optima", "--input", labeled, "--output", csv_path])
        with open(csv_path) as f:
            rows = f.read().splitlines()
        assert rows[1].split(",")[3] == str(
            sum(1 for n in gr.nodes if n % 7 == 0))


class TestRunAggregator:
    def test_aggregate_runs(self, tmp_path):
        import json

        from difusco_tpu.data.aggregate import main as agg_main

        run_dir = tmp_path / "runs" / "models" / "tsp" / "r0"
        run_dir.mkdir(parents=True)
        with open(run_dir / "metrics.jsonl", "w") as f:
            f.write(json.dumps({"step": 1, "ts": 0.0, "train/loss": 0.9}) + "\n")
            f.write(json.dumps({"step": 5, "ts": 1.0, "train/loss": 0.4,
                                "val/solved_cost": 3.2}) + "\n")
        csv_path = str(tmp_path / "runs.csv")
        agg_main(["runs", "--input", str(tmp_path / "runs"),
                  "--output", csv_path])
        with open(csv_path) as f:
            header, row = f.read().splitlines()
        assert header == "run,last_step,train/loss,val/solved_cost"
        cols = row.split(",")
        assert cols[1] == "5" and float(cols[2]) == 0.4


class TestMergeBackends:
    def _setup(self, tsp_file, backend):
        cfg = Config(
            task="tsp", diffusion_type="categorical", diffusion_steps=50,
            inference_diffusion_steps=3, n_layers=2, hidden_dim=64,
            merge_backend=backend, two_opt_iterations=50,
        )
        task = TSPTask(cfg)
        ds = TSPDataset(tsp_file)
        ex = ds.get(0)
        rng = np.random.default_rng(0)
        heat = rng.random((2, 16, 16)).astype(np.float32) * 0.2
        tour = ex["tour"]
        heat[:, tour[:-1], tour[1:]] += 0.8
        return task, jnp.asarray(ex["points"]), jnp.asarray(heat)

    @pytest.mark.parametrize("backend", ["device", "numpy"])
    def test_backends_agree(self, tsp_file, backend):
        task_d, pts, heat = self._setup(tsp_file, "device")
        tours_d, costs_d, _ = task_d.decode(pts, heat)
        task_b, _, _ = self._setup(tsp_file, backend)
        tours_b, costs_b, _ = task_b.decode(pts, heat)
        np.testing.assert_allclose(
            np.asarray(costs_b), np.asarray(costs_d), atol=1e-5
        )

    def test_native_backend_if_available(self, tsp_file):
        from difusco_tpu.ops.native import native_available

        if not native_available():
            pytest.skip("no native toolchain")
        task_d, pts, heat = self._setup(tsp_file, "device")
        tours_d, costs_d, _ = task_d.decode(pts, heat)
        task_n, _, _ = self._setup(tsp_file, "native")
        tours_n, costs_n, _ = task_n.decode(pts, heat)
        np.testing.assert_allclose(
            np.asarray(costs_n), np.asarray(costs_d), atol=1e-5
        )


class TestHeatmapSaving:
    def test_save_numpy_heatmap(self, tsp_file, tmp_path):
        cfg = Config(
            task="tsp", diffusion_type="categorical", diffusion_steps=50,
            inference_diffusion_steps=3, n_layers=2, hidden_dim=64,
            two_opt_iterations=20,
        )
        task = TSPTask(cfg)
        ds = TSPDataset(tsp_file)
        ex = ds.get(0)
        batch = {k: v[None] for k, v in ex.items()}
        params = task.init_params(jax.random.PRNGKey(0), batch)
        d = str(tmp_path / "hm")
        task.evaluate_instance(
            params,
            jnp.asarray(ex["points"]),
            jnp.asarray(ex["tour"]),
            jax.random.PRNGKey(0),
            save_heatmap_dir=d,
            instance_idx=3,
            split="test",
        )
        heat = np.load(os.path.join(d, "test-heatmap-3.npy"))
        pts = np.load(os.path.join(d, "test-points-3.npy"))
        assert heat.shape == (16, 16)
        assert pts.shape == (16, 2)

    def test_save_rejects_multi_sampling(self, tsp_file, tmp_path):
        cfg = Config(
            task="tsp", diffusion_type="categorical", diffusion_steps=50,
            inference_diffusion_steps=3, n_layers=2, hidden_dim=64,
            parallel_sampling=2,
        )
        task = TSPTask(cfg)
        ds = TSPDataset(tsp_file)
        ex = ds.get(0)
        batch = {k: v[None] for k, v in ex.items()}
        params = task.init_params(jax.random.PRNGKey(0), batch)
        with pytest.raises(NotImplementedError):
            task.evaluate_instance(
                params,
                jnp.asarray(ex["points"]),
                jnp.asarray(ex["tour"]),
                jax.random.PRNGKey(0),
                save_heatmap_dir=str(tmp_path / "x"),
            )


class TestPlantedSAT:
    def test_planted_labels_are_optimal_mis(self):
        """Planted SAT labels form an independent set of size == clause count
        (= the provable MIS optimum of a satisfiable reduction)."""
        import numpy as np

        from difusco_tpu.data.generate_mis import planted_sat_clauses, sat_to_mis

        rng = np.random.default_rng(0)
        for trial in range(4):
            m = int(rng.integers(20, 60))
            clauses, label_pos = planted_sat_clauses(m, max(3, m // 3), rng)
            g = sat_to_mis(clauses)
            picked = [ci * 3 + p for ci, p in enumerate(label_pos)]
            assert len(picked) == m
            pset = set(picked)
            for u in picked:
                for v in g.neighbors(u):
                    assert v not in pset or v == u

    def test_gendata_cli_planted(self, tmp_path):
        import pickle

        from difusco_tpu.data.generate_mis import main

        out = tmp_path / "satp"
        main(["gendata", "--model", "sat", "--num_graphs", "2",
              "--min_n", "20", "--max_n", "30", "--sat_planted",
              "--output_dir", str(out), "--seed", "1"])
        files = sorted(out.glob("*.gpickle"))
        assert len(files) == 2
        g = pickle.load(open(files[0], "rb"))
        import networkx as nx

        lbl = nx.get_node_attributes(g, "label")
        m = g.number_of_nodes() // 3
        assert sum(lbl.values()) == m


class TestKnnLocalSearchLabeler:
    """CPU kNN-restricted 2-opt/Or-opt labeler (generate_tsp.local_search_knn)
    — the large-V path replacing the reference's Concorde/LKH labeling tier
    (generate_tsp_data.py:46-67) where the dense device 2-opt cannot fit."""

    def _cost(self, p, t):
        d = p[t[1:]] - p[t[:-1]]
        return float(np.sqrt((d * d).sum(-1)).sum())

    def test_improves_and_valid(self):
        from difusco_tpu.data.generate_tsp import (
            local_search_knn, nearest_neighbor_tour)

        rng = np.random.default_rng(0)
        pts = rng.random((200, 2))
        nn = nearest_neighbor_tour(pts)
        ls = local_search_knn(pts, nn, k=8)
        assert ls[0] == ls[-1]
        assert sorted(ls[:-1].tolist()) == list(range(200))
        assert self._cost(pts, ls) < self._cost(pts, nn)

    def test_matches_dense_two_opt_quality(self):
        """On a small instance the kNN-restricted search should land within
        1% of the exhaustive dense device 2-opt."""
        from difusco_tpu.data.generate_tsp import (
            local_search_knn, nearest_neighbor_tour, two_opt_solve)

        rng = np.random.default_rng(1)
        pts = rng.random((1, 120, 2))
        nn = nearest_neighbor_tour(pts[0])
        ls = local_search_knn(pts[0], nn, k=10)
        dense = two_opt_solve(pts, chunk=1)[0]
        assert self._cost(pts[0], ls) <= 1.01 * self._cost(pts[0], dense)

    def test_generate_routes_large_v_to_knn(self, monkeypatch):
        from difusco_tpu.data import generate_tsp as gt

        called = {}

        def fake_knn(points, k=10):
            called["knn"] = True
            return np.stack([gt.nearest_neighbor_tour(p) for p in points])

        monkeypatch.setattr(gt, "two_opt_knn_solve", fake_knn)
        gt.generate(1, 2001, seed=0)
        assert called.get("knn")


class TestTourCostNp:
    def test_open_and_closed_agree(self):
        import numpy as np

        from difusco_tpu.utils.tours import tour_cost_np

        rng = np.random.default_rng(0)
        pts = rng.random((10, 2))
        open_tour = rng.permutation(10)
        closed = np.concatenate([open_tour, open_tour[:1]])
        a = tour_cost_np(pts, open_tour)
        b = tour_cost_np(pts, closed)
        assert abs(a - b) < 1e-12
        # square: unit side length, optimal cycle = 4
        sq = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
        assert abs(tour_cost_np(sq, np.array([0, 1, 2, 3])) - 4.0) < 1e-12
