"""Tests for the native C++ merge library and MCTS solver."""

import os

import numpy as np
import pytest

from difusco_tpu import ops
from difusco_tpu.ops.native import merge_heatmap_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _planted_heat(rng, V, quality=0.8):
    perm = rng.permutation(V)
    heat = rng.random((V, V)) * (1 - quality)
    for i in range(V):
        heat[perm[i], perm[(i + 1) % V]] += quality
    return heat, perm


class TestNativeMerge:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        for V in (10, 30, 60):
            pts = rng.random((V, 2))
            heat, _ = _planted_heat(rng, V)
            sym = heat + heat.T
            tours, adj, iters = merge_heatmap_native(pts, sym[None])
            adj_np, iters_np = ops.merge_heatmap_numpy(pts, sym)
            np.testing.assert_array_equal(adj[0], adj_np)
            assert iters[0] == iters_np

    def test_batch_multithreaded(self):
        rng = np.random.default_rng(1)
        V, S = 40, 8
        pts = rng.random((V, 2))
        heats = np.stack([_planted_heat(rng, V)[0] for _ in range(S)])
        sym = heats + heats.transpose(0, 2, 1)
        tours, adj, iters = merge_heatmap_native(pts, sym, n_threads=4)
        tours1, adj1, iters1 = merge_heatmap_native(pts, sym, n_threads=1)
        np.testing.assert_array_equal(tours, tours1)
        for s in range(S):
            t = tours[s]
            assert t[0] == t[-1] and len(set(t[:-1].tolist())) == V

    def test_tour_walk_matches_device(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(2)
        V = 25
        pts = rng.random((V, 2))
        heat, _ = _planted_heat(rng, V)
        tours_n, _, _ = merge_heatmap_native(pts, (heat + heat.T)[None])
        tours_d, _ = ops.merge_heatmap_device(jnp.asarray(pts), jnp.asarray(heat)[None])
        np.testing.assert_array_equal(tours_n[0], np.asarray(tours_d)[0])


class TestMCTSSolver:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from difusco_tpu.data.generate_tsp import generate
        from difusco_tpu.data.tsp import write_tsp_file
        from difusco_tpu.decode.mcts import sparsify_heatmap, write_heatmap_txt

        root = tmp_path_factory.mktemp("mcts")
        instances = generate(num_samples=3, num_nodes=30, seed=0)
        inst_path = str(root / "tsp30.txt")
        write_tsp_file(inst_path, instances)

        rng = np.random.default_rng(0)
        for i, (pts, tour) in enumerate(instances):
            # imperfect heatmap: strong on label-tour edges + noise
            heat = rng.random((30, 30)) * 0.2
            heat[tour[:-1], tour[1:]] += 0.8
            sp = sparsify_heatmap(heat, pts)
            write_heatmap_txt(str(root / f"heat_{i}.txt"), sp)
        return root, inst_path

    def test_solver_runs_and_improves(self, setup):
        from difusco_tpu.decode.mcts import run_mcts

        root, inst_path = setup
        stats = run_mcts(
            inst_path,
            str(root / "heat_{i}.txt"),
            str(root / "stats.txt"),
            time_per_city=0.01,
            threads=3,
            tours_path=str(root / "tours.txt"),
        )
        assert stats["instances"] == 3
        # label tours are NN+2-opt, MCTS from a good heatmap should be within
        # a few percent (often better, i.e. negative gap)
        assert stats["avg_gap_percent"] < 5.0
        # tours are valid permutations
        with open(root / "tours.txt") as f:
            for line in f:
                t = [int(x) - 1 for x in line.split()]
                assert len(t) == 31 and t[0] == t[-1]
                assert sorted(t[:-1]) == list(range(30))

    def test_mcts_polish_labels_keep_if_better(self, setup, tmp_path):
        """scripts/mcts_polish_labels.py rewrites a split in place; every
        label can only get shorter (keep-if-better) and stays a valid tour."""
        import shutil
        import subprocess
        import sys

        from difusco_tpu.data.tsp import TSPDataset
        from difusco_tpu.ops.two_opt import tour_cost

        import jax.numpy as jnp

        _, inst_path = setup
        split = str(tmp_path / "split.txt")
        shutil.copy(inst_path, split)
        before = TSPDataset(split)
        costs0 = [
            float(tour_cost(jnp.asarray(before.get(i)["points"], jnp.float32),
                            jnp.asarray(before.get(i)["tour"])))
            for i in range(len(before))
        ]
        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "mcts_polish_labels.py",
        )
        subprocess.run(
            [sys.executable, script, "--split", split, "--time", "0.01",
             "--threads", "3"],
            check=True, capture_output=True, text=True, timeout=300,
        )
        after = TSPDataset(split)
        assert len(after) == len(before)
        for i in range(len(after)):
            ex = after.get(i)
            V = len(ex["points"])
            t = np.asarray(ex["tour"])
            assert len(t) == V + 1 and t[0] == t[-1]
            assert sorted(t[:-1].tolist()) == list(range(V))
            c = float(tour_cost(jnp.asarray(ex["points"], jnp.float32),
                                jnp.asarray(t)))
            assert c <= costs0[i] + 1e-6


class TestSparsifier:
    def test_row_normalized_and_connected(self):
        rng = np.random.default_rng(3)
        V = 50
        pts = rng.random((V, 2))
        heat = rng.random((V, V))
        sp = sparsify = __import__(
            "difusco_tpu.decode.mcts", fromlist=["sparsify_heatmap"]
        ).sparsify_heatmap(heat, pts)
        np.testing.assert_allclose(sp.sum(1), 1.0, atol=1e-6)
        # every node keeps at least its top-3 edges (plus symmetrized ones)
        assert ((sp > 0).sum(1) >= 3).all()


class TestSparseHeatmapFormat:
    def test_sparsify_large_matches_dense(self):
        from difusco_tpu.decode.mcts import (sparsify_heatmap,
                                             sparsify_heatmap_large)

        rng = np.random.default_rng(5)
        n = 80
        heat = rng.random((n, n))
        pts = rng.random((n, 2))
        a = sparsify_heatmap(heat, pts, 0.03)
        r, c, v = sparsify_heatmap_large(
            heat.astype(np.float32), pts.astype(np.float32), 0.03)
        b = np.zeros((n, n))
        b[r, c] = v
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_sparse_txt_equals_dense_through_solver(self, tmp_path):
        """The SPARSE text format (added for V=10000, where a dense heatmap
        file is ~860 MB) must produce the identical solver result."""
        from difusco_tpu.data.generate_tsp import generate
        from difusco_tpu.data.tsp import write_tsp_file
        from difusco_tpu.decode.mcts import (run_mcts, sparsify_heatmap,
                                             sparsify_heatmap_large,
                                             write_heatmap_sparse_txt,
                                             write_heatmap_txt)

        instances = generate(num_samples=1, num_nodes=25, seed=3)
        inst_path = str(tmp_path / "tsp25.txt")
        write_tsp_file(inst_path, instances)
        pts, tour = instances[0]
        rng = np.random.default_rng(1)
        heat = rng.random((25, 25)) * 0.2
        heat[tour[:-1], tour[1:]] += 0.8
        write_heatmap_txt(str(tmp_path / "hd_0.txt"),
                          sparsify_heatmap(heat, pts, 0.05))
        r, c, v = sparsify_heatmap_large(
            heat.astype(np.float32), pts.astype(np.float32), 0.05)
        write_heatmap_sparse_txt(str(tmp_path / "hs_0.txt"), 25, r, c, v)
        tours = {}
        for tag in ("hd", "hs"):
            run_mcts(inst_path, str(tmp_path / (tag + "_{i}.txt")),
                     str(tmp_path / f"st_{tag}.txt"), time_per_city=0.01,
                     threads=1, tours_path=str(tmp_path / f"t_{tag}.txt"))
            tours[tag] = open(tmp_path / f"t_{tag}.txt").read().split()
        assert tours["hd"] == tours["hs"]


class TestBnBProver:
    """native/bnb/tsp_bnb.cpp: exact B&B over the Held-Karp bound."""

    BNB = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "build", "tsp_bnb")

    def _run(self, path):
        import subprocess

        p = subprocess.run([self.BNB, path, "--threads", "1"],
                           capture_output=True, text=True, check=True)
        return p.stdout

    def test_convex_polygon_label_proven_optimal(self, tmp_path):
        # points in convex position: the unique optimal tour is hull order
        n = 12
        ang = np.sort(np.random.default_rng(0).uniform(0, 2 * np.pi, n))
        pts = 0.5 + 0.45 * np.stack([np.cos(ang), np.sin(ang)], 1)
        line = (" ".join(f"{x:.6f} {y:.6f}" for x, y in pts) + " output " +
                " ".join(str(i + 1) for i in list(range(n)) + [0]))
        f = tmp_path / "hull.txt"
        f.write_text(line + "\n")
        out = self._run(str(f))
        assert "inst 0 OPTIMAL" in out

    def test_bad_label_improved_to_hull_order(self, tmp_path):
        n = 12
        ang = np.sort(np.random.default_rng(0).uniform(0, 2 * np.pi, n))
        pts = 0.5 + 0.45 * np.stack([np.cos(ang), np.sin(ang)], 1)
        perm = np.random.default_rng(1).permutation(n)
        line = (" ".join(f"{x:.6f} {y:.6f}" for x, y in pts) + " output " +
                " ".join(str(i + 1) for i in list(perm) + [perm[0]]))
        f = tmp_path / "bad.txt"
        f.write_text(line + "\n")
        out = self._run(str(f))
        assert "inst 0 IMPROVED" in out
        toks = out.splitlines()[0].split()
        tour = [int(x) for x in toks[toks.index("tour") + 1:]]
        # the proven-optimal tour must be the hull order (up to rotation
        # and reflection)
        t = tour[:-1]
        k = t.index(0)
        rot = t[k:] + t[:k]
        assert rot == list(range(n)) or [rot[0]] + rot[1:][::-1] == list(
            range(n))
