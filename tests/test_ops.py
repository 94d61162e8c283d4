"""Tests for decoder ops: 2-opt, greedy merge, MIS decode, kNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

from difusco_tpu import ops


def _rand_instance(rng, V):
    return rng.random((V, 2))


def _tour_is_hamiltonian(tour, V):
    t = np.asarray(tour)
    return (
        t.shape[0] == V + 1
        and t[0] == t[-1]
        and len(set(t[:-1].tolist())) == V
        and set(t[:-1].tolist()) == set(range(V))
    )


def _np_cost(points, tour):
    return float(
        np.linalg.norm(points[tour[1:]] - points[tour[:-1]], axis=-1).sum()
    )


class TestTwoOpt:
    def test_improves_and_stays_valid(self):
        rng = np.random.default_rng(0)
        V = 30
        pts = _rand_instance(rng, V)
        tours = []
        for _ in range(4):
            perm = rng.permutation(V)
            tours.append(np.concatenate([perm, perm[:1]]))
        tours = np.stack(tours)
        costs0 = [_np_cost(pts, t) for t in tours]
        out, iters = ops.batched_two_opt(jnp.asarray(pts), jnp.asarray(tours))
        out = np.asarray(out)
        assert int(iters) > 0
        for i in range(4):
            assert _tour_is_hamiltonian(out[i], V)
            assert _np_cost(pts, out[i]) < costs0[i]

    def test_local_optimality(self):
        """After convergence, no 2-opt move may improve any tour."""
        rng = np.random.default_rng(1)
        V = 16
        pts = _rand_instance(rng, V)
        perm = rng.permutation(V)
        tour = np.concatenate([perm, perm[:1]])[None]
        out, _ = ops.batched_two_opt(jnp.asarray(pts), jnp.asarray(tour), 10000)
        t = np.asarray(out)[0]
        base = _np_cost(pts, t)
        for i in range(V - 2):
            for j in range(i + 2, V):
                cand = t.copy()
                cand[i + 1 : j + 1] = cand[i + 1 : j + 1][::-1]
                assert _np_cost(pts, cand) >= base - 1e-6

    def test_optimal_tour_untouched(self):
        # convex position: the hull order is the optimal tour; 2-opt must
        # terminate immediately with 0 iterations
        V = 12
        ang = np.linspace(0, 2 * np.pi, V, endpoint=False)
        pts = np.stack([np.cos(ang), np.sin(ang)], -1)
        tour = np.concatenate([np.arange(V), [0]])[None]
        out, iters = ops.batched_two_opt(jnp.asarray(pts), jnp.asarray(tour))
        assert int(iters) == 0
        np.testing.assert_array_equal(np.asarray(out)[0], tour[0])

    def test_max_iterations_cap(self):
        rng = np.random.default_rng(2)
        V = 40
        pts = _rand_instance(rng, V)
        perm = rng.permutation(V)
        tour = np.concatenate([perm, perm[:1]])[None]
        _, iters = ops.batched_two_opt(jnp.asarray(pts), jnp.asarray(tour), 3)
        assert int(iters) <= 3

    @staticmethod
    def _reference_two_opt_oracle(points, tours, max_iterations=1000):
        """Independent numpy re-implementation of the reference apply rule
        (tsp_utils.py:12-49): while the GLOBAL min move is < -1e-6, every
        sample applies its own argmin over triu(change, 2) — which no-ops
        for samples without a negative move (argmin hits a zero entry at
        flat index 0 -> the empty slice tour[1:1])."""
        tours = tours.copy()
        B, Vp1 = tours.shape
        V = Vp1 - 1
        it = 0
        while it < max_iterations:
            head = points[tours[:, :-1]]
            nxt = points[tours[:, 1:]]
            d = lambda a, b: np.sqrt(((a[:, :, None] - b[:, None]) ** 2).sum(-1))
            dii1 = np.linalg.norm(head - nxt, axis=-1)
            change = d(head, head) + d(nxt, nxt) - dii1[:, :, None] - dii1[:, None, :]
            change = np.triu(change, k=2)
            flat = change.reshape(B, -1)
            if flat.min() >= -1e-6:
                break
            arg = flat.argmin(-1)
            mi, mj = arg // V, arg % V
            for b in range(B):
                tours[b, mi[b] + 1 : mj[b] + 1] = tours[b, mi[b] + 1 : mj[b] + 1][::-1]
            it += 1
        return tours, it

    def test_parity_mode_matches_reference_rule(self):
        rng = np.random.default_rng(3)
        V = 25
        pts = _rand_instance(rng, V).astype(np.float32)
        tours = []
        for _ in range(6):
            perm = rng.permutation(V)
            tours.append(np.concatenate([perm, perm[:1]]))
        tours = np.stack(tours).astype(np.int32)
        ref_t, ref_it = self._reference_two_opt_oracle(pts, tours)
        out, iters = ops.batched_two_opt(
            jnp.asarray(pts), jnp.asarray(tours), parity=True
        )
        np.testing.assert_array_equal(np.asarray(out), ref_t)
        assert int(iters) == ref_it


class _RefMergeOracle:
    """Independent reimplementation of the reference's component-list merge
    (tsp_utils.py:52-78) for differential testing, O(V^2 E) but transparent."""

    @staticmethod
    def run(points, heat_sym):
        V = heat_sym.shape[0]
        dists = np.linalg.norm(points[:, None] - points[None], axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = -heat_sym / dists
        np.fill_diagonal(ratio, np.inf)
        components = [{"nodes": [i], "ends": (i, i)} for i in range(V)]
        node2comp = list(range(V))
        adj = np.zeros((V, V), int)
        added = 0
        for e in np.argsort(ratio.flatten()):
            if added == V - 1:
                break
            a, b = e // V, e % V
            ca, cb = node2comp[a], node2comp[b]
            if ca == cb:
                continue
            ea = components[ca]["ends"]
            eb = components[cb]["ends"]
            if a not in ea or b not in eb:
                continue
            new_ends = (ea[0] if ea[1] == a else ea[1],
                        eb[0] if eb[1] == b else eb[1])
            adj[a, b] = adj[b, a] = 1
            for n in components[cb]["nodes"]:
                node2comp[n] = ca
            components[ca]["nodes"] += components[cb]["nodes"]
            components[ca]["ends"] = new_ends
            added += 1
        ends = [i for i in range(V)
                if sum(adj[i]) < 2]
        if len(ends) == 2:
            adj[ends[0], ends[1]] = adj[ends[1], ends[0]] = 1
        return adj


class TestMerge:
    def _heat(self, rng, V, quality=0.9):
        """Heatmap biased toward a random ground-truth tour."""
        perm = rng.permutation(V)
        heat = rng.random((V, V)) * (1 - quality)
        for i in range(V):
            heat[perm[i], perm[(i + 1) % V]] += quality
        return heat, perm

    def test_numpy_merge_matches_reference_oracle(self):
        rng = np.random.default_rng(3)
        for V in (8, 20, 40):
            pts = _rand_instance(rng, V)
            heat, _ = self._heat(rng, V)
            sym = heat + heat.T
            adj_fast, _ = ops.merge_heatmap_numpy(pts, sym)
            adj_oracle = _RefMergeOracle.run(pts, sym)
            np.testing.assert_array_equal(adj_fast, adj_oracle)

    def test_device_merge_matches_numpy(self):
        rng = np.random.default_rng(4)
        V = 24
        pts = _rand_instance(rng, V)
        heat, _ = self._heat(rng, V)
        tours, iters = ops.merge_heatmap_device(
            jnp.asarray(pts), jnp.asarray(heat)[None]
        )
        assert int(iters[0]) > 0
        t = np.asarray(tours)[0]
        assert _tour_is_hamiltonian(t, V)
        adj_np, _ = ops.merge_heatmap_numpy(pts, heat + heat.T)
        # device tour edges == numpy adjacency edges
        adj_dev = np.zeros((V, V), int)
        for i in range(V):
            adj_dev[t[i], t[i + 1]] = adj_dev[t[i + 1], t[i]] = 1
        np.testing.assert_array_equal(adj_dev, adj_np)

    def test_perfect_heatmap_recovers_tour(self):
        rng = np.random.default_rng(5)
        V = 30
        pts = _rand_instance(rng, V)
        perm = rng.permutation(V)
        heat = np.zeros((V, V))
        for i in range(V):
            heat[perm[i], perm[(i + 1) % V]] = 1.0
        tours, _ = ops.merge_heatmap_device(jnp.asarray(pts), jnp.asarray(heat)[None])
        t = np.asarray(tours)[0]
        assert _tour_is_hamiltonian(t, V)
        # the decoded cycle must be exactly the planted one (up to direction/rotation)
        planted = set()
        for i in range(V):
            planted.add(frozenset((int(perm[i]), int(perm[(i + 1) % V]))))
        decoded = {frozenset((int(t[i]), int(t[i + 1]))) for i in range(V)}
        assert decoded == planted

    def test_sparse_merge_with_knn_candidates(self):
        rng = np.random.default_rng(6)
        V, K = 40, 8
        pts = _rand_instance(rng, V)
        nbrs = ops.knn_graph_numpy(pts, K)
        # heat on kNN edges biased toward nearest neighbors
        heat = np.exp(-np.arange(K, dtype=float))[None, :].repeat(V, 0)
        heat_sym = np.asarray(
            ops.symmetrize_fixed_degree(jnp.asarray(heat), jnp.asarray(nbrs))
        )
        src = np.repeat(np.arange(V), K)
        dst = nbrs.reshape(-1)
        tours, _ = ops.merge_heatmap_device(
            jnp.asarray(pts),
            jnp.asarray(heat_sym.reshape(-1))[None],
            edge_index=jnp.asarray(np.stack([src, dst])),
        )
        assert _tour_is_hamiltonian(np.asarray(tours)[0], V)

    def test_vmap_over_samples(self):
        rng = np.random.default_rng(7)
        V, S = 16, 4
        pts = _rand_instance(rng, V)
        heats = np.stack([self._heat(rng, V)[0] for _ in range(S)])
        tours, iters = ops.merge_heatmap_device(jnp.asarray(pts), jnp.asarray(heats))
        assert tours.shape == (S, V + 1)
        for s in range(S):
            assert _tour_is_hamiltonian(np.asarray(tours)[s], V)

    def test_symmetrize_fixed_degree(self):
        nbrs = jnp.asarray([[1, 2], [0, 2], [0, 1]])
        heat = jnp.asarray([[0.5, 0.1], [0.2, 0.0], [0.3, 0.4]])
        out = np.asarray(ops.symmetrize_fixed_degree(heat, nbrs))
        # edge (0,1): 0.5 + rev (1,0)=0.2 -> 0.7; (0,2): 0.1 + (2,0)=0.3 -> 0.4
        np.testing.assert_allclose(out[0], [0.7, 0.4], atol=1e-6)
        np.testing.assert_allclose(out[1], [0.7, 0.4], atol=1e-6)
        np.testing.assert_allclose(out[2], [0.4, 0.4], atol=1e-6)


class TestMISDecode:
    def _graph(self, rng, V, p=0.15):
        adj = (rng.random((V, V)) < p).astype(int)
        adj = np.triu(adj, 1)
        adj = adj + adj.T
        np.fill_diagonal(adj, 1)  # datasets add self-loops (mis_dataset.py:45-47)
        return adj

    def _padded(self, adj):
        V = adj.shape[0]
        deg = adj.sum(-1)
        K = int(deg.max())
        nbrs = np.zeros((V, K), np.int32)
        mask = np.zeros((V, K), np.float32)
        for i in range(V):
            js = np.nonzero(adj[i])[0]
            nbrs[i, : len(js)] = js
            mask[i, : len(js)] = 1
        return nbrs, mask

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(8)
        for _ in range(5):
            V = 40
            adj = self._graph(rng, V)
            pred = rng.random(V)
            sp = scipy.sparse.coo_matrix(adj)
            expected = ops.mis_decode_numpy(pred, sp)
            nbrs, mask = self._padded(adj)
            got = np.asarray(
                ops.mis_decode_device(
                    jnp.asarray(pred), jnp.asarray(nbrs), jnp.asarray(mask)
                )
            )
            np.testing.assert_array_equal(got, expected)

    def test_independence_and_maximality(self):
        rng = np.random.default_rng(9)
        V = 60
        adj = self._graph(rng, V, p=0.1)
        pred = rng.random(V)
        nbrs, mask = self._padded(adj)
        sol = np.asarray(
            ops.mis_decode_device(jnp.asarray(pred), jnp.asarray(nbrs), jnp.asarray(mask))
        )
        sel = np.nonzero(sol)[0]
        adj_noself = adj.copy()
        np.fill_diagonal(adj_noself, 0)
        # independent
        assert adj_noself[np.ix_(sel, sel)].sum() == 0
        # maximal: every unselected node has a selected neighbor
        for i in np.nonzero(1 - sol)[0]:
            assert adj_noself[i, sel].sum() > 0

    def test_batch_decode(self):
        rng = np.random.default_rng(10)
        V, S = 30, 3
        adj = self._graph(rng, V)
        nbrs, mask = self._padded(adj)
        preds = rng.random((S, V))
        out = np.asarray(
            ops.mis_decode_batch(jnp.asarray(preds), jnp.asarray(nbrs), jnp.asarray(mask))
        )
        assert out.shape == (S, V)


class TestKNN:
    def test_matches_numpy(self):
        rng = np.random.default_rng(11)
        pts = rng.random((100, 2))
        got = np.asarray(ops.knn_graph(jnp.asarray(pts), 8))
        exp = ops.knn_graph_numpy(pts, 8)
        # self must come first everywhere
        np.testing.assert_array_equal(got[:, 0], np.arange(100))
        # neighbor SETS must agree (top_k tie order can differ)
        for i in range(100):
            assert set(got[i].tolist()) == set(exp[i].tolist())

    def test_chunking(self):
        rng = np.random.default_rng(12)
        pts = rng.random((300, 2))
        a = np.asarray(ops.knn_graph(jnp.asarray(pts), 5, row_chunk=64))
        b = np.asarray(ops.knn_graph(jnp.asarray(pts), 5, row_chunk=512))
        np.testing.assert_array_equal(a, b)
