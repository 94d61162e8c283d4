"""Whole-network fused kernel (ops/pallas_gnn_mega.py) parity tests —
interpret mode on CPU against the flax model. xt is binary (the categorical
sampling path the kernel is scoped to), where the sinusoidal edge embed +
matmul is exactly the two-row table select."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difusco_tpu.models.gnn import GNNDenoiser
from difusco_tpu.ops.pallas_gnn_mega import sparse_forward_mega


class TestMegaKernel:
    @pytest.mark.parametrize("V,K,L", [(12, 5, 2), (20, 7, 3), (130, 4, 2)])
    def test_matches_flax(self, V, K, L):
        key = jax.random.PRNGKey(0)
        S, H = 2, 64
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=2, sparse=True,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(key, (S, V, 2))
        xt = jax.random.bernoulli(key, 0.5, (S, V, K)).astype(jnp.float32)
        nbrs = jax.random.randint(key, (S, V, K), 0, V)
        t = jnp.array([5.0] * S)
        params = model.init(key, t, xt, points=pts, neighbors=nbrs)
        ref = model.apply(params, t, xt, points=pts, neighbors=nbrs)
        out = sparse_forward_mega(
            params, t, xt, pts, nbrs, n_layers=L, hidden_dim=H,
            out_channels=2, interpret=True,
        )
        assert out.shape == ref.shape
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 5e-2, f"V={V} K={K} L={L}: {err}"

    def test_matches_per_layer_fused(self):
        """Mega kernel vs the per-layer fused path on identical inputs —
        the two fused variants must agree tightly (same op order)."""
        from difusco_tpu.ops.pallas_gnn_sparse import sparse_forward_fused

        key = jax.random.PRNGKey(2)
        S, V, K, H, L = 2, 24, 6, 64, 2
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=2, sparse=True,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(key, (S, V, 2))
        xt = jax.random.bernoulli(key, 0.3, (S, V, K)).astype(jnp.float32)
        nbrs = jax.random.randint(key, (S, V, K), 0, V)
        t = jnp.array([9.0] * S)
        params = model.init(key, t, xt, points=pts, neighbors=nbrs)
        a = sparse_forward_fused(
            params, t, xt, pts, nbrs, n_layers=L, hidden_dim=H,
            out_channels=2, interpret=True, xt_binary=True,
        )
        b = sparse_forward_mega(
            params, t, xt, pts, nbrs, n_layers=L, hidden_dim=H,
            out_channels=2, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-2, atol=2e-2)

    def test_adversarial_neighbors(self):
        key = jax.random.PRNGKey(1)
        S, V, K, H, L = 1, 10, 3, 64, 1
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=1, sparse=True,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(key, (S, V, 2))
        xt = jax.random.bernoulli(key, 0.5, (S, V, K)).astype(jnp.float32)
        nbrs = jnp.asarray(
            np.stack([np.full((V,), 7), np.arange(V)[::-1], np.zeros(V)], 1)
        )[None].astype(jnp.int32)
        t = jnp.array([3.0])
        params = model.init(key, t, xt, points=pts, neighbors=nbrs)
        ref = model.apply(params, t, xt, points=pts, neighbors=nbrs)
        out = sparse_forward_mega(
            params, t, xt, pts, nbrs, n_layers=L, hidden_dim=H,
            out_channels=1, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2)


class TestDenseMegaKernel:
    @pytest.mark.parametrize("V,L", [(10, 2), (14, 3)])
    def test_matches_flax(self, V, L):
        from difusco_tpu.ops.pallas_gnn_mega import dense_forward_mega

        key = jax.random.PRNGKey(0)
        S, H = 2, 64
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=2, sparse=False,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(key, (S, V, 2))
        xt = jax.random.bernoulli(key, 0.5, (S, V, V)).astype(jnp.float32)
        t = jnp.array([5.0] * S)
        params = model.init(key, t, xt, points=pts)
        ref = model.apply(params, t, xt, points=pts)
        out = dense_forward_mega(
            params, t, xt, pts, n_layers=L, hidden_dim=H,
            out_channels=2, interpret=True,
        )
        assert out.shape == ref.shape
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 5e-2, f"V={V} L={L}: {err}"

    def test_pad_columns_do_not_leak(self):
        """V=10 pads to 16: the pad-column mask must keep the dense
        aggregation identical to the unpadded flax result (checked
        implicitly above, here with an xt that lights up every edge)."""
        from difusco_tpu.ops.pallas_gnn_mega import dense_forward_mega

        key = jax.random.PRNGKey(3)
        S, V, H, L = 1, 10, 64, 1
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=2, sparse=False,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(key, (S, V, 2))
        xt = jnp.ones((S, V, V), jnp.float32)
        t = jnp.array([2.0])
        params = model.init(key, t, xt, points=pts)
        ref = model.apply(params, t, xt, points=pts)
        out = dense_forward_mega(
            params, t, xt, pts, n_layers=L, hidden_dim=H,
            out_channels=2, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=5e-2, atol=5e-2)


class TestMegaStepKernel:
    """Step-fused kernel (layers + out head + softmax + posterior +
    Bernoulli in one kernel, VERDICT r4 items 4+5) vs the unfused
    composition on identical PRNG streams."""

    def _setup(self, V, K, S, H, L, seed=0):
        key = jax.random.PRNGKey(seed)
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=2, sparse=True,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(jax.random.fold_in(key, 1), (V, 2))
        d = jnp.linalg.norm(pts[:, None] - pts[None], axis=-1) \
            + jnp.eye(V) * 1e9
        nbrs = jnp.argsort(d, axis=1)[:, :K].astype(jnp.int32)
        xt = jax.random.bernoulli(
            jax.random.fold_in(key, 2), 0.5, (S, V, K)).astype(jnp.float32)
        t = jnp.array([37.0] * S)
        params = model.init(
            key, t, xt, points=jnp.broadcast_to(pts[None], (S, V, 2)),
            neighbors=jnp.broadcast_to(nbrs[None], (S, V, K)))
        return key, params, pts, nbrs, xt, t

    @pytest.mark.parametrize("V,K", [(24, 6), (130, 5)])
    def test_bit_parity_with_unfused(self, V, K):
        from difusco_tpu import diffusion as dfn
        from difusco_tpu.ops.pallas_gnn_mega import sparse_denoise_step_mega

        S, H, L = 2, 64, 2
        key, params, pts, nbrs, xt, t = self._setup(V, K, S, H, L)
        sched = dfn.categorical_schedule(100, "cosine")
        sub = jax.random.fold_in(key, 9)
        t1, t2 = jnp.int32(80), jnp.int32(55)

        logits = sparse_forward_mega(
            params, t, xt, jnp.broadcast_to(pts[None], (S, V, 2)),
            jnp.broadcast_to(nbrs[None], (S, V, K)),
            n_layers=L, hidden_dim=H, out_channels=2, interpret=True)
        probs = jax.nn.softmax(logits, axis=-1)
        want = dfn.categorical_posterior(sched, t1, t2, probs, xt, sub)
        got = sparse_denoise_step_mega(
            params, sched.Q_bar, t1, t2, xt, pts, nbrs, sub,
            n_layers=L, hidden_dim=H, interpret=True)
        # identical uniforms; p_one differs only by f32 rounding, so the
        # Bernoulli bits must agree everywhere except measure-zero ties
        mismatch = float(np.mean(np.asarray(want) != np.asarray(got)))
        assert mismatch <= 1.0 / (S * V * K), mismatch

    def test_final_step_soft_heatmap(self):
        from difusco_tpu import diffusion as dfn
        from difusco_tpu.ops.pallas_gnn_mega import sparse_denoise_step_mega

        V, K, S, H, L = 24, 6, 2, 64, 2
        key, params, pts, nbrs, xt, t = self._setup(V, K, S, H, L, seed=4)
        sched = dfn.categorical_schedule(100, "cosine")
        sub = jax.random.fold_in(key, 9)
        t1 = jnp.int32(11)

        logits = sparse_forward_mega(
            params, t.at[:].set(11.0), xt,
            jnp.broadcast_to(pts[None], (S, V, 2)),
            jnp.broadcast_to(nbrs[None], (S, V, K)),
            n_layers=L, hidden_dim=H, out_channels=2, interpret=True)
        probs = jax.nn.softmax(logits, axis=-1)
        want = dfn.categorical_posterior(
            sched, t1, jnp.int32(0), probs, xt, sub)
        got = sparse_denoise_step_mega(
            params, sched.Q_bar, t1, jnp.int32(0), xt, pts, nbrs, sub,
            n_layers=L, hidden_dim=H, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)

    def test_full_scan_matches_task_sampler(self):
        """A 4-step scan of the fused step must reproduce task.sample's
        CPU/XLA heatmap (same keys) to sampling-noise tolerance: bit-equal
        intermediate xt implies an (almost) identical final heatmap."""
        from difusco_tpu import diffusion as dfn
        from difusco_tpu.config import Config
        from difusco_tpu.ops.pallas_gnn_mega import sparse_denoise_step_mega
        from difusco_tpu.tasks.tsp import TSPTask

        V, K, S, H, L = 30, 6, 2, 64, 2
        cfg = Config(
            task="tsp", diffusion_type="categorical",
            diffusion_schedule="cosine", diffusion_steps=100,
            inference_diffusion_steps=4, inference_schedule="cosine",
            n_layers=L, hidden_dim=H, sparse_factor=K,
            parallel_sampling=S, bf16=True,
        )
        task = TSPTask(cfg)
        key = jax.random.PRNGKey(7)
        pts = jax.random.uniform(jax.random.fold_in(key, 1), (V, 2))
        d = jnp.linalg.norm(pts[:, None] - pts[None], axis=-1) \
            + jnp.eye(V) * 1e9
        nbrs = jnp.argsort(d, axis=1)[:, :K].astype(jnp.int32)
        params = task.init_params(
            jax.random.fold_in(key, 2),
            {"points": np.asarray(pts)[None],
             "neighbors": np.asarray(nbrs)[None],
             "adj": np.zeros((1, V, V), np.float32),
             "edge_labels": np.zeros((1, V, K), np.float32)})
        want = task.sample(params, pts, key, S, neighbors=nbrs)

        kx, kloop = jax.random.split(key)
        xt = (jax.random.normal(kx, (S, V, K)) > 0).astype(jnp.float32)
        k = kloop
        for pair in np.asarray(task.time_pairs):
            k, sub = jax.random.split(k)
            xt = sparse_denoise_step_mega(
                params, task.sched.Q_bar, jnp.int32(pair[0]),
                jnp.int32(pair[1]), xt, pts, nbrs, sub,
                n_layers=L, hidden_dim=H, interpret=True)
        got = xt + 1e-6
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-3)


class TestDenseMegaStepKernel:
    def test_bit_parity_with_unfused(self):
        from difusco_tpu import diffusion as dfn
        from difusco_tpu.ops.pallas_gnn_mega import (
            dense_denoise_step_mega, dense_forward_mega)

        key = jax.random.PRNGKey(5)
        S, V, H, L = 2, 18, 64, 2
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=2, sparse=False,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(jax.random.fold_in(key, 1), (V, 2))
        xt = jax.random.bernoulli(
            jax.random.fold_in(key, 2), 0.5, (S, V, V)).astype(jnp.float32)
        t = jnp.array([44.0] * S)
        params = model.init(
            key, t, xt, points=jnp.broadcast_to(pts[None], (S, V, 2)))
        sched = dfn.categorical_schedule(100, "cosine")
        sub = jax.random.fold_in(key, 9)
        t1, t2 = jnp.int32(44), jnp.int32(23)

        logits = dense_forward_mega(
            params, t, xt, jnp.broadcast_to(pts[None], (S, V, 2)),
            n_layers=L, hidden_dim=H, out_channels=2, interpret=True)
        probs = jax.nn.softmax(logits, axis=-1)
        want = dfn.categorical_posterior(sched, t1, t2, probs, xt, sub)
        got = dense_denoise_step_mega(
            params, sched.Q_bar, t1, t2, xt, pts, sub,
            n_layers=L, hidden_dim=H, interpret=True)
        mismatch = float(np.mean(np.asarray(want) != np.asarray(got)))
        assert mismatch <= 1.0 / (S * V * V), mismatch

        # final step: soft heatmap
        want0 = dfn.categorical_posterior(
            sched, t1, jnp.int32(0), probs, xt, sub)
        got0 = dense_denoise_step_mega(
            params, sched.Q_bar, t1, jnp.int32(0), xt, pts, sub,
            n_layers=L, hidden_dim=H, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got0), np.asarray(want0), rtol=1e-3, atol=1e-4)
