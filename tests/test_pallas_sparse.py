"""Tests for the fused sparse GatedGCN kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difusco_tpu.models.gnn import GNNDenoiser
from difusco_tpu.ops.pallas_gnn_sparse import sparse_forward_fused


class TestSparseFused:
    @pytest.mark.parametrize("V,K", [(12, 5), (16, 4), (20, 7)])
    def test_matches_flax(self, V, K):
        key = jax.random.PRNGKey(0)
        S, H, L = 2, 64, 2
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
        out = sparse_forward_fused(
            params, t, xt, pts, nbrs, n_layers=L, hidden_dim=H,
            out_channels=2, interpret=True,
        )
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 5e-2, f"V={V} K={K}: {err}"

    @pytest.mark.parametrize("V,K", [(12, 5), (16, 4), (20, 7)])
    def test_gathered_variant_matches_flax(self, V, K):
        """The 'gathered' (XLA row-gather + in-kernel A/V/C matmuls) variant
        must match flax like the one-hot variant does."""
        key = jax.random.PRNGKey(0)
        S, H, L = 2, 64, 2
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
        out = sparse_forward_fused(
            params, t, xt, pts, nbrs, n_layers=L, hidden_dim=H,
            out_channels=2, interpret=True, variant="gathered",
        )
        err = np.abs(np.asarray(out) - np.asarray(ref)).max()
        assert err < 5e-2, f"V={V} K={K}: {err}"

    def test_gather_is_exact(self):
        """The one-hot gather must select the right rows: with identity-like
        params the kernel reduces to a pure gather check via the flax path,
        so compare against flax with a neighbor table that is a permutation."""
        key = jax.random.PRNGKey(1)
        S, V, K, H, L = 1, 10, 3, 64, 1
        model = GNNDenoiser(
            n_layers=L, hidden_dim=H, out_channels=1, sparse=True,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.uniform(key, (S, V, 2))
        xt = jax.random.normal(key, (S, V, K))
        # adversarial neighbor table: same node repeated / reversed order
        nbrs = jnp.asarray(
            np.stack([np.full((V,), 7), np.arange(V)[::-1], np.zeros(V)], 1)
        )[None].astype(jnp.int32)
        t = jnp.array([3.0])
        params = model.init(key, t, xt, points=pts, neighbors=nbrs)
        ref = model.apply(params, t, xt, points=pts, neighbors=nbrs)
        out = sparse_forward_fused(
            params, t, xt, pts, nbrs, n_layers=L, hidden_dim=H,
            out_channels=1, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-2
        )

    def test_task_sample_cpu_fallback_sparse(self):
        from difusco_tpu.config import Config
        from difusco_tpu.tasks.tsp import TSPTask

        cfg = Config(
            task="tsp", diffusion_type="categorical", diffusion_steps=50,
            inference_diffusion_steps=3, n_layers=2, hidden_dim=64,
            sparse_factor=4, bf16=True,
        )
        task = TSPTask(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "points": rng.random((2, 12, 2)).astype(np.float32),
            "neighbors": rng.integers(0, 12, (2, 12, 4)).astype(np.int32),
            "edge_labels": np.zeros((2, 12, 4), np.float32),
        }
        params = task.init_params(jax.random.PRNGKey(0), batch)
        heat = task.sample(
            params,
            jnp.asarray(batch["points"][0]),
            jax.random.PRNGKey(1),
            4,
            neighbors=jnp.asarray(batch["neighbors"][0]),
        )
        assert heat.shape == (4, 12, 4)
        assert np.isfinite(np.asarray(heat)).all()
