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
