"""Tests for the GatedGCN denoiser and embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difusco_tpu.models import embeddings as emb
from difusco_tpu.models.gnn import GNNDenoiser


class TestEmbeddings:
    def test_timestep_embedding_structure(self):
        t = jnp.array([0.0, 1.0, 500.0])
        e = emb.timestep_embedding(t, 256)
        assert e.shape == (3, 256)
        # t=0 -> cos half all ones, sin half all zeros (cos first, nn.py:118)
        np.testing.assert_allclose(np.asarray(e[0, :128]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(e[0, 128:]), 0.0, atol=1e-6)
        # lowest frequency is 1.0 -> first sin entry is sin(t)
        assert float(e[1, 128]) == pytest.approx(np.sin(1.0), abs=1e-5)

    def test_scalar_embedding_interleave(self):
        x = jnp.array([[0.5]])
        e = emb.scalar_embedding_sine(x, 8)
        # out[2k] = sin(x / 10000^(2k/8)), out[2k+1] = cos(same freq)
        expected = []
        for k in range(4):
            f = 10000 ** (2 * k / 8)
            expected += [np.sin(0.5 / f), np.cos(0.5 / f)]
        np.testing.assert_allclose(np.asarray(e[0, 0]), expected, rtol=1e-5)

    def test_position_embedding_shape_and_halves(self):
        pts = jax.random.uniform(jax.random.PRNGKey(0), (2, 5, 2))
        e = emb.position_embedding_sine(pts, 64)
        assert e.shape == (2, 5, 64)
        # first half comes from coordinate 0 ("y"), second from coordinate 1
        e_swap = emb.position_embedding_sine(pts[..., ::-1], 64)
        np.testing.assert_allclose(
            np.asarray(e[..., :32]), np.asarray(e_swap[..., 32:]), atol=1e-6
        )


def _make_dense(key, B=2, V=10, **kw):
    model = GNNDenoiser(n_layers=2, hidden_dim=64, out_channels=2, **kw)
    pts = jax.random.uniform(key, (B, V, 2))
    xt = jax.random.bernoulli(key, 0.5, (B, V, V)).astype(jnp.float32)
    t = jnp.array([5.0] * B)
    params = model.init(key, t, xt, points=pts)
    return model, params, (t, xt, pts)


class TestDenseModel:
    def test_forward_shapes(self):
        key = jax.random.PRNGKey(0)
        model, params, (t, xt, pts) = _make_dense(key)
        out = model.apply(params, t, xt, points=pts)
        assert out.shape == (2, 10, 10, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_binary_embed_fast_path_matches(self):
        """xt_binary=True (2-row embed table select, used by the categorical
        denoise scan) must reproduce the full sinusoidal-embed forward on
        {0,1} inputs with the same params."""
        key = jax.random.PRNGKey(11)
        model, params, (t, xt, pts) = _make_dense(key)
        ref = model.apply(params, t, xt, points=pts)
        fast = model.apply(params, t, xt, points=pts, xt_binary=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_param_count_formula(self):
        """Parameter count must match the reference architecture closed-form.

        Per layer: 5 conv linears (H^2+H), 2 LayerNorms (2H), time layer
        (H/2*H + H), per-layer-out LN + Linear (2H + H^2+H).
        Encoder: node/edge embed (2*(H^2+H)), time MLP (H*H/2+H/2 +
        (H/2)^2+H/2), head GroupNorm (2H) + out proj (H*C+C).
        (reference gnn_encoder.py:294-347)
        """
        H, L, C = 64, 2, 2
        key = jax.random.PRNGKey(0)
        _, params, _ = _make_dense(key)
        n = sum(x.size for x in jax.tree.leaves(params))
        per_layer = 5 * (H * H + H) + 2 * (2 * H) + (H // 2 * H + H) + (2 * H + H * H + H)
        encoder = (
            2 * (H * H + H)
            + (H * (H // 2) + H // 2)
            + ((H // 2) * (H // 2) + H // 2)
            + 2 * H
            + (H * C + C)
        )
        assert n == L * per_layer + encoder

    def test_zero_init_per_layer_out(self):
        """At init the per-layer out projection is zero, so with n_layers
        layers the edge stream should equal embed + sum of time injections;
        verify the out head input path is running by comparing 1 vs 2 layer
        models fed identical inputs differ only via the x-residual path."""
        key = jax.random.PRNGKey(0)
        model, params, (t, xt, pts) = _make_dense(key)
        # per-layer out Dense kernels must be zeros at init
        for i in range(2):
            k = params["params"][f"layer_{i}"]["out"]["Dense_0"]["kernel"]
            assert float(jnp.abs(k).max()) == 0.0

    def test_jit_and_grad(self):
        key = jax.random.PRNGKey(1)
        model, params, (t, xt, pts) = _make_dense(key)

        @jax.jit
        def loss_fn(p):
            out = model.apply(p, t, xt, points=pts)
            return jnp.mean(out**2)

        g = jax.grad(loss_fn)(params)
        norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
        assert all(np.isfinite(norms))
        # At init the zero per-layer-out kernels block gradients into the conv
        # weights (the edge stream is frozen at its embedding; reference
        # zero_module behavior). But gradients must reach the zero kernels
        # themselves and the edge embedding through the residual path.
        g_out = g["params"]["layer_0"]["out"]["Dense_0"]["kernel"]
        g_embed = g["params"]["edge_embed"]["kernel"]
        assert float(jnp.abs(g_out).max()) > 0
        assert float(jnp.abs(g_embed).max()) > 0

    def test_permutation_equivariance(self):
        """Dense GatedGCN must be equivariant to node relabeling:
        f(P x, P xt P^T)[i,j] = f(x, xt)[perm_i, perm_j]."""
        key = jax.random.PRNGKey(2)
        model, params, (t, xt, pts) = _make_dense(key, B=1, V=8)
        out = model.apply(params, t, xt, points=pts)
        perm = np.array([3, 1, 7, 0, 2, 6, 4, 5])
        out_p = model.apply(
            params, t, xt[:, perm][:, :, perm], points=pts[:, perm]
        )
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out[:, perm][:, :, perm]), atol=2e-4
        )

    @pytest.mark.parametrize("agg", ["mean", "max"])
    def test_aggregations_run(self, agg):
        key = jax.random.PRNGKey(3)
        model, params, (t, xt, pts) = _make_dense(key, aggregation=agg)
        out = model.apply(params, t, xt, points=pts)
        assert np.isfinite(np.asarray(out)).all()


class TestSparseModel:
    def _make(self, key, B=2, V=12, K=4, **kw):
        model = GNNDenoiser(
            n_layers=2, hidden_dim=64, out_channels=2, sparse=True, **kw
        )
        pts = jax.random.uniform(key, (B, V, 2))
        xt = jax.random.bernoulli(key, 0.5, (B, V, K)).astype(jnp.float32)
        nbrs = jax.random.randint(key, (B, V, K), 0, V)
        t = jnp.array([5.0] * B)
        params = model.init(key, t, xt, points=pts, neighbors=nbrs)
        return model, params, (t, xt, pts, nbrs)

    def test_forward_shapes(self):
        key = jax.random.PRNGKey(0)
        model, params, (t, xt, pts, nbrs) = self._make(key)
        out = model.apply(params, t, xt, points=pts, neighbors=nbrs)
        assert out.shape == (2, 12, 4, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_sparse_matches_dense_on_full_graph(self):
        """A sparse model whose neighbor list enumerates ALL nodes must
        compute exactly the dense model's function (same params)."""
        key = jax.random.PRNGKey(4)
        B, V = 1, 6
        dense_model, params, (t, xt, pts) = _make_dense(key, B=B, V=V)
        sparse_model = GNNDenoiser(
            n_layers=2, hidden_dim=64, out_channels=2, sparse=True
        )
        # neighbors[i] = [0..V-1] for every i -> same message structure
        nbrs = jnp.tile(jnp.arange(V)[None, None, :], (B, V, 1))
        out_d = dense_model.apply(params, t, xt, points=pts)
        out_s = sparse_model.apply(params, t, xt, points=pts, neighbors=nbrs)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d), atol=2e-4)

    def test_checkpointing_matches(self):
        key = jax.random.PRNGKey(5)
        model, params, (t, xt, pts, nbrs) = self._make(key)
        model_ckpt = GNNDenoiser(
            n_layers=2, hidden_dim=64, out_channels=2, sparse=True,
            use_checkpoint=True,
        )
        out = model.apply(params, t, xt, points=pts, neighbors=nbrs)
        out_c = model_ckpt.apply(params, t, xt, points=pts, neighbors=nbrs)
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out), atol=1e-6)


class TestNodeModel:
    def test_mis_forward(self):
        key = jax.random.PRNGKey(6)
        B, V, K = 2, 10, 5
        model = GNNDenoiser(
            n_layers=2, hidden_dim=64, out_channels=2, node_feature_only=True
        )
        xt = jax.random.bernoulli(key, 0.5, (B, V)).astype(jnp.float32)
        nbrs = jax.random.randint(key, (B, V, K), 0, V)
        mask = jnp.ones((B, V, K))
        t = jnp.array([3.0, 7.0])
        params = model.init(key, t, xt, neighbors=nbrs, mask=mask)
        out = model.apply(params, t, xt, neighbors=nbrs, mask=mask)
        assert out.shape == (B, V, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_node_binary_embed_fast_path_matches(self):
        key = jax.random.PRNGKey(6)
        B, V, K = 2, 10, 5
        model = GNNDenoiser(
            n_layers=2, hidden_dim=64, out_channels=2, node_feature_only=True
        )
        xt = jax.random.bernoulli(key, 0.5, (B, V)).astype(jnp.float32)
        nbrs = jax.random.randint(key, (B, V, K), 0, V)
        mask = jnp.ones((B, V, K))
        t = jnp.array([3.0, 7.0])
        params = model.init(key, t, xt, neighbors=nbrs, mask=mask)
        ref = model.apply(params, t, xt, neighbors=nbrs, mask=mask)
        fast = model.apply(params, t, xt, neighbors=nbrs, mask=mask,
                           xt_binary=True)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_mask_blocks_messages(self):
        """Padded (masked-out) neighbors must not influence the output."""
        key = jax.random.PRNGKey(7)
        B, V, K = 1, 8, 4
        model = GNNDenoiser(
            n_layers=2, hidden_dim=64, out_channels=1, node_feature_only=True
        )
        xt = jax.random.bernoulli(key, 0.5, (B, V)).astype(jnp.float32)
        nbrs = jax.random.randint(key, (B, V, K), 0, V)
        mask = jnp.ones((B, V, K)).at[:, :, -1].set(0.0)
        t = jnp.array([3.0])
        params = model.init(key, t, xt, neighbors=nbrs, mask=mask)
        out1 = model.apply(params, t, xt, neighbors=nbrs, mask=mask)
        # scramble the masked neighbor column; output must not change
        nbrs2 = nbrs.at[:, :, -1].set((nbrs[:, :, -1] + 3) % V)
        out2 = model.apply(params, t, xt, neighbors=nbrs2, mask=mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


class TestPrecision:
    def test_bf16_forward_close_to_fp32(self):
        key = jax.random.PRNGKey(8)
        model, params, (t, xt, pts) = _make_dense(key)
        model_bf16 = GNNDenoiser(
            n_layers=2, hidden_dim=64, out_channels=2, dtype=jnp.bfloat16
        )
        out32 = model.apply(params, t, xt, points=pts)
        out16 = model_bf16.apply(params, t, xt, points=pts)
        assert out16.dtype == jnp.float32  # head always fp32
        err = np.abs(np.asarray(out16) - np.asarray(out32)).max()
        assert err < 0.15, f"bf16 deviates too much: {err}"
