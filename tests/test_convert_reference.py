"""Behavioral converter-parity tests against the ACTUAL reference model.

The round-trip tests in test_convert.py prove the weight mapping is
invertible; these tests prove it is *correct*: a weight tree exported with
``params_to_torch_state_dict`` loaded into the reference
``GNNEncoder`` (/root/reference/difusco/models/gnn_encoder.py:290-462)
produces the same outputs as the flax ``GNNDenoiser`` — for all three
forward modes (dense edge, sparse edge, node-feature-only) — so a reference
user can bring their pretrained checkpoints and get the same function.

The reference imports ``torch_sparse`` (not installed here); only three
aggregation helpers and a COO container are used (gnn_encoder.py:14-17,
177-191), so a minimal shim is injected before import.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/difusco"


def _install_torch_sparse_shim():
    """Minimal stand-in for the torch_sparse API surface the reference uses:
    SparseTensor(row, col, value, sparse_sizes) + sum/mean/max over dim=1
    (aggregate `value` rows grouped by `row`)."""
    if "torch_sparse" in sys.modules:
        return

    class SparseTensor:
        def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
            self.row, self.col, self.value = row, col, value
            self.sparse_sizes = sparse_sizes

        def to(self, device):
            return self

        def size(self, dim):
            return self.sparse_sizes[dim]

    def _agg(sp, dim, how):
        assert dim == 1
        n = sp.sparse_sizes[0]
        val = sp.value
        if val.dim() == 1:
            val = val[:, None]
        out_shape = (n,) + val.shape[1:]
        idx = sp.row.long()
        if how == "sum" or how == "mean":
            out = torch.zeros(out_shape, dtype=val.dtype)
            out.index_add_(0, idx, val)
            if how == "mean":
                cnt = torch.zeros(n, dtype=val.dtype)
                cnt.index_add_(0, idx, torch.ones_like(idx, dtype=val.dtype))
                out = out / cnt.clamp(min=1)[:, None]
            return out
        out = torch.full(out_shape, float("-inf"), dtype=val.dtype)
        out.index_reduce_(0, idx, val, "amax", include_self=True)
        return torch.where(torch.isinf(out), torch.zeros_like(out), out)

    mod = types.ModuleType("torch_sparse")
    mod.SparseTensor = SparseTensor
    mod.sum = lambda sp, dim=1: _agg(sp, dim, "sum")
    mod.mean = lambda sp, dim=1: _agg(sp, dim, "mean")
    mod.max = lambda sp, dim=1: _agg(sp, dim, "max")
    sys.modules["torch_sparse"] = mod


def _load_reference_encoder():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference source not available")
    _install_torch_sparse_shim()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    from models.gnn_encoder import GNNEncoder  # noqa: E402

    return GNNEncoder


def _make_pair(L=3, H=64, C=2, sparse=False, node_feature_only=False, seed=0):
    """Build (flax model+params, reference model with the SAME weights)."""
    import jax
    import jax.numpy as jnp

    from difusco_tpu.convert import params_to_torch_state_dict
    from difusco_tpu.models.gnn import GNNDenoiser

    GNNEncoder = _load_reference_encoder()

    model = GNNDenoiser(
        n_layers=L, hidden_dim=H, out_channels=C,
        sparse=sparse, node_feature_only=node_feature_only,
    )
    key = jax.random.PRNGKey(seed)
    if node_feature_only:
        V, K = 12, 4
        xt = jnp.zeros((1, V))
        nbr = jnp.zeros((1, V, K), jnp.int32)
        params = model.init(key, jnp.ones((1,)), xt, neighbors=nbr,
                            mask=jnp.ones((1, V, K)))
    elif sparse:
        V, K = 12, 4
        pts = jax.random.uniform(key, (1, V, 2))
        xt = jnp.zeros((1, V, K))
        nbr = jnp.zeros((1, V, K), jnp.int32)
        params = model.init(key, jnp.ones((1,)), xt, points=pts, neighbors=nbr)
    else:
        pts = jax.random.uniform(key, (1, 8, 2))
        params = model.init(key, jnp.ones((1,)), jnp.zeros((1, 8, 8)), points=pts)

    # Perturb the zero-initialized per-layer out projections so the
    # differential test exercises every weight (zeros would hide mapping bugs).
    def _perturb(path, x):
        name = "/".join(str(p.key) for p in path)
        if "out" in name and "kernel" in name and "out_head" not in name:
            return jax.random.normal(jax.random.PRNGKey(hash(name) % 2**31),
                                     x.shape) * 0.05
        return x

    params = jax.tree_util.tree_map_with_path(_perturb, params)

    ref = GNNEncoder(
        n_layers=L, hidden_dim=H, out_channels=C, aggregation="sum",
        norm="layer", learn_norm=True, track_norm=False, gated=True,
        sparse=sparse or node_feature_only,
        use_activation_checkpoint=False,
        node_feature_only=node_feature_only,
    )
    sd = params_to_torch_state_dict(params, n_layers=L)
    sd = {k[len("model."):]: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in sd.items()}
    missing, unexpected = ref.load_state_dict(sd, strict=True), None
    ref.eval()
    return model, params, ref


class TestReferenceParityDense:
    def test_dense_forward_matches(self):
        import jax
        import jax.numpy as jnp

        model, params, ref = _make_pair(L=3, H=64, C=2, seed=0)
        rng = np.random.default_rng(0)
        B, V = 2, 8
        pts = rng.random((B, V, 2)).astype(np.float32)
        xt = rng.standard_normal((B, V, V)).astype(np.float32)
        t = np.array([17.0, 493.0], np.float32)

        ours = model.apply(params, jnp.asarray(t), jnp.asarray(xt),
                           points=jnp.asarray(pts))  # (B,V,V,C)
        with torch.no_grad():
            theirs = ref(torch.from_numpy(pts), torch.from_numpy(t),
                         graph=torch.from_numpy(xt))  # (B,C,V,V)
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs,
                                   rtol=2e-4, atol=2e-4)


class TestReferenceParitySparse:
    def test_sparse_edge_forward_matches(self):
        """Fixed-degree (V,K) layout vs the reference's COO edge list:
        same edges in the same row-major order -> same per-edge logits."""
        import jax.numpy as jnp

        model, params, ref = _make_pair(L=3, H=64, C=2, sparse=True, seed=1)
        rng = np.random.default_rng(1)
        V, K = 12, 4
        pts = rng.random((V, 2)).astype(np.float32)
        # kNN-style neighbor table (no self edges)
        d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        nbr = np.argsort(d, axis=1)[:, :K].astype(np.int32)
        xt = rng.standard_normal((V, K)).astype(np.float32)
        t_scalar = 250.0

        ours = model.apply(
            params, jnp.asarray([t_scalar]), jnp.asarray(xt[None]),
            points=jnp.asarray(pts[None]), neighbors=jnp.asarray(nbr[None]),
        )  # (1, V, K, C)
        ours = np.asarray(ours).reshape(V * K, -1)

        # reference edge order: edge (i,k) -> row i, col nbr[i,k]
        rows = np.repeat(np.arange(V), K)
        cols = nbr.reshape(-1)
        edge_index = torch.from_numpy(np.stack([rows, cols]).astype(np.int64))
        with torch.no_grad():
            theirs = ref(
                torch.from_numpy(pts),
                torch.full((V * K,), t_scalar),
                graph=torch.from_numpy(xt.reshape(-1)),
                edge_index=edge_index,
            )  # (E, C)
        np.testing.assert_allclose(ours, theirs.numpy(), rtol=2e-4, atol=2e-4)

    def test_node_feature_only_matches(self):
        """MIS path: node-label diffusion with padded-degree mask vs the
        reference's exact edge list (gnn_encoder.py:404-414)."""
        import jax.numpy as jnp

        model, params, ref = _make_pair(
            L=3, H=64, C=2, node_feature_only=True, seed=2)
        rng = np.random.default_rng(2)
        V = 12
        # random graph, symmetric, no self loops
        adj = np.triu((rng.random((V, V)) < 0.3).astype(np.int32), 1)
        adj = adj + adj.T
        deg = adj.sum(1)
        K = int(deg.max())
        nbr = np.zeros((V, K), np.int32)
        mask = np.zeros((V, K), np.float32)
        for i in range(V):
            js = np.nonzero(adj[i])[0]
            nbr[i, : len(js)] = js
            mask[i, : len(js)] = 1.0
        xt = rng.standard_normal(V).astype(np.float32)
        t_scalar = 77.0

        ours = model.apply(
            params, jnp.asarray([t_scalar]), jnp.asarray(xt[None]),
            neighbors=jnp.asarray(nbr[None]), mask=jnp.asarray(mask[None]),
        )  # (1, V, C)
        rows, cols = np.nonzero(adj)
        edge_index = torch.from_numpy(np.stack([rows, cols]).astype(np.int64))
        with torch.no_grad():
            theirs = ref(
                torch.from_numpy(xt),
                torch.full((V,), t_scalar),
                edge_index=edge_index,
            )  # (V, C)
        np.testing.assert_allclose(np.asarray(ours)[0], theirs.numpy(),
                                   rtol=2e-4, atol=2e-4)
