"""Round-trip tests for the reference-checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from difusco_tpu.convert import (
    load_reference_checkpoint,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from difusco_tpu.models.gnn import GNNDenoiser


def _init_params(L=2, H=64, C=2):
    key = jax.random.PRNGKey(0)
    model = GNNDenoiser(n_layers=L, hidden_dim=H, out_channels=C)
    pts = jax.random.uniform(key, (1, 8, 2))
    xt = jnp.zeros((1, 8, 8))
    t = jnp.ones((1,))
    return model, model.init(key, t, xt, points=pts)


class TestConverter:
    def test_round_trip_identity(self):
        model, params = _init_params()
        sd = params_to_torch_state_dict(params, n_layers=2)
        back = torch_state_dict_to_params(sd, n_layers=2)
        flat_a = jax.tree.leaves(params)
        flat_b = jax.tree.leaves(back)
        assert len(flat_a) == len(flat_b)
        # trees must be structurally identical and numerically equal
        ref = jax.tree.structure(jax.tree.map(np.asarray, params))
        got = jax.tree.structure(back)
        assert ref == got
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_converted_params_run_the_model(self):
        model, params = _init_params()
        sd = params_to_torch_state_dict(params, n_layers=2)
        back = torch_state_dict_to_params(sd, n_layers=2)
        back = jax.tree.map(jnp.asarray, back)
        key = jax.random.PRNGKey(1)
        pts = jax.random.uniform(key, (1, 8, 2))
        xt = jax.random.bernoulli(key, 0.5, (1, 8, 8)).astype(jnp.float32)
        t = jnp.ones((1,))
        a = model.apply(params, t, xt, points=pts)
        b = model.apply(back, t, xt, points=pts)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_load_torch_serialized_ckpt(self, tmp_path):
        """End-to-end through torch serialization with the PL 'state_dict'
        wrapper and 'model.' prefixes, as the reference ckpts are laid out."""
        model, params = _init_params()
        sd = params_to_torch_state_dict(params, n_layers=2)
        torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
        path = str(tmp_path / "ref.ckpt")
        torch.save({"state_dict": torch_sd, "epoch": 3}, path)
        loaded = load_reference_checkpoint(path, n_layers=2)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shapes_match_reference_convention(self):
        """torch Linear stores (out, in); conv head stores (C, H, 1, 1)."""
        model, params = _init_params(H=64, C=2)
        sd = params_to_torch_state_dict(params, n_layers=2)
        assert sd["model.node_embed.weight"].shape == (64, 64)
        assert sd["model.time_embed.0.weight"].shape == (32, 64)  # H/2 x H
        assert sd["model.out.2.weight"].shape == (2, 64, 1, 1)
        assert sd["model.layers.0.U.weight"].shape == (64, 64)
        assert sd["model.per_layer_out.0.2.weight"].shape == (64, 64)
