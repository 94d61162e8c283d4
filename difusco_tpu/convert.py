"""Convert reference DIFUSCO PyTorch-Lightning checkpoints to this framework.

The reference ships pretrained ``.ckpt`` files (README.md:42-44) whose
state_dict follows GNNEncoder's module tree (difusco/models/gnn_encoder.py:
290-348): ``model.node_embed``, ``model.edge_embed``, ``model.time_embed.{0,2}``,
``model.layers.{i}.{U,V,A,B,C,norm_h,norm_e}``,
``model.time_embed_layers.{i}.1``, ``model.per_layer_out.{i}.{0,2}``, and the
head ``model.out.{0,2}`` (GroupNorm + 1x1 Conv2d).

This module maps that state_dict onto the flax param tree of
``GNNDenoiser`` (torch Linear weights are transposed; the head Conv2d
(C, H, 1, 1) becomes a Dense (H, C) kernel). Both directions are provided so
the mapping is round-trip tested without needing a real reference
checkpoint.

Usage:
  python -m difusco_tpu.convert --ckpt difusco_tsp50.ckpt \\
      --out checkpoints/converted_tsp50 --n_layers 12 --hidden_dim 256
"""

from __future__ import annotations

import argparse
from typing import Dict

import numpy as np


def torch_state_dict_to_params(
    sd: Dict[str, np.ndarray], n_layers: int
) -> dict:
    """Reference state_dict (numpy arrays) -> flax params pytree."""
    sd = {
        (k[len("model."):] if k.startswith("model.") else k): np.asarray(v)
        for k, v in sd.items()
    }

    def linear(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def norm(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    params = {
        "node_embed": linear("node_embed"),
        "time_embed_1": linear("time_embed.0"),
        "time_embed_2": linear("time_embed.2"),
        "out_head": {
            "GroupNorm_0": norm("out.0"),
            "Dense_0": {
                # Conv2d (C_out, H, 1, 1) -> Dense kernel (H, C_out)
                "kernel": sd["out.2.weight"][:, :, 0, 0].T,
                "bias": sd["out.2.bias"],
            },
        },
    }
    # node_feature_only flax models have no edge embedding; the reference
    # creates (and never uses) edge_embed in that mode (gnn_encoder.py:304,
    # 404-414), so the key is present in its checkpoints either way.
    if "edge_embed.weight" in sd:
        params["edge_embed"] = linear("edge_embed")
    for i in range(n_layers):
        params[f"layer_{i}"] = {
            "conv": {
                **{m: linear(f"layers.{i}.{m}") for m in "UVABC"},
                "norm_h": norm(f"layers.{i}.norm_h"),
                "norm_e": norm(f"layers.{i}.norm_e"),
            },
            "time": {"Dense_0": linear(f"time_embed_layers.{i}.1")},
            "out": {
                "LayerNorm_0": norm(f"per_layer_out.{i}.0"),
                "Dense_0": linear(f"per_layer_out.{i}.2"),
            },
        }
    return {"params": params}


def params_to_torch_state_dict(params: dict, n_layers: int) -> Dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests / exporting to the reference)."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["kernel"]).T
        sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    def put_norm(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    put_linear("model.node_embed", p["node_embed"])
    if "edge_embed" in p:
        put_linear("model.edge_embed", p["edge_embed"])
    else:
        # node_feature_only: the reference still instantiates edge_embed
        # (gnn_encoder.py:304) but never calls it — emit zeros so
        # load_state_dict(strict=True) accepts the export.
        h = np.asarray(p["node_embed"]["kernel"]).shape[1]
        sd["model.edge_embed.weight"] = np.zeros((h, h), np.float32)
        sd["model.edge_embed.bias"] = np.zeros((h,), np.float32)
    put_linear("model.time_embed.0", p["time_embed_1"])
    put_linear("model.time_embed.2", p["time_embed_2"])
    put_norm("model.out.0", p["out_head"]["GroupNorm_0"])
    k = np.asarray(p["out_head"]["Dense_0"]["kernel"]).T[:, :, None, None]
    sd["model.out.2.weight"] = k
    sd["model.out.2.bias"] = np.asarray(p["out_head"]["Dense_0"]["bias"])
    for i in range(n_layers):
        lp = p[f"layer_{i}"]
        for m in "UVABC":
            put_linear(f"model.layers.{i}.{m}", lp["conv"][m])
        put_norm(f"model.layers.{i}.norm_h", lp["conv"]["norm_h"])
        put_norm(f"model.layers.{i}.norm_e", lp["conv"]["norm_e"])
        put_linear(f"model.time_embed_layers.{i}.1", lp["time"]["Dense_0"])
        put_norm(f"model.per_layer_out.{i}.0", lp["out"]["LayerNorm_0"])
        put_linear(f"model.per_layer_out.{i}.2", lp["out"]["Dense_0"])
    return sd


def load_reference_checkpoint(path: str, n_layers: int) -> dict:
    """Load a reference .ckpt (torch serialized PL checkpoint) -> params."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return torch_state_dict_to_params(sd, n_layers)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n_layers", type=int, default=12)
    ap.add_argument("--hidden_dim", type=int, default=256)
    args = ap.parse_args(argv)

    import os

    import orbax.checkpoint as ocp

    params = load_reference_checkpoint(args.ckpt, args.n_layers)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(args.out) + "/default", params)
    n = sum(np.asarray(x).size for x in _leaves(params))
    print(f"converted {args.ckpt} -> {args.out} ({n:,} params)")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
