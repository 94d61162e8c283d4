"""MIS task: node-level diffusion training, sampling, and greedy decoding.

Capability parity with reference ``MISModel`` (difusco/pl_mis_model.py):
- node labels one-hot, per-graph t, +/-1 rescale with 5% jitter, CE/MSE
  losses (pl_mis_model.py:43-110)
- inference: denoise node labels, greedy decode each sample, best = MAX set
  size (pl_mis_model.py:142-209)

TPU-native redesign: graphs use the padded fixed-degree layout (neighbors +
edge mask + node mask) so variable-size graphs batch with static shapes;
losses and decoding are masked accordingly (the reference's PyG
disjoint-union batching has no padding, so no masking — semantics match on
real nodes). The denoise loop is one lax.scan; decode is the on-device
greedy scan, vmapped over samples.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from difusco_tpu import diffusion as dfn
from difusco_tpu.config import Config
from difusco_tpu.models.gnn import GNNDenoiser
from difusco_tpu.ops.mis_decode import mis_decode_batch


class MISTask:
    def __init__(self, cfg: Config):
        cfg.validate()
        self.cfg = cfg
        self.model = GNNDenoiser(
            n_layers=cfg.n_layers,
            hidden_dim=cfg.hidden_dim,
            out_channels=cfg.out_channels,
            aggregation=cfg.aggregation,
            sparse=True,
            node_feature_only=True,
            use_checkpoint=cfg.use_activation_checkpoint,
            dtype=jnp.bfloat16 if (cfg.bf16 or cfg.fp16) else jnp.float32,
        )
        if cfg.diffusion_type == "categorical":
            self.sched = dfn.categorical_schedule(
                cfg.diffusion_steps, cfg.diffusion_schedule
            )
        else:
            self.sched = dfn.gaussian_schedule(
                cfg.diffusion_steps, cfg.diffusion_schedule
            )
        self.time_pairs = jnp.asarray(
            dfn.inference_time_pairs(
                cfg.inference_schedule,
                cfg.diffusion_steps,
                cfg.inference_diffusion_steps,
            )
        )
        self.sample = jax.jit(self._sample, static_argnames=("n_samples",))

    def init_params(self, key, batch):
        t = jnp.ones((1,), jnp.float32)
        xt = jnp.asarray(batch["labels"][:1])
        nbrs = jnp.asarray(batch["neighbors"][:1])
        mask = jnp.asarray(batch["mask"][:1])
        return self.model.init(key, t, xt, neighbors=nbrs, mask=mask)

    # -- training -----------------------------------------------------------

    def loss_fn(self, params, batch, key) -> jax.Array:
        cfg = self.cfg
        labels = batch["labels"]  # (B, V) 0/1 float
        node_mask = batch["node_mask"]  # (B, V)
        B = labels.shape[0]
        kt, kx, kj = jax.random.split(key, 3)
        t = jax.random.randint(kt, (B,), 1, cfg.diffusion_steps + 1)

        if cfg.diffusion_type == "categorical":
            xt = dfn.categorical_q_sample(self.sched, labels, t, kx)
            xt = xt * 2.0 - 1.0
            xt = xt * (1.0 + 0.05 * jax.random.uniform(kj, xt.shape))
            logits = self.model.apply(
                params,
                t.astype(jnp.float32),
                xt,
                neighbors=batch["neighbors"],
                mask=batch["mask"],
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32)
            )
            return jnp.sum(ce * node_mask) / jnp.sum(node_mask)

        x0 = labels * 2.0 - 1.0
        x0 = x0 * (1.0 + 0.05 * jax.random.uniform(kj, x0.shape))
        xt, eps = dfn.gaussian_q_sample(self.sched, x0, t, kx)
        pred = self.model.apply(
            params,
            t.astype(jnp.float32),
            xt,
            neighbors=batch["neighbors"],
            mask=batch["mask"],
        )[..., 0]
        se = (pred - eps) ** 2
        return jnp.sum(se * node_mask) / jnp.sum(node_mask)

    # -- sampling -----------------------------------------------------------

    def _sample(self, params, neighbors, mask, key, n_samples: int):
        """Denoise node labels for ONE graph -> (S, V) heatmaps."""
        cfg = self.cfg
        S = n_samples
        V = neighbors.shape[0]
        nbrs = jnp.broadcast_to(neighbors[None], (S,) + neighbors.shape)
        msk = jnp.broadcast_to(mask[None], (S,) + mask.shape)
        kx, kloop = jax.random.split(key)

        def apply(t_scalar, xt, xt_binary=False):
            t_vec = jnp.full((S,), t_scalar, jnp.float32)
            return self.model.apply(params, t_vec, xt, neighbors=nbrs, mask=msk,
                                    xt_binary=xt_binary)

        if cfg.diffusion_type == "categorical":
            xt = (jax.random.normal(kx, (S, V)) > 0).astype(jnp.float32)

            def step(carry, pair):
                xt, key = carry
                key, sub = jax.random.split(key)
                # xt is exactly {0,1} throughout the categorical chain
                probs = jax.nn.softmax(apply(pair[0], xt, xt_binary=True), axis=-1)
                xt = dfn.categorical_posterior(
                    self.sched, pair[0], pair[1], probs, xt, sub
                )
                return (xt, key), None

            (xt, _), _ = jax.lax.scan(step, (xt, kloop), self.time_pairs)
            return xt + 1e-6

        xt = jax.random.normal(kx, (S, V))
        use_ddim = cfg.inference_trick == "ddim"

        def step(carry, pair):
            xt, key = carry
            key, sub = jax.random.split(key)
            pred = apply(pair[0], xt)[..., 0]
            xt = dfn.gaussian_posterior(
                self.sched, pair[0], pair[1], pred, xt, sub, use_ddim
            )
            return (xt, key), None

        (xt, _), _ = jax.lax.scan(step, (xt, kloop), self.time_pairs)
        return xt * 0.5 + 0.5

    # -- decoding / evaluation ---------------------------------------------

    def decode(self, heatmaps, neighbors, mask, node_mask):
        """Greedy decode each sample; padded nodes are forced last and
        contribute nothing. Returns (S, V) 0/1 indicators."""
        pred = jnp.where(node_mask[None, :] > 0, heatmaps, -jnp.inf)
        sols = mis_decode_batch(pred, neighbors, mask)
        return sols * node_mask[None, :].astype(sols.dtype)

    def evaluate_instance(
        self, params, example: Dict[str, np.ndarray], key
    ) -> Dict[str, float]:
        cfg = self.cfg
        nbrs = jnp.asarray(example["neighbors"])
        mask = jnp.asarray(example["mask"])
        node_mask = jnp.asarray(example["node_mask"])
        sols = []
        heats = []
        for s in range(cfg.sequential_sampling):
            heat = self.sample(
                params, nbrs, mask, jax.random.fold_in(key, s), cfg.parallel_sampling
            )
            heats.append(heat)
            sols.append(self.decode(heat, nbrs, mask, node_mask))
        sols = jnp.concatenate(sols, axis=0)
        sizes = jnp.sum(sols, axis=-1)
        best = float(jnp.max(sizes))
        gt = float(np.sum(example["labels"] * example["node_mask"]))
        out = {"solved_cost": best, "gt_cost": gt}
        if cfg.mis_local_search_rounds > 0:
            # refine every sampled chain with the on-device ILS
            # (ops/mis_local_search.py) — the node-task analog of the 2-opt
            # pass the TSP decode applies after merge
            from difusco_tpu.ops.mis_local_search import mis_local_search_device

            heats = jnp.concatenate(heats, axis=0)
            R = max(cfg.mis_local_search_replicas, 1)
            heats = jnp.repeat(heats, R, axis=0)
            sols_r = jnp.repeat(sols, R, axis=0)
            S = heats.shape[0]
            keys = jax.random.split(jax.random.fold_in(key, 10_007), S)
            refined = jax.vmap(
                lambda x, p, k: mis_local_search_device(
                    x, p, nbrs, mask, node_mask, k,
                    rounds=cfg.mis_local_search_rounds,
                )
            )(sols_r, heats, keys)
            refined = refined * node_mask[None, :].astype(refined.dtype)
            out["solved_cost_ls"] = float(jnp.max(jnp.sum(refined, -1)))
        return out
