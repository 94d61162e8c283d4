"""Anisotropic edge-gated graph convnet (GatedGCN) denoiser in flax.linen.

Capability parity with the reference GNNEncoder/GNNLayer
(difusco/models/gnn_encoder.py:20-462) — same function family:
  e'_ij = A h_j + B h_i + C e_ij
  h'_i  = U h_i + Aggr_j( sigmoid(e'_ij) * V h_j )
  per-layer: LayerNorm + ReLU, time-conditioning (on edges for edge tasks,
  on nodes for node tasks), residuals, and a zero-initialized per-layer edge
  out-projection; output head GroupNorm(32) -> ReLU -> 1x1 projection.

TPU-native redesign:
- dense path: (B, V, V, H) edge tensors, pure broadcast/reduce — XLA fuses the
  gate/aggregate chain; no masking since the reference attends to all pairs
  (gnn_encoder.py:365 sets graph = ones).
- sparse path: fixed-degree neighbor layout (B, V, K) int32 + edge features
  (B, V, K, H). Message passing is gather-only (take_along_axis) + reduce over
  the K axis — no scatter, no COO bookkeeping, regular shapes for the MXU/VPU.
  Irregular graphs (MIS) pad neighbor lists to K=max degree with a mask.
- mixed precision: matmuls run in ``dtype`` (bfloat16 when enabled), all
  normalizations in float32 (the reference's GroupNorm32 policy, nn.py:17-19).
- activation checkpointing via nn.remat per layer (reference
  gnn_encoder.py:428-441 does the same with torch checkpointing).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from difusco_tpu.models import embeddings as emb


def _gather_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather node features x (B, V, H) at idx (B, V, K) -> (B, V, K, H)."""
    B, V, H = x.shape
    K = idx.shape[-1]
    flat = jnp.take_along_axis(
        x, idx.reshape(B, V * K, 1).astype(jnp.int32), axis=1
    )
    return flat.reshape(B, V, K, H)


class GNNLayer(nn.Module):
    """One GatedGCN layer (reference gnn_encoder.py:20-191, mode='direct').

    Residuals are applied by the caller (the encoder interleaves time
    injection between the conv and the residual, gnn_encoder.py:373-379).
    """

    hidden_dim: int
    aggregation: str = "sum"
    sparse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, e, neighbors=None, mask=None):
        H = self.hidden_dim
        dense = lambda name: nn.Dense(H, dtype=self.dtype, name=name)
        Uh = dense("U")(h)  # (B, V, H)
        Vh = dense("V")(h)
        Ah = dense("A")(h)
        Bh = dense("B")(h)
        Ce = dense("C")(e)  # (B,V,V,H) or (B,V,K,H)

        if not self.sparse:
            # e'[b,i,j] = Ah[b,j] + Bh[b,i] + Ce[b,i,j]
            e_new = Ah[:, None, :, :] + Bh[:, :, None, :] + Ce
            gates = jax.nn.sigmoid(e_new)
            msgs = gates * Vh[:, None, :, :]  # (B, V, V, H)
            if self.aggregation == "mean":
                agg = jnp.mean(msgs, axis=2)
            elif self.aggregation == "max":
                agg = jnp.max(msgs, axis=2)
            else:
                agg = jnp.sum(msgs, axis=2)
        else:
            # neighbors (B, V, K): j = neighbors[b, i, k]
            Ah_n = _gather_nodes(Ah, neighbors)
            Vh_n = _gather_nodes(Vh, neighbors)
            e_new = Ah_n + Bh[:, :, None, :] + Ce
            gates = jax.nn.sigmoid(e_new)
            if mask is not None:
                gates = gates * mask[..., None].astype(gates.dtype)
            msgs = gates * Vh_n  # (B, V, K, H)
            if self.aggregation == "mean":
                if mask is not None:
                    deg = jnp.maximum(mask.sum(-1, keepdims=True), 1.0)
                    agg = msgs.sum(axis=2) / deg[..., None].astype(msgs.dtype).squeeze(2)
                else:
                    agg = jnp.mean(msgs, axis=2)
            elif self.aggregation == "max":
                if mask is not None:
                    neg = jnp.asarray(-jnp.inf, msgs.dtype)
                    msgs = jnp.where(mask[..., None] > 0, msgs, neg)
                agg = jnp.max(msgs, axis=2)
            else:
                agg = jnp.sum(msgs, axis=2)

        h_new = Uh + agg

        # LayerNorm in fp32 (mixed-precision policy), then ReLU.
        ln_h = nn.LayerNorm(dtype=jnp.float32, name="norm_h")
        ln_e = nn.LayerNorm(dtype=jnp.float32, name="norm_e")
        h_out = jax.nn.relu(ln_h(h_new)).astype(self.dtype)
        e_out = jax.nn.relu(ln_e(e_new)).astype(self.dtype)
        return h_out, e_out


class _PerLayerOut(nn.Module):
    """LayerNorm -> SiLU -> zero-init Dense (reference gnn_encoder.py:339-347)."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, e):
        e = nn.LayerNorm(dtype=jnp.float32)(e)
        e = jax.nn.silu(e).astype(self.dtype)
        return nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(e)


class _TimeLayer(nn.Module):
    """ReLU -> Dense(time_dim -> H) (reference gnn_encoder.py:329-337)."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb):
        return nn.Dense(self.hidden_dim, dtype=self.dtype)(jax.nn.relu(temb))


class _LayerBlock(nn.Module):
    """Conv + time-injection + residuals, the remat unit
    (mirrors run_sparse_layer, reference gnn_encoder.py:274-287)."""

    hidden_dim: int
    aggregation: str
    sparse: bool
    time_on_edges: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, e, temb, neighbors=None, mask=None):
        x_in, e_in = x, e
        x, e = GNNLayer(
            self.hidden_dim, self.aggregation, self.sparse, self.dtype, name="conv"
        )(x, e, neighbors=neighbors, mask=mask)
        t = _TimeLayer(self.hidden_dim, self.dtype, name="time")(temb)
        if self.time_on_edges:
            if self.sparse:
                e = e + t[:, None, None, :]
            else:
                e = e + t[:, None, None, :]
            x = x_in + x
        else:
            x = x_in + x + t[:, None, :]
        e = e_in + _PerLayerOut(self.hidden_dim, self.dtype, name="out")(e)
        return x, e


class _OutHead(nn.Module):
    """GroupNorm(32, fp32) -> ReLU -> 1x1 projection
    (reference gnn_encoder.py:316-322; the final projection is NOT
    zero-initialized — the reference comments out zero_module)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        feats = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(feats)
        feats = jax.nn.relu(feats)
        return nn.Dense(self.out_channels, dtype=jnp.float32)(feats)


class GNNDenoiser(nn.Module):
    """The full denoiser (reference GNNEncoder, gnn_encoder.py:290-462).

    Three entry modes, all channels-last:
      dense edge task:  __call__(t, points=(B,V,2), xt=(B,V,V))
                        -> (B, V, V, out_channels)
      sparse edge task: __call__(t, points=(B,V,2), xt=(B,V,K),
                        neighbors=(B,V,K)) -> (B, V, K, out_channels)
      node task:        __call__(t, xt=(B,V), neighbors=(B,V,K), mask=(B,V,K))
                        -> (B, V, out_channels)
    """

    n_layers: int = 12
    hidden_dim: int = 256
    out_channels: int = 2
    aggregation: str = "sum"
    sparse: bool = False
    node_feature_only: bool = False
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t, xt, points=None, neighbors=None, mask=None,
                 xt_binary: bool = False):
        """``xt_binary=True`` declares xt ∈ {0, 1} exactly (always true in
        the categorical denoise scan): the sinusoidal embed + its (N, H)x
        (H, H) matmul collapse to a 2-row table select — same function, same
        params, ~one full layer of FLOPs and 3 edge-tensor HBM passes saved
        per step."""
        H = self.hidden_dim
        time_dim = H // 2

        if self.node_feature_only:
            # node labels -> sinusoidal embed -> linear (gnn_encoder.py:404-405)
            node_dense = nn.Dense(H, dtype=self.dtype, name="node_embed")
            if xt_binary:
                tab = node_dense(
                    emb.scalar_embedding_sine(
                        jnp.asarray([0.0, 1.0], jnp.float32), H
                    ).astype(self.dtype)
                )  # (2, H)
                x = jnp.where(xt[..., None] > 0.5, tab[1], tab[0])
            else:
                x = node_dense(emb.scalar_embedding_sine(xt, H).astype(self.dtype))
            B, V = xt.shape
            K = neighbors.shape[-1]
            e = jnp.zeros((B, V, K, H), self.dtype)
        else:
            x = nn.Dense(H, dtype=self.dtype, name="node_embed")(
                emb.position_embedding_sine(points, H).astype(self.dtype)
            )
            edge_dense = nn.Dense(H, dtype=self.dtype, name="edge_embed")
            if xt_binary:
                tab = edge_dense(
                    emb.scalar_embedding_sine(
                        jnp.asarray([0.0, 1.0], jnp.float32), H
                    ).astype(self.dtype)
                )  # (2, H)
                e = jnp.where(xt[..., None] > 0.5, tab[1], tab[0])
            else:
                e = edge_dense(emb.scalar_embedding_sine(xt, H).astype(self.dtype))

        temb = emb.timestep_embedding(t, H)
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_1")(temb)
        temb = nn.Dense(time_dim, dtype=self.dtype, name="time_embed_2")(
            jax.nn.relu(temb)
        )

        block_cls = _LayerBlock
        if self.use_checkpoint:
            block_cls = nn.remat(_LayerBlock, static_argnums=())

        for i in range(self.n_layers):
            block = block_cls(
                hidden_dim=H,
                aggregation=self.aggregation,
                sparse=self.sparse or self.node_feature_only,
                time_on_edges=not self.node_feature_only,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            x, e = block(x, e, temb, neighbors, mask)

        head = _OutHead(self.out_channels, self.dtype, name="out_head")
        if self.node_feature_only:
            return head(x.astype(jnp.float32))
        return head(e.astype(jnp.float32))
