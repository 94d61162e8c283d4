"""Fused Pallas TPU kernel for the dense GatedGCN layer (inference path).

Motivation (measured on v5e): the XLA dense layer is HBM-bound — the
per-layer chain  e' = Ah+Bh+Ce -> sigmoid-gate -> aggregate -> LayerNorm ->
ReLU -> +time -> LayerNorm -> SiLU -> out-proj -> residual  materializes
~10 (S,V,V,H) intermediates in HBM (~550 GB/s sustained, ~1% MXU util).
This kernel computes the ENTIRE edge stream of one layer per grid step with
exactly one read of e_in and one write of e_out (plus O(V*H) node tensors),
with both HxH matmuls (C and the per-layer out-projection) on the MXU inside
the kernel.

Layout: V is padded to a multiple of 16 (bf16 sublane tile) so in-kernel
(TI, Vp, H) <-> (TI*Vp, H) reshapes are legal and the matmuls run as plain
2D GEMMs. Padded j-columns are masked out of the aggregation; padded i-rows
carry bounded garbage that is sliced off at the end.

The kernel covers inference only; training uses the XLA path (autodiff).
Numerics: bf16 tensor reads/writes, fp32 matmul accumulation and norms —
the same mixed-precision policy as the flax model.

Layer math mirrored from models/gnn.py (_LayerBlock with time_on_edges=True,
sum aggregation, reference gnn_encoder.py:94-142,339-347,373-379).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _make_kernel(TI: int, Vp: int, H: int, V: int):
    """Kernel closure with static shapes; V = number of real columns."""

    def kernel(
        e_ref,      # (1, TI, Vp, H) bf16
        ah_ref,     # (1, Vp, H)
        bh_ref,     # (1, TI, H)
        vh_ref,     # (1, Vp, H)
        tvec_ref,   # (1, 1, H)
        ck_ref,     # (H, H) bf16
        cb_ref,     # (1, H) f32
        lne_s_ref,  # (1, H)
        lne_b_ref,  # (1, H)
        ln2_s_ref,  # (1, H)
        ln2_b_ref,  # (1, H)
        wout_ref,   # (H, H) bf16
        bout_ref,   # (1, H)
        eout_ref,   # (1, TI, Vp, H) bf16
        agg_ref,    # (1, TI, H) f32
    ):
        e2d = e_ref[0].reshape(TI * Vp, H)
        ce = jnp.dot(e2d, ck_ref[...], preferred_element_type=jnp.float32)
        e_new = ce.reshape(TI, Vp, H)
        e_new = (
            e_new
            + cb_ref[0][None, None, :]
            + ah_ref[0][None, :, :].astype(jnp.float32)
            + bh_ref[0][:, None, :].astype(jnp.float32)
        )

        gates = jax.nn.sigmoid(e_new)
        jmask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, Vp, 1), 1) < V
        ).astype(jnp.float32)
        agg = jnp.sum(
            gates * vh_ref[0][None, :, :].astype(jnp.float32) * jmask, axis=1
        )
        agg_ref[0] = agg

        mu = jnp.mean(e_new, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(e_new - mu), axis=-1, keepdims=True)
        e_ln = (e_new - mu) * jax.lax.rsqrt(var + 1e-6)
        e_ln = e_ln * lne_s_ref[0][None, None, :] + lne_b_ref[0][None, None, :]
        e_mid = jax.nn.relu(e_ln) + tvec_ref[0, 0][None, None, :].astype(jnp.float32)

        mu2 = jnp.mean(e_mid, axis=-1, keepdims=True)
        var2 = jnp.mean(jnp.square(e_mid - mu2), axis=-1, keepdims=True)
        e2 = (e_mid - mu2) * jax.lax.rsqrt(var2 + 1e-6)
        e2 = e2 * ln2_s_ref[0][None, None, :] + ln2_b_ref[0][None, None, :]
        e2 = e2 * jax.nn.sigmoid(e2)  # SiLU

        proj = jnp.dot(
            e2.reshape(TI * Vp, H).astype(jnp.bfloat16),
            wout_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(TI, Vp, H) + bout_ref[0][None, None, :]

        eout_ref[0] = (e_ref[0].astype(jnp.float32) + proj).astype(eout_ref.dtype)

    return kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("n_real", "interpret", "row_tile")
)
def fused_dense_layer(
    e: jax.Array,       # (S, Vp, Vp, H) bf16, padded
    ah: jax.Array,      # (S, Vp, H)
    bh: jax.Array,      # (S, Vp, H)
    vh: jax.Array,      # (S, Vp, H)
    tvec: jax.Array,    # (S, H)
    c_kernel: jax.Array,
    c_bias: jax.Array,
    lne_scale: jax.Array,
    lne_bias: jax.Array,
    ln2_scale: jax.Array,
    ln2_bias: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    n_real: int,
    interpret: bool = False,
    row_tile: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """One fused edge-stream layer on padded tensors.

    Returns (e_out (S,Vp,Vp,H), agg (S,Vp,H) fp32); only the first
    ``n_real`` rows/cols are meaningful. ``row_tile`` sets the i-rows per
    grid step (TI): small tiles bound VMEM at large V, large tiles amortize
    grid overhead at small V (TI=Vp -> grid (S, 1)).
    """
    S, Vp, _, H = e.shape
    TI = row_tile if Vp % row_tile == 0 else Vp
    n_tiles = Vp // TI

    as2d = lambda x: x.reshape(1, -1)
    kernel = _make_kernel(TI, Vp, H, n_real)
    eout, agg = pl.pallas_call(
        kernel,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TI, Vp, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, Vp, H), lambda s, i: (s, 0, 0)),
            pl.BlockSpec((1, TI, H), lambda s, i: (s, i, 0)),
            pl.BlockSpec((1, Vp, H), lambda s, i: (s, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda s, i: (s, 0, 0)),
            pl.BlockSpec((H, H), lambda s, i: (0, 0)),
            pl.BlockSpec((1, H), lambda s, i: (0, 0)),
            pl.BlockSpec((1, H), lambda s, i: (0, 0)),
            pl.BlockSpec((1, H), lambda s, i: (0, 0)),
            pl.BlockSpec((1, H), lambda s, i: (0, 0)),
            pl.BlockSpec((1, H), lambda s, i: (0, 0)),
            pl.BlockSpec((H, H), lambda s, i: (0, 0)),
            pl.BlockSpec((1, H), lambda s, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TI, Vp, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, TI, H), lambda s, i: (s, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, Vp, Vp, H), e.dtype),
            jax.ShapeDtypeStruct((S, Vp, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        e,
        ah.astype(e.dtype),
        bh.astype(e.dtype),
        vh.astype(e.dtype),
        tvec.astype(e.dtype)[:, None, :],
        c_kernel.astype(jnp.bfloat16),
        as2d(c_bias.astype(jnp.float32)),
        as2d(lne_scale.astype(jnp.float32)),
        as2d(lne_bias.astype(jnp.float32)),
        as2d(ln2_scale.astype(jnp.float32)),
        as2d(ln2_bias.astype(jnp.float32)),
        w_out.astype(jnp.bfloat16),
        as2d(b_out.astype(jnp.float32)),
    )
    return eout, agg


def dense_forward_fused(params, t, xt, points, n_layers: int, hidden_dim: int,
                        out_channels: int, interpret: bool = False,
                        xt_binary: bool = False, row_tile: int = 0):
    """Full dense TSP forward using the fused layer kernel.

    Numerically equivalent (mixed-precision) to
    ``GNNDenoiser.apply(params, t, xt, points=points)`` with
    sparse=False/node_feature_only=False/sum aggregation; reads the flax
    param pytree directly. Inference only (no custom VJP).
    """
    from difusco_tpu.models import embeddings as emb

    p = params["params"]
    H = hidden_dim
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    S, V, _ = xt.shape
    Vp = _round_up(V, 16)
    if row_tile == 0:
        # default: ~4096 GEMM rows per grid step (VMEM-bounded at large V),
        # rounded to the 8-sublane tile so TI | Vp stays true
        row_tile = max(8, min(Vp, (4096 // Vp) // 8 * 8))

    def dense(px, x):  # x @ kernel + bias (bf16 matmul, f32 out)
        return (
            jnp.dot(x.astype(bf16), px["kernel"].astype(bf16),
                    preferred_element_type=f32)
            + px["bias"]
        )

    x = dense(p["node_embed"], emb.position_embedding_sine(points, H))
    if xt_binary:
        # xt ∈ {0,1}: sinusoidal embed + matmul collapse to a 2-row select
        tab = dense(p["edge_embed"], emb.scalar_embedding_sine(
            jnp.asarray([0.0, 1.0], f32), H)).astype(bf16)  # (2, H)
        e = jnp.where(xt[..., None] > 0.5, tab[1], tab[0])
    else:
        e = dense(p["edge_embed"], emb.scalar_embedding_sine(xt, H)).astype(bf16)
    # pad V -> Vp once; all layers stay padded
    pad_n = Vp - V
    if pad_n:
        x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0)))
        e = jnp.pad(e, ((0, 0), (0, pad_n), (0, pad_n), (0, 0)))

    temb = emb.timestep_embedding(t, H)
    temb = dense(p["time_embed_2"], jax.nn.relu(dense(p["time_embed_1"], temb)))

    def layer_norm(px, v):
        mu = jnp.mean(v, -1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), -1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-6) * px["scale"] + px["bias"]

    for i in range(n_layers):
        lp = p[f"layer_{i}"]
        conv = lp["conv"]
        ah = dense(conv["A"], x)
        bh = dense(conv["B"], x)
        vh = dense(conv["V"], x)
        uh = dense(conv["U"], x)
        tvec = dense(lp["time"]["Dense_0"], jax.nn.relu(temb))
        e, agg = fused_dense_layer(
            e, ah, bh, vh, tvec,
            conv["C"]["kernel"], conv["C"]["bias"],
            conv["norm_e"]["scale"], conv["norm_e"]["bias"],
            lp["out"]["LayerNorm_0"]["scale"], lp["out"]["LayerNorm_0"]["bias"],
            lp["out"]["Dense_0"]["kernel"], lp["out"]["Dense_0"]["bias"],
            n_real=V,
            interpret=interpret,
            row_tile=row_tile,
        )
        # node stream (small): x = x_in + relu(LN_h(Uh + agg))
        x = x + jax.nn.relu(layer_norm(conv["norm_h"], uh + agg))

    # output head: GroupNorm(32, fp32) -> ReLU -> Dense. GroupNorm reduces
    # over spatial dims AND group channels (torch/flax semantics).
    hp = p["out_head"]
    ef = e[:, :V, :V].astype(f32)
    g = ef.reshape(S, V, V, 32, H // 32)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(g - mu), axis=(1, 2, 4), keepdims=True)
    g = ((g - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(S, V, V, H)
    g = g * hp["GroupNorm_0"]["scale"] + hp["GroupNorm_0"]["bias"]
    g = jax.nn.relu(g)
    return jnp.dot(g, hp["Dense_0"]["kernel"]) + hp["Dense_0"]["bias"]
