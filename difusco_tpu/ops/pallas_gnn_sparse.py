"""Fused Pallas TPU kernel for the fixed-degree sparse GatedGCN layer.

The XLA sparse path spends most of its time in HBM row-gathers
(take_along_axis of (S,V,H) at (S,V,K)) and the unfused elementwise chain
(measured ~2.1 ms/layer for TSP-500 k=50 S=4 on v5e). Here each layer runs
as one kernel per (sample, row-tile):

- node features (and their A-/V-projections, precomputed outside as small
  (V,H) matmuls) are VMEM-resident per sample; the neighbor gather is a
  one-hot MXU matmul (Mosaic has no dynamic VMEM gather), which for
  V <= ~2000 costs about the same as the C matmul
- the full edge chain (Ce matmul, gating, aggregation over K, both
  LayerNorms, time injection, SiLU, out-projection, residual) is fused with
  a single read/write of the (S,V,K,H) edge stream

Inference only; training uses the XLA path. Same mixed-precision policy as
the flax model (bf16 tensors, fp32 accumulation/norms).

Layer math mirrored from models/gnn.py (_LayerBlock sparse=True,
time_on_edges=True, sum aggregation; reference gnn_encoder.py:94-142 sparse
branch, 274-287).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _make_kernel(TI: int, K: int, Vp: int, H: int):
    def kernel(
        e_ref,      # (1, TI, K, H) bf16
        nbr_ref,    # (1, TI, K) int32
        ha_ref,     # (1, Vp, H) bf16   A h + b_a  (all nodes)
        hv_ref,     # (1, Vp, H) bf16   V h + b_v
        bh_ref,     # (1, TI, H) bf16   B h + b_b  (tile rows)
        tvec_ref,   # (1, 1, H)
        ck_ref,     # (H, H) bf16
        cb_ref,     # (1, H) f32
        lne_s_ref,  # (1, H)
        lne_b_ref,  # (1, H)
        ln2_s_ref,  # (1, H)
        ln2_b_ref,  # (1, H)
        wout_ref,   # (H, H) bf16
        bout_ref,   # (1, H)
        eout_ref,   # (1, TI, K, H) bf16
        agg_ref,    # (1, TI, H) f32
    ):
        idx = nbr_ref[0]  # (TI, K) int32
        # one-hot gather on the MXU: oh (TI, K, Vp) @ (Vp, H)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (TI, K, Vp), 2)
        oh = (iota_v == idx[:, :, None]).astype(jnp.bfloat16)
        hn_a = jax.lax.dot_general(
            oh, ha_ref[0], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TI, K, H)
        hn_v = jax.lax.dot_general(
            oh, hv_ref[0], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        ce = jax.lax.dot_general(
            e_ref[0], ck_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e_new = (
            ce + cb_ref[0][None, None, :]
            + hn_a
            + bh_ref[0][:, None, :].astype(jnp.float32)
        )

        gates = jax.nn.sigmoid(e_new)
        agg_ref[0] = jnp.sum(gates * hn_v, axis=1)

        mu = jnp.mean(e_new, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(e_new - mu), axis=-1, keepdims=True)
        e_ln = (e_new - mu) * jax.lax.rsqrt(var + 1e-6)
        e_ln = e_ln * lne_s_ref[0][None, None, :] + lne_b_ref[0][None, None, :]
        e_mid = jax.nn.relu(e_ln) + tvec_ref[0, 0][None, None, :].astype(jnp.float32)

        mu2 = jnp.mean(e_mid, axis=-1, keepdims=True)
        var2 = jnp.mean(jnp.square(e_mid - mu2), axis=-1, keepdims=True)
        e2 = (e_mid - mu2) * jax.lax.rsqrt(var2 + 1e-6)
        e2 = e2 * ln2_s_ref[0][None, None, :] + ln2_b_ref[0][None, None, :]
        e2 = e2 * jax.nn.sigmoid(e2)

        proj = jax.lax.dot_general(
            e2.astype(jnp.bfloat16), wout_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[0][None, None, :]

        eout_ref[0] = (e_ref[0].astype(jnp.float32) + proj).astype(eout_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sparse_layer(
    e: jax.Array,       # (S, Vp, K, H) bf16 (Vp multiple of 8)
    neighbors: jax.Array,  # (S, Vp, K) int32
    ha: jax.Array,      # (S, Vp, H)
    hv: jax.Array,      # (S, Vp, H)
    bh: jax.Array,      # (S, Vp, H)
    tvec: jax.Array,    # (S, H)
    c_kernel: jax.Array,
    c_bias: jax.Array,
    lne_scale: jax.Array,
    lne_bias: jax.Array,
    ln2_scale: jax.Array,
    ln2_bias: jax.Array,
    w_out: jax.Array,
    b_out: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    S, Vp, K, H = e.shape
    TI = 8 if Vp % 8 == 0 else Vp
    n_tiles = Vp // TI

    as2d = lambda x: x.reshape(1, -1)
    kernel = _make_kernel(TI, K, Vp, H)
    eout, agg = pl.pallas_call(
        kernel,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TI, K, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, TI, K), lambda s, i: (s, i, 0)),
            pl.BlockSpec((1, Vp, H), lambda s, i: (s, 0, 0)),
            pl.BlockSpec((1, Vp, H), lambda s, i: (s, 0, 0)),
            pl.BlockSpec((1, TI, H), lambda s, i: (s, i, 0)),
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
            pl.BlockSpec((1, TI, K, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, TI, H), lambda s, i: (s, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, Vp, K, H), e.dtype),
            jax.ShapeDtypeStruct((S, Vp, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        e,
        neighbors.astype(jnp.int32),
        ha.astype(e.dtype),
        hv.astype(e.dtype),
        bh.astype(e.dtype),
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


def _make_kernel_v2(TI: int, K: int, H: int):
    """Gather-outside variant: the kernel receives the pre-gathered neighbor
    node features hg = h[neighbors] (one XLA HBM row-gather, bandwidth-cheap)
    and fuses ALL three edge matmuls (A- and V-projections of hg, C of e)
    plus the gate/aggregate/norm/time/SiLU/out-projection chain. Compute is
    O(E H^2) and traffic O(E H), independent of V — unlike the one-hot
    gather above (O(E V H)), this scales to TSP-10000."""

    def kernel(
        e_ref,      # (1, TI, K, H) bf16
        hg_ref,     # (1, TI, K, H) bf16   h[neighbors]
        bh_ref,     # (1, TI, 1, H) bf16   B h + b_b (pre-expanded: Mosaic
                    #                      cannot shape-cast (1,TI,H)->(TI,1,H))
        tvec_ref,   # (1, 1, H)
        ak_ref,     # (H, H) bf16          A kernel
        ab_ref,     # (1, H) f32           A bias
        vk_ref,     # (H, H) bf16
        vb_ref,     # (1, H)
        ck_ref,     # (H, H) bf16
        cb_ref,     # (1, H)
        lne_s_ref,  # (1, H)
        lne_b_ref,  # (1, H)
        ln2_s_ref,  # (1, H)
        ln2_b_ref,  # (1, H)
        wout_ref,   # (H, H) bf16
        bout_ref,   # (1, H)
        eout_ref,   # (1, TI, K, H) bf16
        agg_ref,    # (1, TI, H) f32
    ):
        hg = hg_ref[0]
        mm = lambda a, w: jax.lax.dot_general(
            a, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        hn_a = mm(hg, ak_ref[...]) + ab_ref[0][None, None, :]
        hn_v = mm(hg, vk_ref[...]) + vb_ref[0][None, None, :]
        ce = mm(e_ref[0], ck_ref[...]) + cb_ref[0][None, None, :]

        e_new = ce + hn_a + bh_ref[0].astype(jnp.float32)
        gates = jax.nn.sigmoid(e_new)
        agg_ref[0] = jnp.sum(gates * hn_v, axis=1)

        mu = jnp.mean(e_new, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(e_new - mu), axis=-1, keepdims=True)
        e_ln = (e_new - mu) * jax.lax.rsqrt(var + 1e-6)
        e_ln = e_ln * lne_s_ref[0][None, None, :] + lne_b_ref[0][None, None, :]
        e_mid = jax.nn.relu(e_ln) + tvec_ref[0, 0][None, None, :].astype(jnp.float32)

        mu2 = jnp.mean(e_mid, axis=-1, keepdims=True)
        var2 = jnp.mean(jnp.square(e_mid - mu2), axis=-1, keepdims=True)
        e2 = (e_mid - mu2) * jax.lax.rsqrt(var2 + 1e-6)
        e2 = e2 * ln2_s_ref[0][None, None, :] + ln2_b_ref[0][None, None, :]
        e2 = e2 * jax.nn.sigmoid(e2)

        proj = jax.lax.dot_general(
            e2.astype(jnp.bfloat16), wout_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout_ref[0][None, None, :]

        eout_ref[0] = (e_ref[0].astype(jnp.float32) + proj).astype(eout_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sparse_layer_v2(
    e: jax.Array,          # (S, Vp, K, H) bf16 (Vp multiple of 8)
    hg: jax.Array,         # (S, Vp, K, H) bf16  pre-gathered h[neighbors]
    bh: jax.Array,         # (S, Vp, H)
    tvec: jax.Array,       # (S, H)
    a_kernel: jax.Array, a_bias: jax.Array,
    v_kernel: jax.Array, v_bias: jax.Array,
    c_kernel: jax.Array, c_bias: jax.Array,
    lne_scale: jax.Array, lne_bias: jax.Array,
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    w_out: jax.Array, b_out: jax.Array,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    S, Vp, K, H = e.shape
    TI = 8 if Vp % 8 == 0 else Vp
    n_tiles = Vp // TI

    as2d = lambda x: x.reshape(1, -1)
    wspec = [
        pl.BlockSpec((H, H), lambda s, i: (0, 0)),
        pl.BlockSpec((1, H), lambda s, i: (0, 0)),
    ] * 3 + [pl.BlockSpec((1, H), lambda s, i: (0, 0))] * 4 + [
        pl.BlockSpec((H, H), lambda s, i: (0, 0)),
        pl.BlockSpec((1, H), lambda s, i: (0, 0)),
    ]
    kernel = _make_kernel_v2(TI, K, H)
    eout, agg = pl.pallas_call(
        kernel,
        grid=(S, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TI, K, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, TI, K, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, TI, 1, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda s, i: (s, 0, 0)),
        ] + wspec,
        out_specs=[
            pl.BlockSpec((1, TI, K, H), lambda s, i: (s, i, 0, 0)),
            pl.BlockSpec((1, TI, H), lambda s, i: (s, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, Vp, K, H), e.dtype),
            jax.ShapeDtypeStruct((S, Vp, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        e,
        hg.astype(e.dtype),
        bh.astype(e.dtype)[:, :, None, :],
        tvec.astype(e.dtype)[:, None, :],
        a_kernel.astype(jnp.bfloat16), as2d(a_bias.astype(jnp.float32)),
        v_kernel.astype(jnp.bfloat16), as2d(v_bias.astype(jnp.float32)),
        c_kernel.astype(jnp.bfloat16), as2d(c_bias.astype(jnp.float32)),
        as2d(lne_scale.astype(jnp.float32)), as2d(lne_bias.astype(jnp.float32)),
        as2d(ln2_scale.astype(jnp.float32)), as2d(ln2_bias.astype(jnp.float32)),
        w_out.astype(jnp.bfloat16), as2d(b_out.astype(jnp.float32)),
    )
    return eout, agg


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sparse_forward_fused(params, t, xt, points, neighbors,
                         n_layers: int, hidden_dim: int, out_channels: int,
                         interpret: bool = False, variant: str = "onehot",
                         xt_binary: bool = False):
    """Full sparse TSP forward with the fused layer kernel.

    Args:
      xt: (S, V, K) edge noise; points (S, V, 2); neighbors (S, V, K).
      variant: 'onehot' — in-kernel one-hot MXU gather, least HBM traffic,
        compute O(E V H): best for small V. 'gathered' — XLA HBM row-gather
        feeds the kernel, compute O(E H^2): best for large V (TSP-10000).
    Matches ``GNNDenoiser.apply`` (sparse=True, sum aggregation) in mixed
    precision. Inference only.
    """
    from difusco_tpu.models import embeddings as emb

    p = params["params"]
    H = hidden_dim
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    S, V, K = xt.shape
    Vp = _round_up(V, 8)
    pad_n = Vp - V

    def dense(px, x):
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
    nbrs = neighbors
    if pad_n:
        x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0)))
        e = jnp.pad(e, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        nbrs = jnp.pad(neighbors, ((0, 0), (0, pad_n), (0, 0)))

    temb = emb.timestep_embedding(t, H)
    temb = dense(p["time_embed_2"], jax.nn.relu(dense(p["time_embed_1"], temb)))

    def layer_norm(px, v):
        mu = jnp.mean(v, -1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), -1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-6) * px["scale"] + px["bias"]

    Sp, Vpad, Kn = nbrs.shape

    def gather_rows(v):  # (S, Vp, H) at nbrs -> (S, Vp, K, H)
        flat = jnp.take_along_axis(
            v, nbrs.reshape(Sp, Vpad * Kn, 1).astype(jnp.int32), axis=1
        )
        return flat.reshape(Sp, Vpad, Kn, -1)

    for i in range(n_layers):
        lp = p[f"layer_{i}"]
        conv = lp["conv"]
        bh = dense(conv["B"], x)
        uh = dense(conv["U"], x)
        tvec = dense(lp["time"]["Dense_0"], jax.nn.relu(temb))
        if variant == "gathered":
            hg = gather_rows(x.astype(bf16))
            e, agg = fused_sparse_layer_v2(
                e, hg, bh, tvec,
                conv["A"]["kernel"], conv["A"]["bias"],
                conv["V"]["kernel"], conv["V"]["bias"],
                conv["C"]["kernel"], conv["C"]["bias"],
                conv["norm_e"]["scale"], conv["norm_e"]["bias"],
                lp["out"]["LayerNorm_0"]["scale"], lp["out"]["LayerNorm_0"]["bias"],
                lp["out"]["Dense_0"]["kernel"], lp["out"]["Dense_0"]["bias"],
                interpret=interpret,
            )
        else:
            ha = dense(conv["A"], x)
            hv = dense(conv["V"], x)
            e, agg = fused_sparse_layer(
                e, nbrs, ha, hv, bh, tvec,
                conv["C"]["kernel"], conv["C"]["bias"],
                conv["norm_e"]["scale"], conv["norm_e"]["bias"],
                lp["out"]["LayerNorm_0"]["scale"], lp["out"]["LayerNorm_0"]["bias"],
                lp["out"]["Dense_0"]["kernel"], lp["out"]["Dense_0"]["bias"],
                interpret=interpret,
            )
        x = x + jax.nn.relu(layer_norm(conv["norm_h"], uh + agg))

    hp = p["out_head"]
    ef = e[:, :V].astype(f32)
    g = ef.reshape(S, V, K, 32, H // 32)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(g - mu), axis=(1, 2, 4), keepdims=True)
    g = ((g - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(S, V, K, H)
    g = g * hp["GroupNorm_0"]["scale"] + hp["GroupNorm_0"]["bias"]
    g = jax.nn.relu(g)
    return jnp.dot(g, hp["Dense_0"]["kernel"]) + hp["Dense_0"]["bias"]
