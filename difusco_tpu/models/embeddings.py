"""Sinusoidal embeddings for coordinates, scalar edge/node features and time.

Capability parity with reference difusco/models/gnn_encoder.py:194-271
(PositionEmbeddingSine, ScalarEmbeddingSine, ScalarEmbeddingSine1D) and
difusco/models/nn.py:103-121 (timestep_embedding). All are pure jnp functions
of arrays; frequency tables are computed inline (constant-folded by XLA).

Frequency/phase conventions are kept identical to the reference so that the
same checkpoints describe the same function family:
- coordinate / scalar embeddings interleave sin on even indices and cos on odd
  indices with freq 10000^(2*(i//2)/D)
- timestep embedding concatenates [cos | sin] halves with freq 10000^(-i/(D/2))
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _interleaved_sincos(x: jnp.ndarray, num_feats: int, temperature: float = 10000.0) -> jnp.ndarray:
    """Embed scalars x (...,) -> (..., num_feats) with interleaved sin/cos.

    out[..., 2k]   = sin(x / T^(2k/D))
    out[..., 2k+1] = cos(x / T^(2k/D))
    (matches the stack+flatten pattern of gnn_encoder.py:222-248).
    """
    i = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(i / 2.0) / num_feats)
    pos = x[..., None] / dim_t  # (..., D)
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(x.shape + (num_feats,))


def position_embedding_sine(points: jnp.ndarray, hidden_dim: int) -> jnp.ndarray:
    """2-D coordinate embedding: (..., V, 2) -> (..., V, hidden_dim).

    The first coordinate is treated as "y", the second as "x"; both are scaled
    by 2*pi (normalize=True in the reference, gnn_encoder.py:211-226) and each
    contributes hidden_dim//2 features, concatenated [y | x].
    """
    half = hidden_dim // 2
    scale = 2.0 * math.pi
    y = _interleaved_sincos(points[..., 0] * scale, half)
    x = _interleaved_sincos(points[..., 1] * scale, half)
    return jnp.concatenate([y, x], axis=-1)


def scalar_embedding_sine(x: jnp.ndarray, hidden_dim: int) -> jnp.ndarray:
    """Scalar feature embedding (no normalization): (...) -> (..., hidden_dim).

    Used for dense edge heatmap values and node noise labels
    (gnn_encoder.py:230-271; Scalar{,1D} variants share the same formula).
    """
    return _interleaved_sincos(x, hidden_dim)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Diffusion timestep embedding: (B,) -> (B, dim), [cos | sin] halves
    (reference nn.py:103-121; note cos first)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
