"""Diffusion schedules, forward sampling, and reverse posteriors.

Capability parity with the reference (behavior re-derived, not ported):
- schedules: difusco/utils/diffusion_schedulers.py:9-82
  (GaussianDiffusion, CategoricalDiffusion; linear / cosine beta)
- inference time-warp: difusco/utils/diffusion_schedulers.py:85-111
- reverse posteriors: difusco/pl_meta_model.py:102-175
  (categorical D3PM posterior with the reference's exact two-term
  unnormalized Bernoulli update; Gaussian DDPM + DDIM branches)

TPU-native design: every schedule constant is a precomputed array held in a
frozen dataclass (a pytree leaf container), so posteriors are pure jittable
functions of traced time indices -> the entire denoise trajectory compiles to
a single ``lax.scan``. The per-step 2x2 matrix inverse the reference computes
on the host with ``np.linalg.inv`` is replaced by an analytic in-graph
inverse.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Beta schedules
# ---------------------------------------------------------------------------


def make_betas(T: int, schedule: str) -> np.ndarray:
    """Noise schedule beta_t for t=1..T (returned 0-indexed, length T).

    linear: beta in [1e-4, 2e-2]; cosine: Nichol-Dhariwal with offset 0.008,
    clipped at 0.999 (reference diffusion_schedulers.py:17-24).
    """
    if schedule == "linear":
        return np.linspace(1e-4, 2e-2, T)
    if schedule == "cosine":
        offset = 0.008

        def f(t):
            return np.cos(math.pi * 0.5 * (t / T + offset) / (1 + offset)) ** 2

        abar = f(np.arange(0, T + 1, 1)) / f(0)
        return np.clip(1.0 - abar[1:] / abar[:-1], None, 0.999)
    raise ValueError(f"unknown schedule {schedule!r}")


# ---------------------------------------------------------------------------
# Gaussian diffusion
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianSchedule:
    """Precomputed Gaussian diffusion constants.

    Indexing convention matches the reference exactly: ``alpha`` and
    ``alphabar`` have length T+1 with a leading 1.0 so that ``alphabar[t]``
    is the signal level after t noising steps (``alphabar[0] == 1``), and
    ``beta[t-1]`` is the noise added at step t
    (reference diffusion_schedulers.py:26-28).
    """

    beta: jax.Array  # (T,)
    alpha: jax.Array  # (T+1,)
    alphabar: jax.Array  # (T+1,)

    @property
    def T(self) -> int:
        return self.beta.shape[0]


def gaussian_schedule(T: int, schedule: str = "linear") -> GaussianSchedule:
    beta = make_betas(T, schedule)
    alpha = np.concatenate([np.array([1.0]), 1.0 - beta])
    alphabar = np.cumprod(alpha)
    return GaussianSchedule(
        beta=jnp.asarray(beta, jnp.float32),
        alpha=jnp.asarray(alpha, jnp.float32),
        alphabar=jnp.asarray(alphabar, jnp.float32),
    )


def gaussian_q_sample(
    sched: GaussianSchedule, x0: jax.Array, t: jax.Array, key: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Forward noising x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps.

    ``t`` is an int array of shape (B,) with values in [1, T]
    (reference diffusion_schedulers.py:34-43). Returns (x_t, eps).
    """
    abar = jnp.take(sched.alphabar, t, axis=0)
    abar = abar.reshape((t.shape[0],) + (1,) * (x0.ndim - 1))
    eps = jax.random.normal(key, x0.shape, dtype=x0.dtype)
    xt = jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * eps
    return xt, eps


def gaussian_posterior(
    sched: GaussianSchedule,
    t: jax.Array,
    target_t: jax.Array,
    pred_eps: jax.Array,
    xt: jax.Array,
    key: jax.Array,
    use_ddim: bool,
) -> jax.Array:
    """One reverse step x_t -> x_{target_t} given predicted noise.

    Mirrors reference pl_meta_model.py:148-175: with ``use_ddim`` the DDIM
    update is used except when t <= 1, where it falls back to the stochastic
    DDPM posterior; without it, DDPM always. ``t``/``target_t`` are traced
    int scalars, so both branches are computed and selected (cheap scalars).
    """
    t = jnp.asarray(t)
    target_t = jnp.asarray(target_t)
    atbar = jnp.take(sched.alphabar, t)
    atbar_target = jnp.take(sched.alphabar, target_t)

    # DDPM branch (uses t-1 gathers; t >= 1 always holds during inference).
    at = jnp.take(sched.alpha, t)
    atbar_prev = jnp.take(sched.alphabar, t - 1)
    beta_t = jnp.take(sched.beta, t - 1)
    beta_tilde = beta_t * (1.0 - atbar_prev) / (1.0 - atbar)
    z = jax.random.normal(key, xt.shape, dtype=xt.dtype)
    ddpm = (xt - (1.0 - at) / jnp.sqrt(1.0 - atbar) * pred_eps) / jnp.sqrt(at)
    ddpm = ddpm + jnp.sqrt(beta_tilde) * z

    if not use_ddim:
        return ddpm

    ddim = jnp.sqrt(atbar_target / atbar) * (xt - jnp.sqrt(1.0 - atbar) * pred_eps)
    ddim = ddim + jnp.sqrt(1.0 - atbar_target) * pred_eps
    return jnp.where(t <= 1, ddpm, ddim)


# ---------------------------------------------------------------------------
# Categorical (2-state Bernoulli) diffusion
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CategoricalSchedule:
    """Precomputed 2-state transition matrices.

    ``Q_bar[t]`` is the cumulative transition matrix after t steps
    (``Q_bar[0] = I``); each single-step matrix is
    ``(1-beta) I + (beta/2) 1`` (reference diffusion_schedulers.py:63-72).
    The matrices are symmetric and doubly stochastic.
    """

    Q_bar: jax.Array  # (T+1, 2, 2)

    @property
    def T(self) -> int:
        return self.Q_bar.shape[0] - 1


def categorical_schedule(T: int, schedule: str = "linear") -> CategoricalSchedule:
    beta = make_betas(T, schedule)
    # Closed form for the cumulative product of symmetric 2-state kernels:
    # Q_bar[t] = [[1-p_t, p_t], [p_t, 1-p_t]] with 1-2 p_t = prod(1-beta_s).
    # Equivalent to the reference's sequential matmul but exact and O(T).
    signal = np.concatenate([[1.0], np.cumprod(1.0 - beta)])
    p = (1.0 - signal) / 2.0
    Q_bar = np.empty((T + 1, 2, 2))
    Q_bar[:, 0, 0] = 1.0 - p
    Q_bar[:, 0, 1] = p
    Q_bar[:, 1, 0] = p
    Q_bar[:, 1, 1] = 1.0 - p
    return CategoricalSchedule(Q_bar=jnp.asarray(Q_bar, jnp.float32))


def categorical_q_sample(
    sched: CategoricalSchedule, x0: jax.Array, t: jax.Array, key: jax.Array
) -> jax.Array:
    """Sample x_t ~ Bernoulli(onehot(x0) @ Q_bar[t]) as {0,1} floats.

    ``x0`` holds {0,1} labels of shape (B, ...); ``t`` is (B,) ints in [1, T]
    (reference diffusion_schedulers.py:78-82, which takes x0 one-hot; here we
    use the equivalent scalar form p1 = x0 d + (1-x0) p with d = 1-p).
    """
    Qb = jnp.take(sched.Q_bar, t, axis=0)  # (B, 2, 2)
    shape = (t.shape[0],) + (1,) * (x0.ndim - 1)
    p_flip = Qb[:, 0, 1].reshape(shape)
    p_keep = Qb[:, 1, 1].reshape(shape)
    p1 = jnp.where(x0 > 0.5, p_keep, p_flip)
    return jax.random.bernoulli(key, jnp.clip(p1, 0.0, 1.0)).astype(jnp.float32)


def _inv_2x2(Q: jax.Array) -> jax.Array:
    """Analytic 2x2 inverse (replaces the reference's host-side np.linalg.inv
    at pl_meta_model.py:115 so the posterior stays inside the jitted graph)."""
    a, b = Q[0, 0], Q[0, 1]
    c, d = Q[1, 0], Q[1, 1]
    det = a * d - b * c
    return jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])]) / det


def categorical_posterior(
    sched: CategoricalSchedule,
    t: jax.Array,
    target_t: jax.Array,
    x0_prob: jax.Array,
    xt: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """One reverse step of the D3PM categorical posterior.

    Reproduces the reference update (pl_meta_model.py:102-146) exactly,
    including its quirk of *summing* the two x0-hypothesis terms without a
    final renormalization:

      p = q(x_{t-1}=1 | x_t, x0=0) * p(x0=0) + q(x_{t-1}=1 | x_t, x0=1) * p(x0=1)

    with q computed via Bayes on the cumulative matrices. Inputs:
      x0_prob: (..., 2) predicted x0 class probabilities
      xt:      (...)    current {0,1} sample (floats)
    Returns {0,1} Bernoulli samples when target_t > 0, else the clamped
    probabilities themselves (the final step emits a soft heatmap).
    """
    t = jnp.asarray(t)
    target_t = jnp.asarray(target_t)
    Qb_t = jnp.take(sched.Q_bar, t, axis=0)  # (2, 2)
    Qb_s = jnp.take(sched.Q_bar, target_t, axis=0)  # (2, 2)
    Q_t = _inv_2x2(Qb_s) @ Qb_t  # single-jump kernel target_t -> t

    xt1h = jax.nn.one_hot(xt.astype(jnp.int32), 2, dtype=x0_prob.dtype)
    xt1h = xt1h.reshape(x0_prob.shape)

    part1 = xt1h @ Q_t.T  # (..., 2): Q_t[x_{t-1}, x_t] evaluated at observed x_t
    # hypothesis x0 = 0
    prob0 = part1 * Qb_s[0] / (xt1h @ Qb_t[0])[..., None]
    # hypothesis x0 = 1
    prob1 = part1 * Qb_s[1] / (xt1h @ Qb_t[1])[..., None]

    p_one = prob0[..., 1] * x0_prob[..., 0] + prob1[..., 1] * x0_prob[..., 1]

    bern = jax.random.bernoulli(key, jnp.clip(p_one, 0.0, 1.0)).astype(x0_prob.dtype)
    return jnp.where(target_t > 0, bern, jnp.maximum(p_one, 0.0))


# ---------------------------------------------------------------------------
# Inference time schedule (fast sampling: T train steps -> `steps` eval steps)
# ---------------------------------------------------------------------------


def inference_time_pairs(schedule: str, T: int, steps: int) -> np.ndarray:
    """Precompute the (t1, t2) pair for every inference step as an
    (steps, 2) int32 array, so the denoise loop is a scan over rows.

    Matches reference InferenceSchedule.__call__ (diffusion_schedulers.py:91-109)
    bit-for-bit, including the int() truncation and clipping.
    """
    pairs = np.zeros((steps, 2), dtype=np.int32)
    for i in range(steps):
        if schedule == "linear":
            t1 = T - int((float(i) / steps) * T)
            t2 = T - int((float(i + 1) / steps) * T)
        elif schedule == "cosine":
            t1 = T - int(np.sin((float(i) / steps) * np.pi / 2) * T)
            t2 = T - int(np.sin((float(i + 1) / steps) * np.pi / 2) * T)
        else:
            raise ValueError(f"unknown inference schedule {schedule!r}")
        pairs[i, 0] = np.clip(t1, 1, T)
        pairs[i, 1] = np.clip(t2, 0, T - 1)
    return pairs
