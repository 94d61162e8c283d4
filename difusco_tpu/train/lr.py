"""Learning-rate schedules.

Capability parity with reference ``get_schedule_fn``
(difusco/utils/lr_schedulers.py:8-37): constant, cosine-decay
(CosineAnnealingLR with eta_min=0) and the simplified one-cycle
(linear warmup to peak at T/2, linear decay after). Implemented as optax
schedule functions (pure step -> lr)."""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(name: str, base_lr: float, total_steps: int):
    if name == "constant":
        return lambda step: base_lr
    if name == "cosine-decay":

        def cosine(step):
            frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
            return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

        return cosine
    if name == "one-cycle":
        half = max(total_steps / 2.0, 1.0)

        def one_cycle(step):
            s = jnp.asarray(step, jnp.float32)
            return base_lr * jnp.where(s < half, s / half, 2.0 - s / half)

        return one_cycle
    raise ValueError(f"unknown lr scheduler {name!r}")
