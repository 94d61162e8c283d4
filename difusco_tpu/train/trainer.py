"""Training loop: AdamW + schedule, jitted update step, data-parallel mesh.

Capability parity with the reference runner (difusco/train.py:106-130 +
pl_meta_model.py:81-100): AdamW with optional weight decay, per-step LR
scheduling, epoch loop with validation hooks, checkpoint-best-by-metric.

TPU-native redesign: instead of DDP process-per-device with NCCL allreduce,
a single jitted update step is sharded over a ``jax.sharding.Mesh`` 'data'
axis — the batch is split across devices and XLA inserts the gradient
psum (compiled collectives over ICI). Runs unchanged on 1 device.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from difusco_tpu.config import Config
from difusco_tpu.train.lr import make_lr_schedule


def make_optimizer(cfg: Config, total_steps: int) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg.lr_scheduler, cfg.learning_rate, total_steps)
    return optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)


class Trainer:
    """Minimal functional trainer around a task's ``loss_fn``.

    Args:
      task: object with ``loss_fn(params, batch, key)`` and ``init_params``.
      cfg: Config.
      mesh: optional Mesh with a 'data' axis for data-parallel training;
        None = single device.
    """

    def __init__(self, task, cfg: Config, mesh: Optional[Mesh] = None):
        self.task = task
        self.cfg = cfg
        self.mesh = mesh
        self._step_fn = None

    def _build_step(self, optimizer):
        loss_fn = self.task.loss_fn

        def update(params, opt_state, batch, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            update = jax.jit(
                update,
                in_shardings=(repl, repl, data, repl),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
        else:
            update = jax.jit(update, donate_argnums=(0, 1))
        return update

    def fit(
        self,
        train_batches: Iterable[Dict[str, np.ndarray]],
        total_steps: int,
        params=None,
        seed: int = 0,
        log_every: int = 50,
        eval_fn: Optional[Callable] = None,
        eval_every: Optional[int] = None,
        log_path: Optional[str] = None,
    ):
        """Run ``total_steps`` updates; returns (params, history)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(seed)
        optimizer = make_optimizer(cfg, total_steps)
        it = iter(train_batches)
        first = next(it)

        if params is None:
            key, kinit = jax.random.split(key)
            params = self.task.init_params(kinit, first)
        opt_state = optimizer.init(params)
        step_fn = self._build_step(optimizer)

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            params = jax.device_put(params, repl)
            opt_state = jax.device_put(opt_state, repl)

        history = []
        logf = open(log_path, "a") if log_path else None
        t0 = time.time()
        batch = first
        profile_dir = getattr(cfg, "profile_dir", None)
        for step in range(total_steps):
            # profile a steady-state window (steps 10-15) when requested
            if profile_dir and step == 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and step == 15:
                jax.profiler.stop_trace()
            key, kstep = jax.random.split(key)
            jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "tour"}
            if self.mesh is not None:
                data = NamedSharding(self.mesh, P("data"))
                jbatch = jax.device_put(jbatch, data)
            params, opt_state, loss = step_fn(params, opt_state, jbatch, kstep)

            if (step + 1) % log_every == 0 or step == total_steps - 1:
                loss_v = float(loss)
                rec = {
                    "step": step + 1,
                    "train/loss": loss_v,
                    "steps_per_sec": log_every / max(time.time() - t0, 1e-9),
                }
                t0 = time.time()
                history.append(rec)
                if logf:
                    logf.write(json.dumps(rec) + "\n")
                    logf.flush()
            if eval_fn is not None and eval_every and (step + 1) % eval_every == 0:
                eval_fn(params, step + 1)
            try:
                batch = next(it)
            except StopIteration:
                break
        if logf:
            logf.close()
        return params, history
