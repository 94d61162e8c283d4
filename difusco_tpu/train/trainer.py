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
        resume_keeper=None,
        local_batches: bool = False,
    ):
        """Run ``total_steps`` updates; returns (params, history).

        Full-state resume (reference trainer.fit(ckpt_path=...),
        train.py:130): pass ``resume_keeper`` (a CheckpointKeeper whose
        ``last`` checkpoint holds params + opt_state + step) and training
        continues from the saved step with the optimizer state — and hence
        the LR-schedule position, which lives in opt_state's count — intact.
        After fit, ``self.opt_state`` and ``self.step`` expose the final
        state for checkpointing.
        """
        cfg = self.cfg
        # per-step keys are fold_in(step_key, step): deterministic in the
        # step index, so a resumed run replays the exact key stream of the
        # uninterrupted one
        base_key = jax.random.PRNGKey(seed)
        init_key = jax.random.fold_in(base_key, 0)
        step_key = jax.random.fold_in(base_key, 1)
        optimizer = make_optimizer(cfg, total_steps)
        it = iter(train_batches)
        first = next(it)

        if params is None:
            params = self.task.init_params(init_key, first)
        opt_state = optimizer.init(params)
        start_step = 0
        if resume_keeper is not None:
            template = {"params": params, "opt_state": opt_state, "step": 0}
            try:
                _, state = resume_keeper.restore_last(template=template)
            except Exception as e:
                # older checkpoint layout (params only): weights-only resume
                print(f"full-state restore failed ({type(e).__name__}: {e}); "
                      "falling back to weights-only resume")
                _, state = resume_keeper.restore_last()
                state = {"params": state["params"], "opt_state": None, "step": 0} if state else None
            if state:
                params = state["params"]
                if state.get("opt_state") is not None:
                    opt_state = state["opt_state"]
                start_step = int(state.get("step", 0) or 0)
        step_fn = self._build_step(optimizer)

        if self.mesh is not None:
            from difusco_tpu.parallel.mesh import put_global

            params = put_global(params, self.mesh, P())
            opt_state = put_global(opt_state, self.mesh, P())

        history = []
        logf = open(log_path, "a") if log_path else None
        t0 = time.time()
        batch = first
        # resume: advance the data iterator past already-consumed batches so
        # the resumed run sees the same data order as the uninterrupted one
        for _ in range(start_step):
            try:
                batch = next(it)
            except StopIteration:
                break
        profile_dir = getattr(cfg, "profile_dir", None)
        _eval_takes_opt_state = None
        for step in range(start_step, total_steps):
            # profile a steady-state window (steps 10-15) when requested
            if profile_dir and step == 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and step == 15:
                jax.profiler.stop_trace()
            kstep = jax.random.fold_in(step_key, step)
            jbatch = {k: jnp.asarray(v) for k, v in batch.items() if k != "tour"}
            if self.mesh is not None:
                from difusco_tpu.parallel.mesh import put_global

                jbatch = put_global(jbatch, self.mesh, P("data"),
                                    local_batches=local_batches)
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
                if _eval_takes_opt_state is None:
                    import inspect

                    _eval_takes_opt_state = (
                        len(inspect.signature(eval_fn).parameters) >= 3
                    )
                if _eval_takes_opt_state:
                    eval_fn(params, step + 1, opt_state)
                else:
                    eval_fn(params, step + 1)
            try:
                batch = next(it)
            except StopIteration:
                break
        if logf:
            logf.close()
        self.opt_state = opt_state
        self.step = total_steps
        return params, history
