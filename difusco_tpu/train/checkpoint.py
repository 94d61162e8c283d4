"""Checkpointing: top-k-by-metric + last, with two restore modes.

Capability parity with the reference's ModelCheckpoint + resume logic
(train.py:96-103, 123-138): monitor ``val/solved_cost`` (min for TSP, max
for MIS), keep top-3 and last, and support (a) full-state resume (params +
optimizer + step) and (b) weights-only restore into a fresh trainer
(``--resume_weight_only``).

Implemented on orbax CheckpointManager: one manager tracks the best-k by
metric, a sibling directory always holds the latest full state.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def as_variables(state: Any) -> Any:
    """Normalize any on-disk checkpoint layout to a flax variables dict.

    Three layouts exist in the wild:
      keeper:    {'params': {'params': inner}, 'step': ..., 'opt_state': ...}
                 (CheckpointKeeper.save wraps the full variables dict)
      published: {'params': inner}  — the full variables dict itself, as
                 written by eval_mis_er700800.py --publish / convert.py
      bare:      inner  — just the module tree

    All loaders of raw orbax step dirs must go through this; loading a
    published checkpoint with the keeper's one-level strip yields a tree
    with no 'params' collection and every model.apply fails with
    ScopeCollectionNotFound (the silent sec_mis_er700800 failure of
    BENCH_r04).
    """
    if not isinstance(state, dict):
        return state
    inner = state.get("params")
    if not isinstance(inner, dict):
        return {"params": state}  # bare module tree
    if "params" in inner:
        return inner  # keeper layout: state['params'] IS the variables dict
    return state  # published layout: state IS the variables dict


class CheckpointKeeper:
    def __init__(
        self,
        directory: str,
        mode: str = "min",
        top_k: int = 3,
        metric: str = "val/solved_cost",
    ):
        self.directory = os.path.abspath(directory)
        self.metric = metric
        os.makedirs(self.directory, exist_ok=True)
        self._best = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=top_k,
                best_fn=lambda m: m[metric.replace("/", "_")],
                best_mode=mode,
            ),
        )
        self._last = ocp.CheckpointManager(
            os.path.join(self.directory, "last"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        metrics: Optional[Dict[str, float]] = None,
    ) -> None:
        state = {"params": params, "step": step}
        if opt_state is not None:
            state["opt_state"] = opt_state
        args = ocp.args.StandardSave(state)
        saved = self._last.save(step, args=args)
        if not saved:
            # orbax silently refuses non-increasing steps — a weights-only
            # resume that restarts the step counter into an existing run
            # dir would otherwise train with NO checkpoint landing
            # (observed r5: a whole segment's best weights lived only in
            # process memory). Make it loud; use a fresh run dir instead.
            print(
                f"WARNING: checkpoint save at step {step} was REFUSED "
                f"(latest on disk: {self._last.latest_step()}); this "
                "run's progress is NOT being checkpointed — resume into "
                "a fresh --logger_name instead",
                flush=True,
            )
        if metrics and self.metric in metrics:
            self._best.save(
                step,
                args=ocp.args.StandardSave(state),
                metrics={self.metric.replace("/", "_"): float(metrics[self.metric])},
            )
        self._last.wait_until_finished()
        self._best.wait_until_finished()

    def restore_last(self, template: Any = None):
        """Full-state restore from the newest checkpoint -> (step, state)."""
        step = self._last.latest_step()
        if step is None:
            return None, None
        args = ocp.args.StandardRestore(template) if template is not None else None
        return step, self._last.restore(step, args=args)

    def restore_best(self, template: Any = None):
        step = self._best.best_step()
        if step is None:
            return self.restore_last(template)
        args = ocp.args.StandardRestore(template) if template is not None else None
        return step, self._best.restore(step, args=args)

    def restore_weights_only(self, path: Optional[str] = None, template=None):
        """Weights-only restore (fresh optimizer), reference
        --resume_weight_only semantics (train.py:126-128).

        Args:
          path: optional explicit orbax step directory (containing
            ``default/``); when given it is restored directly instead of
            this keeper's best/last checkpoint.
        """
        if path is not None:
            with ocp.StandardCheckpointer() as ckptr:
                state = ckptr.restore(
                    os.path.join(os.path.abspath(path), "default")
                )
            return as_variables(state)
        step, state = self.restore_best(template)
        if state is None:
            return None
        return as_variables(state)

    def close(self):
        self._best.close()
        self._last.close()
