"""Metric logging: JSONL + stdout, wandb-compatible metric names.

The reference logs through WandbLogger (train.py:86-94) with names
``train/loss``, ``{val,test}/solved_cost``, ``{val,test}/gt_cost``,
``{val,test}/2opt_iterations``, ``{val,test}/merge_iterations``. The same
names are used here; records go to a JSONL file (always) and to wandb when
the package is importable and WANDB_API_KEY is set (optional, not vendored).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, run_name: Optional[str] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.run_name = run_name
        self._wandb = None
        if os.environ.get("WANDB_API_KEY"):
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(name=run_name, resume="allow")
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"step": step, "ts": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        parts = " ".join(f"{k}={v:.5g}" for k, v in metrics.items())
        print(f"[step {step}] {parts}", flush=True)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
