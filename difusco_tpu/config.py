"""Typed configuration for difusco_tpu.

One dataclass covers the reference's full argparse surface
(reference: difusco/train.py:19-68) plus the TPU-specific knobs (mesh shape,
precision policy, decode backend) that have no reference equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Config:
    # ---- task / data (reference train.py:21-28) ----
    task: str = "tsp"  # "tsp" | "mis"
    storage_path: str = "."
    training_split: str = "data/tsp/tsp50_train_concorde.txt"
    training_split_label_dir: Optional[str] = None  # MIS KaMIS labels
    validation_split: str = "data/tsp/tsp50_test_concorde.txt"
    test_split: str = "data/tsp/tsp50_test_concorde.txt"
    validation_examples: int = 64
    # packed MIS training set (data/mis.py pack_mis_dir): comma-separated
    # pack dirs; overrides training_split for task=mis. The shape caps fix
    # XLA's static shapes for still-growing sets.
    packed_dirs: Optional[str] = None
    packed_max_nodes: int = 0
    packed_max_degree: int = 0
    packed_refresh: bool = False  # rescan pack dirs at each epoch boundary

    # ---- optimization (reference train.py:30-35) ----
    batch_size: int = 64
    num_epochs: int = 50
    # hard cap on optimizer steps (0 = epochs decide). The LR schedule's
    # period follows the cap, so a short cosine anneal can complete inside
    # a fixed wall-clock budget regardless of dataset size (Lightning
    # Trainer max_steps analog; reference train.py drives epochs only)
    max_steps: int = 0
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    lr_scheduler: str = "constant"  # constant | cosine-decay | one-cycle

    # ---- precision / memory (reference train.py:37-38) ----
    fp16: bool = False  # reference mixed precision flag; on TPU -> bfloat16
    use_activation_checkpoint: bool = False

    # ---- diffusion (reference train.py:40-47) ----
    diffusion_type: str = "categorical"  # gaussian | categorical
    diffusion_schedule: str = "linear"  # linear | cosine
    diffusion_steps: int = 1000
    inference_diffusion_steps: int = 50
    inference_schedule: str = "cosine"  # linear | cosine
    inference_trick: Optional[str] = "ddim"  # None | "ddim" (gaussian only)
    sequential_sampling: int = 1
    parallel_sampling: int = 1

    # ---- model (reference train.py:49-52) ----
    n_layers: int = 12
    hidden_dim: int = 256
    sparse_factor: int = -1  # kNN degree; <=0 means dense
    aggregation: str = "sum"  # sum | mean | max

    # ---- decoding (reference train.py:53-54) ----
    two_opt_iterations: int = 1000
    # reproduce the reference's 2-opt apply rule exactly (ops/two_opt.py
    # parity docstring) for A/B decode comparisons with converted weights
    two_opt_reference_parity: bool = False
    save_numpy_heatmap: bool = False
    merge_backend: str = "device"  # device | native | numpy
    # on-device MIS iterated local search after greedy decode (the node-task
    # analog of TSP's 2-opt; ops/mis_local_search.py). 0 = reference parity
    # (greedy decode only, mis_utils.py:3-18)
    mis_local_search_rounds: int = 0
    # independent ILS replicas per sampled chain (vmapped on device, so the
    # added chains cost ~nothing in wall-clock until compute-bound)
    mis_local_search_replicas: int = 2

    # ---- logging / checkpointing (reference train.py:56-61) ----
    project_name: str = "tsp_diffusion"
    wandb_entity: Optional[str] = None
    logger_name: Optional[str] = None
    resume_id: Optional[str] = None
    ckpt_path: Optional[str] = None
    resume_weight_only: bool = False

    # ---- actions (reference train.py:63-65) ----
    do_train: bool = False
    do_test: bool = False
    do_valid_only: bool = False

    # ---- TPU-native additions (no reference equivalent) ----
    seed: int = 0
    mesh_shape: Optional[tuple] = None  # e.g. (n_data, n_sample); None = auto
    bf16: bool = False  # bfloat16 activations (fp32 params / norms)
    fused_inference: bool = True  # Pallas fused dense layer for sampling
    # whole-network sparse megakernel (ops/pallas_gnn_mega.py): all layers
    # in one kernel, edge stream VMEM-resident (categorical sparse, V<=1200)
    mega_kernel: bool = True
    # (active only on the dense path with bf16/fp16 enabled)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    # host input-pipeline overlap (reference --num_workers, DataLoader
    # workers): >0 prefetches batches in a background thread so host batch
    # prep hides behind the async device step (data/prefetch.py)
    num_workers: int = 16
    log_every: int = 50
    ckpt_every_epochs: int = 1
    ckpt_top_k: int = 3
    # validation/checkpoint cadence in steps; 0 = once per epoch (the
    # reference's check_val_every_n_epoch=1). Long-epoch runs (30k-graph
    # packed sets) set this so an interrupted run loses minutes, not an epoch
    eval_every_steps: int = 0

    @property
    def sparse(self) -> bool:
        """Mirrors reference pl_meta_model.py:25 (node-feature tasks are sparse)."""
        return self.sparse_factor > 0 or self.node_feature_only

    @property
    def node_feature_only(self) -> bool:
        return self.task == "mis"

    @property
    def out_channels(self) -> int:
        """Gaussian predicts eps (1 ch); categorical predicts 2-class logits
        (reference pl_meta_model.py:27-36)."""
        return 1 if self.diffusion_type == "gaussian" else 2

    def validate(self) -> "Config":
        if self.task not in ("tsp", "mis"):
            raise ValueError(f"unknown task {self.task!r}")
        if self.diffusion_type not in ("gaussian", "categorical"):
            raise ValueError(f"unknown diffusion type {self.diffusion_type!r}")
        if self.diffusion_schedule not in ("linear", "cosine"):
            raise ValueError(f"unknown schedule {self.diffusion_schedule!r}")
        if self.inference_schedule not in ("linear", "cosine"):
            raise ValueError(f"unknown inference schedule {self.inference_schedule!r}")
        if self.inference_trick not in (None, "ddim"):
            raise ValueError(f"unknown inference trick {self.inference_trick!r}")
        if self.aggregation not in ("sum", "mean", "max"):
            raise ValueError(f"unknown aggregation {self.aggregation!r}")
        if self.diffusion_type == "gaussian" and self.task == "tsp" and self.sparse_factor > 0:
            # reference pl_tsp_model.py:90-92 raises the same restriction
            raise ValueError("gaussian diffusion with sparse TSP graphs is not supported")
        return self
