"""CLI runner: train / validate / test a diffusion CO solver.

Capability parity with reference ``difusco/train.py``: the same flag surface
(task, splits, optimization, diffusion, model, decoding, logging, actions),
epoch training with per-epoch validation, checkpoint-best-by
``val/solved_cost`` (min for TSP / max for MIS), full-state and weights-only
resume, and a test pass at the end.

Usage:
  python -m difusco_tpu.cli --task tsp --do_train --do_test \\
      --storage_path /tmp/exp --training_split data/tsp50_train.txt \\
      --validation_split data/tsp50_val.txt --test_split data/tsp50_test.txt \\
      --diffusion_type categorical --num_epochs 5 --batch_size 32
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from difusco_tpu.config import Config
from difusco_tpu.parallel.mesh import make_mesh
from difusco_tpu.train.checkpoint import CheckpointKeeper
from difusco_tpu.train.trainer import Trainer
from difusco_tpu.utils.logging import MetricLogger


def arg_parser() -> argparse.ArgumentParser:
    """Same surface as reference train.py:19-68 (wandb flags become logger
    flags; TPU additions at the end)."""
    p = argparse.ArgumentParser(
        description="Train a TPU-native diffusion model on TSP/MIS."
    )
    p.add_argument("--task", type=str, required=True, choices=["tsp", "mis"])
    p.add_argument("--storage_path", type=str, required=True)
    p.add_argument("--training_split", type=str, default="data/tsp/tsp50_train_concorde.txt")
    p.add_argument("--training_split_label_dir", type=str, default=None)
    p.add_argument("--validation_split", type=str, default="data/tsp/tsp50_test_concorde.txt")
    p.add_argument("--test_split", type=str, default="data/tsp/tsp50_test_concorde.txt")
    p.add_argument("--validation_examples", type=int, default=64)
    p.add_argument("--eval_every_steps", type=int, default=0)
    p.add_argument("--packed_dirs", type=str, default=None,
                   help="comma-separated pack_mis_dir outputs; overrides "
                        "--training_split for task=mis")
    p.add_argument("--packed_max_nodes", type=int, default=0)
    p.add_argument("--packed_max_degree", type=int, default=0)
    p.add_argument("--packed_refresh", action="store_true",
                   help="rescan --packed_dirs for new chunks at every epoch"
                        " boundary (train while a labeler is still writing)")

    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--max_steps", type=int, default=0)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--lr_scheduler", type=str, default="constant")

    p.add_argument("--fp16", action="store_true")
    p.add_argument("--use_activation_checkpoint", action="store_true")

    p.add_argument("--diffusion_type", type=str, default="gaussian")
    p.add_argument("--diffusion_schedule", type=str, default="linear")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--inference_diffusion_steps", type=int, default=1000)
    p.add_argument("--inference_schedule", type=str, default="linear")
    p.add_argument("--inference_trick", type=str, default="ddim")
    p.add_argument("--sequential_sampling", type=int, default=1)
    p.add_argument("--parallel_sampling", type=int, default=1)

    p.add_argument("--n_layers", type=int, default=12)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--sparse_factor", type=int, default=-1)
    p.add_argument("--aggregation", type=str, default="sum")
    p.add_argument("--two_opt_iterations", type=int, default=1000)
    p.add_argument("--two_opt_reference_parity", action="store_true")
    p.add_argument("--mis_local_search_rounds", type=int, default=0,
                   help="on-device MIS ILS refinement after greedy decode "
                        "(0 = reference-parity greedy only)")
    p.add_argument("--save_numpy_heatmap", action="store_true")

    p.add_argument("--project_name", type=str, default="tsp_diffusion")
    p.add_argument("--wandb_entity", type=str, default=None)
    p.add_argument(
        "--logger_name", "--wandb_logger_name", dest="logger_name",
        type=str, default=None,
    )
    # accepted for reference command-line compatibility; data loading here is
    # synchronous host prep feeding an async device pipeline, so the torch
    # DataLoader worker count has no equivalent knob
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--resume_id", type=str, default=None)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--resume_weight_only", action="store_true")

    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_test", action="store_true")
    p.add_argument("--do_valid_only", action="store_true")

    # TPU-native additions
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--n_data_devices", type=int, default=0, help="0 = all")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--profile_dir", type=str, default=None)
    # multi-host: the analog of PL's automatic DDP process launch
    # (reference train.py:113); run one process per host with the same
    # command + per-process --process_id
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize before building "
                        "the mesh (TPU pods auto-detect the coordinator)")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def config_from_args(args) -> Config:
    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    if args.inference_trick in ("", "none", "None"):
        kw["inference_trick"] = None
    return Config(**kw).validate()


def _load_datasets(cfg: Config):
    if cfg.task == "tsp":
        from difusco_tpu.data.tsp import TSPDataset

        mk = lambda split: TSPDataset(
            os.path.join(cfg.storage_path, split), sparse_factor=cfg.sparse_factor
        )
        return mk(cfg.training_split), mk(cfg.validation_split), mk(cfg.test_split)
    from difusco_tpu.data.mis import MISDataset

    label_dir = (
        os.path.join(cfg.storage_path, cfg.training_split_label_dir)
        if cfg.training_split_label_dir
        else None
    )
    mk = lambda split, ld=None: MISDataset(
        os.path.join(cfg.storage_path, split), label_dir=ld
    )
    if cfg.packed_dirs:
        from difusco_tpu.data.mis import PackedMISDataset

        train_ds = PackedMISDataset(
            [os.path.join(cfg.storage_path, d)
             for d in cfg.packed_dirs.split(",")],
            max_nodes=cfg.packed_max_nodes or None,
            max_degree=cfg.packed_max_degree or None,
            auto_refresh=cfg.packed_refresh,
        )
    else:
        train_ds = mk(cfg.training_split, label_dir)
    return (
        train_ds,
        mk(cfg.validation_split),
        mk(cfg.test_split),
    )


def _make_task(cfg: Config):
    if cfg.task == "tsp":
        from difusco_tpu.tasks.tsp import TSPTask

        return TSPTask(cfg)
    from difusco_tpu.tasks.mis import MISTask

    return MISTask(cfg)


def evaluate_split(task, dataset, params, cfg: Config, split: str, limit: Optional[int] = None):
    """Average instance metrics over a split (reference test_epoch_end,
    pl_meta_model.py:49-60)."""
    n = len(dataset) if limit is None else min(limit, len(dataset))
    sums: dict = {}
    key = jax.random.PRNGKey(cfg.seed + 1)
    for i in range(n):
        ex = dataset.get(i)
        ikey = jax.random.fold_in(key, i)
        if cfg.task == "tsp":
            save_dir = None
            if cfg.save_numpy_heatmap:
                save_dir = os.path.join(cfg.storage_path, "numpy_heatmap")
            m = task.evaluate_instance(
                params,
                jnp.asarray(ex["points"]),
                jnp.asarray(ex["tour"]),
                ikey,
                neighbors=(
                    jnp.asarray(ex["neighbors"]) if "neighbors" in ex else None
                ),
                save_heatmap_dir=save_dir,
                instance_idx=i,
                split=split,
            )
        else:
            m = task.evaluate_instance(params, ex, ikey)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
    return {f"{split}/{k}": v / n for k, v in sums.items()}


def run(cfg: Config) -> dict:
    """Programmatic entry; returns final metrics."""
    task = _make_task(cfg)
    train_ds, val_ds, test_ds = _load_datasets(cfg)

    run_dir = os.path.join(
        cfg.storage_path, "models", cfg.logger_name or cfg.project_name,
        cfg.resume_id or "run",
    )
    logger = MetricLogger(run_dir, run_name=cfg.logger_name)
    saving_mode = "min" if cfg.task == "tsp" else "max"
    keeper = CheckpointKeeper(
        os.path.join(run_dir, "checkpoints"), mode=saving_mode, top_k=cfg.ckpt_top_k
    )

    mesh = None
    n_dev = len(jax.devices())
    if getattr(cfg, "n_data_devices", 0):
        n_dev = min(n_dev, cfg.n_data_devices)
    # the data axis shards the batch: use the largest device count that
    # divides batch_size (a 8-device mesh can't shard a batch of 4)
    while n_dev > 1 and cfg.batch_size % n_dev != 0:
        n_dev -= 1
    if n_dev > 1:
        mesh = make_mesh((n_dev,), ("data",))

    steps_per_epoch = max(len(train_ds) // cfg.batch_size, 1)
    total_steps = steps_per_epoch * cfg.num_epochs
    if cfg.max_steps:
        total_steps = min(total_steps, cfg.max_steps)

    params = None
    resume_keeper = None
    if cfg.ckpt_path:
        if os.path.isdir(os.path.join(cfg.ckpt_path, "default")):
            # raw orbax step dir (e.g. a committed checkpoints/<name>/);
            # weights-only by construction — analogous to pointing the
            # reference's --ckpt_path at a bare .ckpt file
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                state = ckptr.restore(
                    os.path.join(os.path.abspath(cfg.ckpt_path), "default")
                )
            from difusco_tpu.train.checkpoint import as_variables

            params = as_variables(state)
            print(f"loaded weights-only checkpoint from {cfg.ckpt_path}")
        elif cfg.resume_weight_only or not cfg.do_train:
            keeper_in = CheckpointKeeper(cfg.ckpt_path, mode=saving_mode)
            params = keeper_in.restore_weights_only()
            keeper_in.close()
            print(f"loaded weights-only (best) checkpoint from {cfg.ckpt_path}")
        else:
            # full-state resume: params + opt_state + step continue inside
            # trainer.fit (reference train.py:130 ckpt_path semantics)
            resume_keeper = CheckpointKeeper(cfg.ckpt_path, mode=saving_mode)
            print(f"resuming full training state from {cfg.ckpt_path}")

    final_metrics: dict = {}
    if cfg.do_train:
        trainer = Trainer(task, cfg, mesh=mesh)

        def eval_hook(p, step, opt_state=None):
            if os.environ.get("DIFUSCO_SAVE_ONLY") == "1":
                # escape hatch for a wedged/refusing remote compile service
                # on the val sampler (observed r5: the axon compile RPC for
                # the V=800 eval program hung indefinitely mid-training,
                # stalling the run with zero checkpoints saved because
                # saving rode the eval hook). Save unconditionally, keyed
                # by step so the top-k keeper retains the newest k; model
                # selection then happens offline on the real test metric
                # (scripts/eval_mis_er700800.py).
                keeper.save(
                    step, jax.device_get(p),
                    opt_state=jax.device_get(opt_state)
                    if opt_state is not None else None,
                    metrics={keeper.metric: float(step)
                             if saving_mode == "max" else -float(step)},
                )
                return
            m = evaluate_split(task, val_ds, p, cfg, "val", cfg.validation_examples)
            logger.log(m, step)
            keeper.save(
                step, jax.device_get(p),
                opt_state=jax.device_get(opt_state) if opt_state is not None else None,
                metrics=m,
            )
            final_metrics.update(m)

        train_batches = train_ds.batches(cfg.batch_size, seed=cfg.seed, epochs=None)
        if cfg.num_workers > 0:
            from difusco_tpu.data.prefetch import prefetch

            train_batches = prefetch(train_batches, depth=3)
        params, history = trainer.fit(
            train_batches,
            total_steps=total_steps,
            params=params,
            seed=cfg.seed,
            log_every=cfg.log_every,
            eval_fn=eval_hook,
            eval_every=cfg.eval_every_steps or steps_per_epoch,
            log_path=os.path.join(run_dir, "train.jsonl"),
            resume_keeper=resume_keeper,
        )
        if resume_keeper is not None:
            resume_keeper.close()
        for h in history[-1:]:
            logger.log({"train/loss": h["train/loss"]}, h["step"])

    if cfg.do_test or cfg.do_valid_only:
        if params is None:
            raise ValueError("need --do_train or --ckpt_path for evaluation")
        m = evaluate_split(task, val_ds, params, cfg, "val", cfg.validation_examples)
        logger.log(m, 0)
        final_metrics.update(m)
        if not cfg.do_valid_only:
            m = evaluate_split(task, test_ds, params, cfg, "test")
            logger.log(m, 0)
            final_metrics.update(m)

    logger.close()
    keeper.close()
    return final_metrics


def main(argv=None):
    args = arg_parser().parse_args(argv)
    if args.multihost:
        from difusco_tpu.parallel.mesh import init_multihost

        pid = init_multihost(
            args.coordinator_address, args.num_processes, args.process_id
        )
        print(f"multihost initialized: process {pid}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices")
    cfg = config_from_args(args)
    metrics = run(cfg)
    print({k: round(v, 6) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
