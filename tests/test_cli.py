"""CLI + checkpointing tests: tiny full runs through the command surface."""

import json
import os

import numpy as np
import pytest

from difusco_tpu.data.generate_tsp import generate as gen_tsp
from difusco_tpu.data.tsp import write_tsp_file


@pytest.fixture(scope="module")
def storage(tmp_path_factory):
    root = tmp_path_factory.mktemp("storage")
    instances = gen_tsp(num_samples=32, num_nodes=12, seed=0)
    write_tsp_file(str(root / "tsp12.txt"), instances)
    return str(root)


COMMON = [
    "--task", "tsp",
    "--diffusion_type", "categorical",
    "--diffusion_schedule", "cosine",
    "--diffusion_steps", "50",
    "--inference_diffusion_steps", "5",
    "--inference_schedule", "cosine",
    "--n_layers", "2",
    "--hidden_dim", "64",
    "--batch_size", "8",
    "--num_epochs", "2",
    "--validation_examples", "4",
    "--two_opt_iterations", "50",
    "--log_every", "2",
]


class TestCLI:
    def test_train_and_test(self, storage):
        from difusco_tpu.cli import arg_parser, config_from_args, run

        args = arg_parser().parse_args(
            COMMON
            + [
                "--storage_path", storage,
                "--training_split", "tsp12.txt",
                "--validation_split", "tsp12.txt",
                "--test_split", "tsp12.txt",
                "--do_train", "--do_valid_only", "--do_test",
                "--logger_name", "smoke",
            ]
        )
        cfg = config_from_args(args)
        metrics = run(cfg)
        assert "val/solved_cost" in metrics
        assert np.isfinite(metrics["val/solved_cost"])
        assert metrics["val/gt_cost"] > 0

        # artifacts: metrics jsonl + checkpoints
        run_dir = os.path.join(storage, "models", "smoke", "run")
        assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
        with open(os.path.join(run_dir, "metrics.jsonl")) as f:
            recs = [json.loads(l) for l in f]
        assert any("val/solved_cost" in r for r in recs)
        ckpt_root = os.path.join(run_dir, "checkpoints")
        assert os.path.isdir(os.path.join(ckpt_root, "best"))
        assert os.path.isdir(os.path.join(ckpt_root, "last"))

    def test_resume_weights_only(self, storage):
        from difusco_tpu.cli import arg_parser, config_from_args, run

        ckpt = os.path.join(storage, "models", "smoke", "run", "checkpoints")
        args = arg_parser().parse_args(
            COMMON
            + [
                "--storage_path", storage,
                "--training_split", "tsp12.txt",
                "--validation_split", "tsp12.txt",
                "--test_split", "tsp12.txt",
                "--do_test", "--do_valid_only",
                "--ckpt_path", ckpt,
                "--resume_weight_only",
                "--logger_name", "resume",
            ]
        )
        metrics = run(config_from_args(args))
        assert np.isfinite(metrics["val/solved_cost"])

    def test_ckpt_path_raw_orbax_dir(self, storage, tmp_path):
        """--ckpt_path also accepts a bare orbax step dir (the layout the
        committed checkpoints/ use), analogous to the reference's .ckpt file."""
        import orbax.checkpoint as ocp

        from difusco_tpu.cli import arg_parser, config_from_args, run
        from difusco_tpu.train.checkpoint import CheckpointKeeper

        keeper = CheckpointKeeper(
            os.path.join(storage, "models", "smoke", "run", "checkpoints")
        )
        _, state = keeper.restore_best()
        keeper.close()
        raw = tmp_path / "raw_ckpt"
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(str(raw / "default"), {"params": state["params"]})

        args = arg_parser().parse_args(
            COMMON
            + [
                "--storage_path", storage,
                "--training_split", "tsp12.txt",
                "--validation_split", "tsp12.txt",
                "--test_split", "tsp12.txt",
                "--do_test", "--do_valid_only",
                "--ckpt_path", str(raw),
                "--logger_name", "rawresume",
            ]
        )
        metrics = run(config_from_args(args))
        assert np.isfinite(metrics["val/solved_cost"])


class TestCheckpointKeeper:
    def test_best_and_last_tracking(self, tmp_path):
        import jax.numpy as jnp

        from difusco_tpu.train.checkpoint import CheckpointKeeper

        keeper = CheckpointKeeper(str(tmp_path / "ck"), mode="min", top_k=2)
        params = {"w": jnp.ones((3,))}
        for step, cost in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 2.0)]:
            keeper.save(
                step,
                {"w": params["w"] * step},
                metrics={"val/solved_cost": cost},
            )
        step, state = keeper.restore_best()
        assert step == 4  # lowest cost
        np.testing.assert_allclose(np.asarray(state["params"]["w"]), 4.0)
        step, state = keeper.restore_last()
        assert step == 4
        keeper.close()


class TestArgParserCompat:
    def test_reference_flag_surface_accepted(self):
        """Every flag of the reference arg_parser (train.py:19-68) parses."""
        from difusco_tpu.cli import arg_parser, config_from_args

        args = arg_parser().parse_args([
            "--task", "tsp", "--storage_path", "/tmp/x",
            "--training_split", "a.txt", "--training_split_label_dir", "lbl",
            "--validation_split", "b.txt", "--test_split", "c.txt",
            "--validation_examples", "8", "--batch_size", "4",
            "--num_epochs", "1", "--learning_rate", "2e-4",
            "--weight_decay", "1e-4", "--lr_scheduler", "cosine-decay",
            "--num_workers", "16", "--fp16", "--use_activation_checkpoint",
            "--diffusion_type", "categorical", "--diffusion_schedule", "cosine",
            "--diffusion_steps", "100", "--inference_diffusion_steps", "10",
            "--inference_schedule", "cosine", "--inference_trick", "ddim",
            "--sequential_sampling", "2", "--parallel_sampling", "2",
            "--n_layers", "2", "--hidden_dim", "32", "--sparse_factor", "-1",
            "--aggregation", "sum", "--two_opt_iterations", "100",
            "--save_numpy_heatmap", "--project_name", "p",
            "--wandb_entity", "me", "--wandb_logger_name", "runname",
            "--resume_id", "rid", "--ckpt_path", "ck",
            "--resume_weight_only", "--do_train", "--do_test",
        ])
        assert args.logger_name == "runname"
        assert args.wandb_entity == "me"
        cfg = config_from_args(args)
        assert cfg.logger_name == "runname"
        assert cfg.fp16 and cfg.resume_weight_only
