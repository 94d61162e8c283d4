"""Full-state checkpoint resume: a killed-and-resumed run must reproduce the
uninterrupted run's loss trajectory exactly (params + optimizer moments +
LR-schedule position + data order all survive the restart).

Reference semantics: trainer.fit(model, ckpt_path=...) restores the full
trainer state (train.py:126-130); --resume_weight_only restores params into
a fresh trainer.
"""

import numpy as np
import pytest

from difusco_tpu.config import Config
from difusco_tpu.data.generate_tsp import generate as gen_tsp
from difusco_tpu.data.tsp import TSPDataset, write_tsp_file
from difusco_tpu.tasks.tsp import TSPTask
from difusco_tpu.train.checkpoint import CheckpointKeeper
from difusco_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tsp10_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "tsp10.txt")
    write_tsp_file(path, gen_tsp(num_samples=32, num_nodes=10, seed=3))
    return path


def _cfg(**kw):
    defaults = dict(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=50, inference_diffusion_steps=5,
        inference_schedule="cosine", n_layers=1, hidden_dim=32,
        batch_size=8, learning_rate=1e-3, lr_scheduler="cosine-decay",
    )
    defaults.update(kw)
    return Config(**defaults)


def test_full_state_resume_matches_uninterrupted(tsp10_file, tmp_path):
    cfg = _cfg()
    task = TSPTask(cfg)
    ds = TSPDataset(tsp10_file)
    total = 12

    # --- uninterrupted run: record the per-step loss trajectory
    t = Trainer(task, cfg)
    _, hist = t.fit(ds.batches(8, seed=0, epochs=None), total_steps=total,
                    seed=0, log_every=1)
    ref_losses = {h["step"]: h["train/loss"] for h in hist}

    # --- interrupted run: same 12-step configuration (so the LR schedule
    # horizon matches), but the data runs dry after 6 batches — the "crash"
    import itertools

    keeper = CheckpointKeeper(str(tmp_path / "ckpt"), mode="min")
    t1 = Trainer(task, cfg)

    def save_hook(p, step, opt_state=None):
        import jax

        keeper.save(step, jax.device_get(p),
                    opt_state=jax.device_get(opt_state),
                    metrics={"val/solved_cost": 1.0})

    t1.fit(itertools.islice(ds.batches(8, seed=0, epochs=None), 6),
           total_steps=total, seed=0,
           log_every=1, eval_fn=save_hook, eval_every=6)

    # --- resumed run: continue to `total` from the saved state
    t2 = Trainer(task, cfg)
    _, hist2 = t2.fit(ds.batches(8, seed=0, epochs=None), total_steps=total,
                      seed=0, log_every=1, resume_keeper=keeper)
    keeper.close()

    resumed = {h["step"]: h["train/loss"] for h in hist2}
    assert min(resumed) == 7, f"resume did not continue from step 7: {sorted(resumed)}"
    for step, loss in resumed.items():
        np.testing.assert_allclose(
            loss, ref_losses[step], rtol=1e-4,
            err_msg=f"resumed loss diverged at step {step}",
        )


def test_weights_only_restore_with_explicit_path(tmp_path):
    """restore_weights_only(path) normalizes every on-disk layout to the
    flax variables dict ({'params': inner}).

    Regression for the BENCH_r04 silent sec_mis_er700800 failure: the
    republished v4 checkpoint was written as the variables dict itself and
    the loader's one-level strip handed model.apply a tree with no 'params'
    collection (ScopeCollectionNotFound)."""
    import orbax.checkpoint as ocp

    inner = {"node_embed": {"w": np.ones((3, 3), np.float32) * 2.0}}
    variables = {"params": inner}
    layouts = {
        "keeper": {"params": variables, "step": 5},  # CheckpointKeeper.save
        "published": variables,  # eval_mis_er700800 --publish / convert.py
    }
    keeper = CheckpointKeeper(str(tmp_path / "unused"), mode="min")
    for name, state in layouts.items():
        path = tmp_path / f"raw_{name}"
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(str(path / "default"), state)
        restored = keeper.restore_weights_only(str(path))
        assert set(restored) == {"params"}, (name, set(restored))
        np.testing.assert_array_equal(
            restored["params"]["node_embed"]["w"], inner["node_embed"]["w"],
            err_msg=name,
        )
    keeper.close()


def test_as_variables_layouts():
    from difusco_tpu.train.checkpoint import as_variables

    inner = {"layer_0": {"kernel": 1}, "node_embed": {"kernel": 2}}
    variables = {"params": inner}
    assert as_variables({"params": variables, "step": 3}) == variables
    assert as_variables(variables) == variables
    assert as_variables(inner) == {"params": inner}
