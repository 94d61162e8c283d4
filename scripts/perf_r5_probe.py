"""Round-5 training-throughput grid with compile-retry (VERDICT r4 item 8).

The round-4 probe's MIS-train cells at B>=8 (and B=16 remat) died with the
remote-compile helper returning HTTP 500, leaving error strings where half
the grid should be. The failures were transient service errors, not
program-size limits, so each cell now retries its compile-triggering first
step up to --retries times with backoff before recording an honest error.
Adds analytic train MFU per cell (3x forward FLOPs, remat recompute
excluded — same convention as bench.bench_train_throughput).

Run on the real chip: python scripts/perf_r5_probe.py
Writes data/perf_r5_probe.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = {}


def _accum_cell(task, cfg, batch, B, fwd, peak, micro=4):
    """Effective-batch-B training step as a lax.scan of B/micro
    gradient-accumulation microsteps + one optimizer update."""
    import jax
    import jax.numpy as jnp
    import optax

    from difusco_tpu.train.trainer import make_optimizer

    n_micro = B // micro
    opt = make_optimizer(cfg, 1000)
    loss_fn = task.loss_fn

    def step(params, opt_state, big_batch, key):
        def micro_step(carry, mb):
            acc, k = carry
            k, sub = jax.random.split(k)
            loss, g = jax.value_and_grad(loss_fn)(params, mb, sub)
            acc = jax.tree.map(lambda a, b: a + b, acc, g)
            return (acc, k), loss

        zeros = jax.tree.map(jnp.zeros_like, params)
        stacked = {k: v.reshape(n_micro, micro, *v.shape[1:])
                   for k, v in big_batch.items()}
        (acc, _), losses = jax.lax.scan(micro_step, (zeros, key), stacked)
        grads = jax.tree.map(lambda a: a / n_micro, acc)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses.mean()

    step = jax.jit(step, donate_argnums=(0, 1))
    params = task.init_params(jax.random.PRNGKey(0),
                              {k: v[:micro] for k, v in batch.items()})
    opt_state = opt.init(params)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, jb, key)
    loss.block_until_ready()
    compile_s = time.perf_counter() - t0
    n = 6
    t0 = time.perf_counter()
    for i in range(n):
        params, opt_state, loss = step(params, opt_state, jb,
                                       jax.random.fold_in(key, i))
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    return {
        "mode": f"grad_accum_micro{micro}",
        "step_s": round(dt, 4),
        "graphs_per_s": round(B / dt, 2),
        "compile_s": round(compile_s, 1),
        "train_mfu": round(3.0 * B * fwd / dt / peak, 4) if peak else None,
    }


def probe_mis_train(retries=3):
    import jax
    import jax.numpy as jnp

    from bench import sparse_gnn_flops_per_forward, tpu_peak_bf16_flops
    from difusco_tpu.config import Config
    from difusco_tpu.tasks.mis import MISTask
    from difusco_tpu.train.trainer import Trainer, make_optimizer

    rng = np.random.default_rng(0)
    peak = tpu_peak_bf16_flops()
    V, K = 800, 168
    fwd = sparse_gnn_flops_per_forward(V, K, 256, 12, out_channels=1)
    for remat in (False, True):
        for B in (4, 8, 16, 32):
            cell = f"mis_train_B{B}_remat{int(remat)}"
            cfg = Config(
                task="mis", diffusion_type="gaussian",
                diffusion_schedule="linear", diffusion_steps=1000,
                n_layers=12, hidden_dim=256, batch_size=B,
                learning_rate=2e-4, bf16=True,
                use_activation_checkpoint=remat,
            )
            task = MISTask(cfg)
            nbrs = rng.integers(0, V, (B, V, K)).astype(np.int32)
            mask = (rng.random((B, V, K)) < 0.9).astype(np.float32)
            labels = (rng.random((B, V)) < 0.05).astype(np.float32)
            batch = {"labels": labels, "neighbors": nbrs, "mask": mask,
                     "node_mask": np.ones((B, V), np.float32)}
            last_err = None
            for attempt in range(retries):
                try:
                    params = task.init_params(jax.random.PRNGKey(0), batch)
                    opt = make_optimizer(cfg, 1000)
                    step = Trainer(task, cfg)._build_step(opt)
                    opt_state = opt.init(params)
                    jb = {k: jnp.asarray(v) for k, v in batch.items()}
                    key = jax.random.PRNGKey(1)
                    t0 = time.perf_counter()
                    params, opt_state, loss = step(params, opt_state, jb, key)
                    loss.block_until_ready()
                    compile_s = time.perf_counter() - t0
                    n = 6
                    t0 = time.perf_counter()
                    for i in range(n):
                        params, opt_state, loss = step(
                            params, opt_state, jb, jax.random.fold_in(key, i))
                    loss.block_until_ready()
                    dt = (time.perf_counter() - t0) / n
                    OUT[cell] = {
                        "step_s": round(dt, 4),
                        "graphs_per_s": round(B / dt, 2),
                        "compile_s": round(compile_s, 1),
                        "train_mfu": round(3.0 * B * fwd / dt / peak, 4)
                        if peak else None,
                        "attempts": attempt + 1,
                    }
                    last_err = None
                    break
                except Exception as e:
                    last_err = f"{type(e).__name__}: {e}"[:200]
                    wait = 15 * (attempt + 1)
                    print(f"{cell} attempt {attempt + 1} failed "
                          f"({last_err}); retrying in {wait}s", flush=True)
                    time.sleep(wait)
            if last_err is not None:
                # persistent helper failure (the B>=8 no-remat backward is
                # too big for the remote tpu_compile_helper — exit code 1
                # on every attempt, r4+r5): fall back to gradient
                # accumulation over microbatches of 4. A lax.scan over
                # microbatches keeps the compiled program at B=4 size while
                # measuring the real achievable throughput at effective
                # batch B — the program one would actually train with here.
                try:
                    OUT[cell] = _accum_cell(task, cfg, batch, B, fwd, peak)
                    OUT[cell]["error_direct"] = last_err
                except Exception as e:
                    OUT[cell] = {"error": last_err,
                                 "accum_error": f"{type(e).__name__}: {e}"[:200],
                                 "attempts": retries}
            print(f"{cell}: {OUT[cell]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--retries", type=int, default=3)
    args = ap.parse_args()
    probe_mis_train(retries=args.retries)
    out_p = os.path.join(REPO, "data", "perf_r5_probe.json")
    with open(out_p + ".tmp", "w") as f:
        json.dump(OUT, f, indent=1)
    os.replace(out_p + ".tmp", out_p)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
