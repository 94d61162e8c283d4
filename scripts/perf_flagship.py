"""Flagship (TSP-50 dense) sampling throughput experiments.

Sweeps batch size and the fused-kernel gate to find the best samples/s/chip
configuration, and reports analytic MFU for each point (VERDICT r1 item 5).

Usage: python scripts/perf_flagship.py [--profile_dir /tmp/trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_one(S, fused, steps=50, V=50, iters=5):
    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.tasks.tsp import TSPTask

    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=steps,
        inference_schedule="cosine", n_layers=12, hidden_dim=256,
        bf16=True, fused_inference=fused,
    )
    task = TSPTask(cfg)
    if fused:
        # bypass the pad-waste gate for measurement
        task._force_fused = True
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.random((V, 2)), jnp.float32)
    batch = {"points": np.asarray(pts)[None].repeat(2, 0),
             "adj": np.zeros((2, V, V), np.float32)}
    params = task.init_params(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    heat = task.sample(params, pts, key, S)
    heat.block_until_ready()
    heat = task.sample(params, pts, key, S)
    heat.block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        heat = task.sample(params, pts, jax.random.fold_in(key, i), S)
        heat.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return S / dt, S * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile_dir", default=None)
    ap.add_argument("--fused_only", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import dense_gnn_flops_per_forward, tpu_peak_bf16_flops

    flops = dense_gnn_flops_per_forward(50, 256, 12)
    peak = tpu_peak_bf16_flops() or 197e12

    for fused in ((True,) if args.fused_only else (False, True)):
        for S in (32, 64, 128, 256):
            try:
                sps, steps_ps = bench_one(S, fused)
                mfu = steps_ps * flops / peak
                print(f"fused={fused} S={S}: {sps:8.1f} samples/s "
                      f"{steps_ps:9.0f} steps/s  MFU={mfu*100:5.2f}%",
                      flush=True)
            except Exception as e:
                print(f"fused={fused} S={S}: FAILED {type(e).__name__}: {e}",
                      flush=True)

    if args.profile_dir:
        import jax

        from difusco_tpu.config import Config
        from difusco_tpu.tasks.tsp import TSPTask
        import jax.numpy as jnp

        cfg = Config(task="tsp", diffusion_type="categorical",
                     diffusion_schedule="cosine", diffusion_steps=1000,
                     inference_diffusion_steps=50, inference_schedule="cosine",
                     n_layers=12, hidden_dim=256, bf16=True)
        task = TSPTask(cfg)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.random((50, 2)), jnp.float32)
        batch = {"points": np.asarray(pts)[None].repeat(2, 0),
                 "adj": np.zeros((2, 50, 50), np.float32)}
        params = task.init_params(jax.random.PRNGKey(0), batch)
        heat = task.sample(params, pts, jax.random.PRNGKey(1), 32)
        heat.block_until_ready()
        with jax.profiler.trace(args.profile_dir):
            heat = task.sample(params, pts, jax.random.PRNGKey(2), 32)
            heat.block_until_ready()
        print(f"trace written to {args.profile_dir}")


if __name__ == "__main__":
    main()
