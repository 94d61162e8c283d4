"""Scaling-efficiency harness: sharded-sampling throughput vs mesh size.

Runs the particle-sharded sampler at mesh sizes 1, 2, 4, 8 and reports
samples/s and parallel efficiency. On real multi-chip hardware this measures
ICI scaling; here it validates the sharded program and measures on whatever
devices are visible (set JAX_PLATFORMS=cpu +
XLA_FLAGS=--xla_force_host_platform_device_count=8 for the virtual mesh).

Usage: python scripts/scaling_bench.py [--nodes 50] [--samples_per_dev 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=50)
    ap.add_argument("--samples_per_dev", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.parallel.mesh import make_mesh
    from difusco_tpu.parallel.sampling import make_sharded_sampler
    from difusco_tpu.tasks.tsp import TSPTask

    n_dev = len(jax.devices())
    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=args.steps,
        inference_schedule="cosine", n_layers=args.layers,
        hidden_dim=args.hidden,
    )
    task = TSPTask(cfg)
    rng = np.random.default_rng(0)
    V = args.nodes
    pts = jnp.asarray(rng.random((V, 2)), jnp.float32)
    batch = {"points": np.asarray(pts)[None].repeat(2, 0),
             "adj": np.zeros((2, V, V), np.float32)}
    params = task.init_params(jax.random.PRNGKey(0), batch)

    results = []
    base = None
    for n in [m for m in (1, 2, 4, 8) if m <= n_dev]:
        mesh = make_mesh((n,), ("sample",))
        S = n * args.samples_per_dev
        sampler = make_sharded_sampler(task, mesh, S)
        key = jax.random.PRNGKey(1)
        h = sampler(params, pts, key)
        h.block_until_ready()
        t0 = time.perf_counter()
        iters = 3
        for i in range(iters):
            h = sampler(params, pts, jax.random.fold_in(key, i))
            h.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        sps = S / dt
        if base is None:
            base = sps
        eff = sps / (base * n)
        results.append({"devices": n, "samples_per_sec": round(sps, 2),
                        "efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    main()
