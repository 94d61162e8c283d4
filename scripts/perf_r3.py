"""Round-3 flagship perf decomposition (VERDICT r2 item 5).

Breaks the 8.7 ms flagship denoise step (TSP-50 dense, S=32, 12x256) into
model-forward vs posterior/PRNG cost, measures per-layer cost vs fixed
overhead, and times targeted variants:

  - rbg PRNG for the in-scan Bernoulli (threefry is ~10+ VPU ops/word)
  - fused Pallas layer with the current TI=8 tiling (grid S*Vp/8)

Usage: python scripts/perf_r3.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _setup(n_layers=12, fused=False, steps=50):
    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.tasks.tsp import TSPTask

    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=steps,
        inference_schedule="cosine", n_layers=n_layers, hidden_dim=256,
        bf16=True, fused_inference=fused,
    )
    task = TSPTask(cfg)
    if fused:
        task._force_fused = True
    rng = np.random.default_rng(0)
    V = 50
    pts = jnp.asarray(rng.random((V, 2)), jnp.float32)
    batch = {"points": np.asarray(pts)[None].repeat(2, 0),
             "adj": np.zeros((2, V, V), np.float32)}
    params = task.init_params(jax.random.PRNGKey(0), batch)
    return task, params, pts


def _time(fn, iters=5):
    fn()  # compile
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    iters = 3 if args.quick else 5

    import jax
    import jax.numpy as jnp

    from difusco_tpu import diffusion as dfn

    S, V, steps = 32, 50, 50
    results = {}

    # 1) full 50-step sample, stock XLA path
    task, params, pts = _setup()
    key = jax.random.PRNGKey(1)
    dt = _time(lambda: task.sample(params, pts, key, S).block_until_ready(),
               iters)
    results["full_xla_ms_per_step"] = dt / steps * 1e3
    results["full_xla_samples_per_sec"] = S / dt

    # 2) forward-only (jit model.apply, outside the scan)
    xt = (jax.random.normal(key, (S, V, V)) > 0).astype(jnp.float32)
    ptsb = jnp.broadcast_to(pts[None], (S, V, 2))
    tvec = jnp.full((S,), 500.0, jnp.float32)
    fwd = jax.jit(lambda p, t, x: task.model.apply(p, t, x, points=ptsb))
    dt = _time(lambda: fwd(params, tvec, xt).block_until_ready(), iters)
    results["forward12_ms"] = dt * 1e3

    # 3) 1-layer forward -> per-layer cost + fixed overhead
    task1, params1, _ = _setup(n_layers=1)
    fwd1 = jax.jit(lambda p, t, x: task1.model.apply(p, t, x, points=ptsb))
    dt1 = _time(lambda: fwd1(params1, tvec, xt).block_until_ready(), iters)
    results["forward1_ms"] = dt1 * 1e3
    results["per_layer_ms"] = (results["forward12_ms"] - dt1 * 1e3) / 11.0

    # 4) posterior+PRNG-only: 50-step scan of categorical_posterior with a
    #    frozen logits tensor (no model) — isolates the non-model scan cost
    logits = fwd(params, tvec, xt)

    def posterior_only(key):
        probs = jax.nn.softmax(logits, axis=-1)

        def step(carry, pair):
            x, k = carry
            k, sub = jax.random.split(k)
            x = dfn.categorical_posterior(task.sched, pair[0], pair[1],
                                          probs, x, sub)
            return (x, k), None

        (x, _), _ = jax.lax.scan(step, (xt, key), task.time_pairs)
        return x

    po = jax.jit(posterior_only)
    dt = _time(lambda: po(key).block_until_ready(), iters)
    results["posterior_ms_per_step"] = dt / steps * 1e3

    # 5) same with rbg PRNG keys (XLA RngBitGenerator: far cheaper than
    #    threefry's per-word arithmetic on TPU)
    rkey = jax.random.key(1, impl="rbg")
    dt = _time(lambda: po(rkey).block_until_ready(), iters)
    results["posterior_rbg_ms_per_step"] = dt / steps * 1e3

    # 6) full sample with an rbg key end-to-end
    dt = _time(lambda: task.sample(params, pts, rkey, S).block_until_ready(),
               iters)
    results["full_xla_rbg_ms_per_step"] = dt / steps * 1e3
    results["full_xla_rbg_samples_per_sec"] = S / dt

    # 7) fused Pallas path (current TI=8 tiling), threefry and rbg
    taskf, paramsf, _ = _setup(fused=True)
    dt = _time(lambda: taskf.sample(paramsf, pts, key, S).block_until_ready(),
               iters)
    results["full_fused_ms_per_step"] = dt / steps * 1e3
    dt = _time(lambda: taskf.sample(paramsf, pts, rkey, S).block_until_ready(),
               iters)
    results["full_fused_rbg_ms_per_step"] = dt / steps * 1e3
    results["full_fused_rbg_samples_per_sec"] = S / (dt)

    for k, v in results.items():
        print(f"{k:38s} {v:10.3f}")


if __name__ == "__main__":
    main()
