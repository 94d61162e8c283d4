"""Leg-boundary TPU session: megakernel benchmark + profile + AOT blobs.

Runs in the training pause between leg 1 and leg 2 (~10 min of chip time):
  1. benchmark sparse TSP-500 S=4 sampling: mega vs per-layer-fused kernels
     (the VERDICT r3 item-4 signature config), plus S=8;
  2. a jax.profiler trace of one fused and one mega sample call, so the
     ROOFLINE.md bottleneck claims rest on measured op times;
  3. generate + serialize the AOT executables bench loads at driver time
     (flagship dense V=50 S=32 sampler; sparse V=500 S=4 mega sampler).

Writes /tmp/bench_mega.json; traces under /tmp/mega_trace/.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = {}


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.tasks.tsp import TSPTask

    # --- 1. mega vs fused at the signature configs -----------------------
    for S in (4, 8):
        r = bench.bench_sparse_throughput(S=S, n_iters=3, both_kernels=False)
        OUT[f"tsp500_S{S}"] = r
        print(f"S={S}: {r}", flush=True)

    # --- 2. profile one call of each variant -----------------------------
    params = bench._restore_ckpt("tsp500_sparse_categorical")
    ds = TSPDataset(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "tsp500_test.txt"),
        sparse_factor=50)
    ex = ds.get(0)
    pts = jnp.asarray(ex["points"])
    nbrs = jnp.asarray(ex["neighbors"])
    key = jax.random.PRNGKey(0)
    for tag, mega in (("fused", False), ("mega", True)):
        cfg = Config(
            task="tsp", diffusion_type="categorical",
            diffusion_schedule="cosine", diffusion_steps=1000,
            inference_diffusion_steps=50, inference_schedule="cosine",
            n_layers=12, hidden_dim=256, sparse_factor=50,
            parallel_sampling=4, bf16=True, mega_kernel=mega,
        )
        task = TSPTask(cfg)
        h = task.sample(params, pts, key, 4, neighbors=nbrs)
        h.block_until_ready()
        os.makedirs(f"/tmp/mega_trace/{tag}", exist_ok=True)
        jax.profiler.start_trace(f"/tmp/mega_trace/{tag}")
        h = task.sample(params, pts, key, 4, neighbors=nbrs)
        h.block_until_ready()
        jax.profiler.stop_trace()
        print(f"trace {tag} written", flush=True)

    # --- 1b. flagship dense V=50 S=32: mega vs current (XLA) path --------
    import bench as bench_mod

    for mega in (False, True):
        cfg = Config(
            task="tsp", diffusion_type="categorical",
            diffusion_schedule="cosine", diffusion_steps=1000,
            inference_diffusion_steps=50, inference_schedule="cosine",
            n_layers=12, hidden_dim=256, bf16=True, mega_kernel=mega,
        )
        task = TSPTask(cfg)
        rng = np.random.default_rng(0)
        fpts = jnp.asarray(rng.random((50, 2)), jnp.float32)
        batch = {"points": np.asarray(fpts)[None].repeat(2, 0),
                 "adj": np.zeros((2, 50, 50), np.float32)}
        fparams = task.init_params(jax.random.PRNGKey(0), batch)
        key = jax.random.PRNGKey(1)
        h = task.sample(fparams, fpts, key, 32)
        h.block_until_ready()
        t0 = time.perf_counter()
        for i in range(5):
            h = task.sample(fparams, fpts, jax.random.fold_in(key, i), 32)
            h.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        OUT[f"flagship_samples_per_sec_{'mega' if mega else 'xla'}"] = round(
            32 / dt, 2)
        print(f"flagship mega={mega}: {round(32 / dt, 2)} samples/s",
              flush=True)

    # --- 2b. decode-quality parity: the mega kernel is now the default
    # categorical sparse path, so the solved costs it produces must match
    # the per-layer kernel's within sampling noise ------------------------
    gaps = {}
    for tag, mega in (("fused", False), ("mega", True)):
        cfg = Config(
            task="tsp", diffusion_type="categorical",
            diffusion_schedule="cosine", diffusion_steps=1000,
            inference_diffusion_steps=50, inference_schedule="cosine",
            n_layers=12, hidden_dim=256, sparse_factor=50,
            parallel_sampling=4, two_opt_iterations=1000, bf16=True,
            mega_kernel=mega,
        )
        task = TSPTask(cfg)
        costs = []
        for i in range(4):
            exi = ds.get(i)
            m = task.evaluate_instance(
                params, jnp.asarray(exi["points"]), jnp.asarray(exi["tour"]),
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                neighbors=jnp.asarray(exi["neighbors"]))
            costs.append(m["solved_cost"])
        gaps[tag] = costs
        print(f"decode {tag}: {costs}", flush=True)
    OUT["decode_costs_fused"] = gaps["fused"]
    OUT["decode_costs_mega"] = gaps["mega"]

    # --- 3. AOT blobs for the bench samplers -----------------------------
    from difusco_tpu.utils.aot_cache import aot_load_or_compile

    rng = np.random.default_rng(0)
    fl_cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine", n_layers=12, hidden_dim=256, bf16=True,
    )
    fl_task = TSPTask(fl_cfg)
    fpts = jnp.asarray(rng.random((50, 2)), jnp.float32)
    batch = {"points": np.asarray(fpts)[None].repeat(2, 0),
             "adj": np.zeros((2, 50, 50), np.float32)}
    fparams = fl_task.init_params(jax.random.PRNGKey(0), batch)
    t0 = time.time()
    compiled = aot_load_or_compile(
        fl_task.sample, "flagship_dense_V50_S32",
        (fparams, fpts, jax.random.PRNGKey(1), 32))
    OUT["aot_flagship_build_s"] = round(time.time() - t0, 1)
    r1 = compiled(fparams, fpts, jax.random.PRNGKey(1))
    r2 = fl_task.sample(fparams, fpts, jax.random.PRNGKey(1), 32)
    OUT["aot_flagship_parity"] = float(jnp.max(jnp.abs(r1 - r2)))
    print("flagship aot ok", OUT["aot_flagship_parity"], flush=True)

    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine", n_layers=12, hidden_dim=256,
        sparse_factor=50, parallel_sampling=4, bf16=True,
    )
    task = TSPTask(cfg)
    t0 = time.time()
    compiled = aot_load_or_compile(
        task.sample, "sparse_V500_k50_S4",
        (params, pts, jax.random.PRNGKey(1), 4), {"neighbors": nbrs})
    OUT["aot_sparse_build_s"] = round(time.time() - t0, 1)
    r1 = compiled(params, pts, jax.random.PRNGKey(1), neighbors=nbrs)
    r2 = task.sample(params, pts, jax.random.PRNGKey(1), 4, neighbors=nbrs)
    OUT["aot_sparse_parity"] = float(jnp.max(jnp.abs(r1 - r2)))
    print("sparse aot ok", OUT["aot_sparse_parity"], flush=True)

    sizes = {f: os.path.getsize(os.path.join("data/aot", f)) // 1024
             for f in os.listdir("data/aot")} if os.path.isdir("data/aot") else {}
    OUT["aot_blob_kib"] = sizes
    with open("/tmp/bench_mega.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
