"""Pre-build the AOT executable blobs bench.py's gap sections load
(data/aot/gap_<ckpt>_{sample,decode}_*.aot) and assert numeric parity
between the AOT path and task.evaluate_instance on instance 0 of each
split — the two must produce the same solved cost since bench_gap
replicates the exact key folding (VERDICT r3 item 6: reclaim the
~270 s/round recompile burn; the persistent XLA cache never hits on the
remote-tunnel backend).

Run on the real chip: python scripts/build_gap_aot.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [
    ("tsp50_categorical_v3", "categorical", "data/tsp50/tsp50_test.txt", 4),
    ("tsp50_gaussian_v2", "gaussian", "data/tsp50/tsp50_test.txt", 4),
    ("tsp100_categorical_v3", "categorical", "data/tsp100/tsp100_test.txt",
     4),
    # best-of-16: the paper's TSP-100 sampling protocol (16x)
    ("tsp100_categorical_v3", "categorical", "data/tsp100/tsp100_test.txt",
     16),
]


def main():
    import jax
    import jax.numpy as jnp

    from bench import _restore_ckpt
    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.tasks.tsp import TSPTask
    from difusco_tpu.utils.aot_cache import aot_load_or_compile
    from difusco_tpu.utils.tours import tour_cost_np

    for ckpt, dtype, test_rel, S in CONFIGS:
        params = _restore_ckpt(ckpt)
        if params is None:
            print(f"{ckpt}: no checkpoint; skipped")
            continue
        gaussian = dtype == "gaussian"
        cfg = Config(
            task="tsp", diffusion_type=dtype,
            diffusion_schedule="linear" if gaussian else "cosine",
            diffusion_steps=1000, inference_diffusion_steps=50,
            inference_schedule="cosine",
            inference_trick="ddim" if gaussian else None,
            n_layers=12, hidden_dim=256,
            parallel_sampling=S, two_opt_iterations=1000, bf16=True,
        )
        task = TSPTask(cfg)
        ds = TSPDataset(os.path.join(REPO, *test_rel.split("/")))
        ex = ds.get(0)
        V = ex["points"].shape[0]
        pts = jnp.asarray(ex["points"])
        pts_s = jax.ShapeDtypeStruct((V, 2), jnp.float32)
        heat_s = jax.ShapeDtypeStruct((S, V, V), jnp.float32)
        # S in the NAME: static args are invisible to the signature hash
        stag = "" if S == 4 else f"_S{S}"
        t0 = time.time()
        sample_fn = aot_load_or_compile(
            task.sample, f"gap_{ckpt}{stag}_sample",
            (params, pts_s, jax.random.PRNGKey(0), S))
        decode_fn = aot_load_or_compile(
            jax.jit(task.decode), f"gap_{ckpt}{stag}_decode", (pts_s, heat_s))
        t1 = time.time()

        # parity vs the evaluate_instance path at the bench's exact keys —
        # for EVERY config by default (the gaussian DDIM sampler is a
        # genuinely different code path from the categorical one; advisor
        # r4 #3). Each check doubles that config's compile bill
        # (evaluate_instance re-compiles through its own jit cache); set
        # GAP_AOT_PARITY_FIRST_ONLY=1 to skip when iterating on blobs.
        if CONFIGS.index((ckpt, dtype, test_rel, S)) > 0 \
                and os.environ.get("GAP_AOT_PARITY_FIRST_ONLY", "0") == "1":
            print(f"{ckpt}: built in {t1 - t0:.0f}s (parity checked on the "
                  "first config only)")
            continue
        key = jax.random.PRNGKey(0)
        ki = jax.random.fold_in(jax.random.fold_in(key, 0), 0)
        heat = sample_fn(params, pts, ki)
        _, cst, _ = decode_fn(pts, heat)
        best = float(jnp.min(cst))
        ref = task.evaluate_instance(
            params, pts, jnp.asarray(ex["tour"]),
            jax.random.fold_in(key, 0))
        gt_np = float(tour_cost_np(np.asarray(ex["points"]),
                                   np.asarray(ex["tour"])))
        d_solved = abs(best - ref["solved_cost"]) / max(ref["solved_cost"],
                                                        1e-9)
        d_gt = abs(gt_np - ref["gt_cost"]) / max(ref["gt_cost"], 1e-9)
        print(f"{ckpt}: built in {t1 - t0:.0f}s; parity solved "
              f"{d_solved:.2e} gt {d_gt:.2e}")
        assert d_solved < 1e-5, (ckpt, best, ref["solved_cost"])
        assert d_gt < 1e-5, (ckpt, gt_np, ref["gt_cost"])
    print("GAP_AOT_DONE")


if __name__ == "__main__":
    main()
