"""Pre-build AOT executable blobs for bench.py's SPARSE sections
(data/aot/sparse_<ckpt>_V<V>_k<K>_S<S>_t<2opt>_{sample,decode}_*.aot) and
assert numeric parity vs task.evaluate_instance on instance 0 of each
split (VERDICT r4 item 3: the live tsp10000 section has been skipped in
every driver round — cold V=10000 compile alone is ~10 min; with these
blobs it fits the deadline).

Configs mirror bench.bench_tsp_sparse's exact cfg fields, and the smoke
config mirrors bench_mcts_tsp500's S=1 sampler (sample-only; no parity
assert needed beyond execution since it feeds the offline MCTS solver).

Run on the real chip: python scripts/build_sparse_aot.py [--only tsp10000]
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (tag, ckpt, test_rel, k, S, two_opt_iterations, parity)
CONFIGS = [
    ("tsp500", "tsp500_sparse_categorical", "data/tsp500_test.txt",
     50, 4, 1000, True),
    ("tsp500_smoke", "tsp500_sparse_categorical", "data/tsp500_test.txt",
     50, 1, 1000, False),
    ("tsp1000", "tsp1000_sparse_categorical", "data/tsp1000/tsp1000_test.txt",
     100, 4, 1000, True),
    ("tsp10000", "tsp1000_sparse_categorical",
     "data/tsp10000/tsp10000_test.txt", 100, 1, 5000, True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated config tags to (re)build")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp

    from bench import _restore_ckpt
    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.tasks.tsp import TSPTask
    from difusco_tpu.utils.aot_cache import aot_load_or_compile

    for tag, ckpt, test_rel, k, S, t2, parity in CONFIGS:
        if only and tag not in only:
            continue
        test_file = os.path.join(REPO, *test_rel.split("/"))
        params = _restore_ckpt(ckpt)
        if params is None or not os.path.exists(test_file):
            print(f"{tag}: missing checkpoint or split; skipped")
            continue
        cfg = Config(
            task="tsp", diffusion_type="categorical",
            diffusion_schedule="cosine", diffusion_steps=1000,
            inference_diffusion_steps=50, inference_schedule="cosine",
            n_layers=12, hidden_dim=256, sparse_factor=k,
            parallel_sampling=S, two_opt_iterations=t2, bf16=True,
        )
        task = TSPTask(cfg)
        ds = TSPDataset(test_file, sparse_factor=k)
        ex = ds.get(0)
        V, K = ex["neighbors"].shape
        pts_s = jax.ShapeDtypeStruct((V, 2), jnp.float32)
        nbr_s = jax.ShapeDtypeStruct((V, K), jnp.int32)
        heat_s = jax.ShapeDtypeStruct((S, V, K), jnp.float32)
        name = f"sparse_{ckpt}_V{V}_k{k}_S{S}_t{t2}"
        t0 = time.time()
        sample_fn = aot_load_or_compile(
            task.sample, f"{name}_sample",
            (params, pts_s, jax.random.PRNGKey(0), S),
            kwargs={"neighbors": nbr_s})
        t1 = time.time()
        if tag.endswith("_smoke"):
            print(f"{tag}: sample built in {t1 - t0:.0f}s (sample-only)")
            continue
        # V=10000: the whole-decode single program crashes the TPU worker
        # (measured, r5) — bench uses task.decode's internal jits there
        decode_fn = None
        if V <= 2000:
            decode_fn = aot_load_or_compile(
                jax.jit(task.decode), f"{name}_decode", (pts_s, heat_s),
                kwargs={"neighbors": nbr_s})
        t2s = time.time()
        if not parity:
            print(f"{tag}: built in {t2s - t0:.0f}s")
            continue
        # parity vs the evaluate_instance path at bench_tsp_sparse's keys
        from difusco_tpu.utils.tours import tour_cost_np

        key = jax.random.PRNGKey(0)
        pts = jnp.asarray(ex["points"])
        nbrs = jnp.asarray(ex["neighbors"])
        ki = jax.random.fold_in(jax.random.fold_in(key, 0), 0)
        heat = sample_fn(params, pts, ki, neighbors=nbrs)
        if decode_fn is not None:
            _, cst, _ = decode_fn(pts, heat, neighbors=nbrs)
        else:
            _, cst, _ = task.decode(pts, heat, neighbors=nbrs)
        best = float(jnp.min(cst))
        ref = task.evaluate_instance(
            params, pts, jnp.asarray(ex["tour"]),
            jax.random.fold_in(key, 0), neighbors=nbrs)
        gt_np = float(tour_cost_np(np.asarray(ex["points"]),
                                   np.asarray(ex["tour"])))
        d_solved = abs(best - ref["solved_cost"]) / max(ref["solved_cost"],
                                                        1e-9)
        d_gt = abs(gt_np - ref["gt_cost"]) / max(ref["gt_cost"], 1e-9)
        print(f"{tag}: sample {t1 - t0:.0f}s decode {t2s - t1:.0f}s; "
              f"parity solved {d_solved:.2e} gt {d_gt:.2e}")
        assert d_solved < 1e-5, (tag, best, ref["solved_cost"])
        assert d_gt < 1e-5, (tag, gt_np, ref["gt_cost"])
    print("SPARSE_AOT_DONE")


if __name__ == "__main__":
    main()
