"""Generate a labeled TSP-50 dataset with batched on-device 2-opt.

Labels are NN-construction + exhaustive 2-opt (the built-in labeler; see
difusco_tpu/data/generate_tsp.py). Batched over instances so the device
solves hundreds of tours per dispatch.

Usage: python scripts/make_tsp50_dataset.py --out_dir data/tsp50 \\
           [--n_train 20000] [--n_val 128] [--n_test 256] [--nodes 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gen_split(n, nodes, seed, batch=256):
    import jax.numpy as jnp

    from difusco_tpu.data.generate_tsp import nearest_neighbor_tour
    from difusco_tpu.ops.two_opt import batched_two_opt

    rng = np.random.default_rng(seed)
    out = []
    t0 = time.time()
    for s in range(0, n, batch):
        b = min(batch, n - s)
        pts = rng.random((batch, nodes, 2))  # fixed shape -> one compile
        tours = np.stack([nearest_neighbor_tour(p) for p in pts])
        refined, _ = batched_two_opt(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(tours),
            max_iterations=2000,
        )
        refined = np.asarray(refined)
        for i in range(b):
            out.append((pts[i], refined[i]))
        if s % (batch * 4) == 0:
            rate = (s + b) / max(time.time() - t0, 1e-9)
            print(f"  {s + b}/{n} ({rate:.0f} inst/s)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_train", type=int, default=20000)
    ap.add_argument("--n_val", type=int, default=128)
    ap.add_argument("--n_test", type=int, default=256)
    ap.add_argument("--nodes", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from difusco_tpu.data.tsp import write_tsp_file

    os.makedirs(args.out_dir, exist_ok=True)
    for split, n, seed in [
        ("train", args.n_train, 0),
        ("val", args.n_val, 10_000_001),
        ("test", args.n_test, 20_000_002),
    ]:
        path = os.path.join(args.out_dir, f"tsp{args.nodes}_{split}.txt")
        print(f"generating {split}: {n} instances -> {path}")
        write_tsp_file(path, gen_split(n, args.nodes, seed, batch=args.batch))


if __name__ == "__main__":
    main()
