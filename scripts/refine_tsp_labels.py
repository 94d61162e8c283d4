"""Refine TSP split labels toward optimality (keep-if-better).

The committed splits carry NN+2-opt labels (no external Concorde/LKH in this
environment). This tool tightens them so measured gaps approach the paper's
gap-to-optimal metric: for every instance it takes the best of
  (a) the existing label tour,
  (b) the trained model's best-of-S sampled heatmaps -> merge + 2-opt decode,
  (c) the native MCTS solver seeded with the model heatmap
      (reference pipeline: convert_numpy_to_txt.py + tsp_mcts),
and rewrites the split with the winner. Labels can only improve, so any
solver's measured gap vs the refined labels is an upper bound on its true
gap vs these best-known tours.

Usage:
  python scripts/refine_tsp_labels.py --split data/tsp50/tsp50_test.txt \
      --ckpt checkpoints/tsp50_categorical_step1248 [--sparse_factor -1] \
      [--samples 8] [--mcts_time 0.05] [--two_opt_iterations 2000]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--sparse_factor", type=int, default=-1)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--mcts_time", type=float, default=0.05)
    ap.add_argument("--two_opt_iterations", type=int, default=2000)
    ap.add_argument("--no_mcts", action="store_true")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset, write_tsp_file
    from difusco_tpu.decode.mcts import (run_mcts, sparsify_heatmap,
                                         write_heatmap_txt)
    from difusco_tpu.ops.two_opt import tour_cost
    from difusco_tpu.tasks.tsp import TSPTask

    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine", n_layers=12, hidden_dim=256,
        sparse_factor=args.sparse_factor, parallel_sampling=args.samples,
        two_opt_iterations=args.two_opt_iterations, bf16=True,
    )
    task = TSPTask(cfg)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(os.path.abspath(args.ckpt), "default"))
    params = state["params"]

    ds = TSPDataset(args.split, sparse_factor=args.sparse_factor)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    key = jax.random.PRNGKey(20260818)

    refined = []
    improved_model = improved_mcts = 0
    tmp = tempfile.mkdtemp()
    for i in range(n):
        ex = ds.get(i)
        pts = np.asarray(ex["points"], np.float64)
        jpts = jnp.asarray(pts, jnp.float32)
        best_tour = np.asarray(ex["tour"])
        best_cost = float(tour_cost(jpts, jnp.asarray(best_tour)))

        nbrs = jnp.asarray(ex["neighbors"]) if "neighbors" in ex else None
        heat = task.sample(params, jpts, jax.random.fold_in(key, i),
                           args.samples, neighbors=nbrs)
        tours, costs, _ = task.decode(jpts, heat, neighbors=nbrs)
        j = int(jnp.argmin(costs))
        if float(costs[j]) < best_cost - 1e-9:
            best_cost = float(costs[j])
            best_tour = np.asarray(tours[j])
            improved_model += 1

        if not args.no_mcts:
            V = pts.shape[0]
            h = np.asarray(heat[j % heat.shape[0]], np.float64)
            if nbrs is not None:
                dense = np.zeros((V, V))
                nb = np.asarray(ex["neighbors"])
                dense[np.arange(V)[:, None].repeat(nb.shape[1], 1), nb] = h
                h = dense
            write_heatmap_txt(os.path.join(tmp, "h_0.txt"),
                              sparsify_heatmap(h, pts))
            # single-instance file for the solver
            one = os.path.join(tmp, "inst.txt")
            write_tsp_file(one, [(pts, best_tour)])
            run_mcts(one, os.path.join(tmp, "h_{i}.txt"),
                     os.path.join(tmp, "stats.txt"),
                     time_per_city=args.mcts_time, threads=1,
                     tours_path=os.path.join(tmp, "tours.txt"))
            line = open(os.path.join(tmp, "tours.txt")).readline().split()
            mt = np.asarray([int(x) - 1 for x in line], np.int64)
            if len(mt) == V + 1 and mt[0] == mt[-1]:
                mt = mt[:-1]  # solver emits closed tours
            assert len(set(mt.tolist())) == V and len(mt) == V, "bad MCTS tour"
            mt = np.concatenate([mt, mt[:1]])
            mc = float(tour_cost(jpts, jnp.asarray(mt)))
            if mc < best_cost - 1e-9:
                best_cost = mc
                best_tour = mt
                improved_mcts += 1

        refined.append((pts, best_tour))
        if (i + 1) % 16 == 0:
            print(f"  {i+1}/{n} refined (model wins {improved_model}, "
                  f"mcts wins {improved_mcts})", flush=True)

    # instances beyond --limit pass through unchanged
    for i in range(n, len(ds)):
        ex = ds.get(i)
        refined.append((np.asarray(ex["points"], np.float64),
                        np.asarray(ex["tour"])))
    write_tsp_file(args.split, refined)
    print(f"rewrote {args.split}: {improved_model} improved by model decode, "
          f"{improved_mcts} further improved by MCTS, "
          f"{len(ds) - improved_model - improved_mcts} unchanged")


if __name__ == "__main__":
    main()
