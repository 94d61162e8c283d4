"""Bulk keep-if-better label refinement for dense TSP train splits.

Bootstrap labeling: the committed generator labels instances with NN+2-opt;
this tool upgrades a whole split with the trained model's best-of-S decode
(sampling, merge and 2-opt all on device, chunked B instances at a time so
each dispatch carries B*S trajectories). Labels only improve. Used to build
the strong-label train sets the extended checkpoints are trained on
(the reference trains on Concorde-optimal labels; this is the in-framework
equivalent when no external solver is installed).

Usage:
  python scripts/bulk_label_tsp.py --split data/tsp50/tsp50_train.txt \
      --ckpt checkpoints/tsp50_categorical_step1248 [--samples 4] [--chunk 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--two_opt_iterations", type=int, default=1000)
    ap.add_argument("--limit", type=int, default=0,
                    help="refine only the first N instances (0 = all); the "
                         "rest pass through unchanged")
    ap.add_argument("--out", default=None,
                    help="output path (default: rewrite --split in place)")
    ap.add_argument("--resume_from", default=None,
                    help="a <out>.partial file from an interrupted run; its "
                         "refined prefix is reused instead of recomputed")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset, write_tsp_file
    from difusco_tpu.ops.merge import merge_heatmap_device
    from difusco_tpu.ops.two_opt import batched_two_opt, tour_cost
    from difusco_tpu.tasks.tsp import TSPTask

    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine", n_layers=12, hidden_dim=256, bf16=True,
    )
    task = TSPTask(cfg)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(os.path.abspath(args.ckpt), "default"))
    params = state["params"]

    S, B = args.samples, args.chunk

    @jax.jit
    def decode_chunk(pts, keys, label_tours):
        """pts (B,V,2), keys (B,2), label_tours (B,V+1) ->
        (best_tours (B,V+1), best_costs, label_costs)."""
        heats = jax.vmap(lambda p, k: task._sample(params, p, k, S))(pts, keys)
        tours, _ = jax.vmap(merge_heatmap_device)(pts, heats)  # (B,S,V+1)
        V = pts.shape[1]
        flat = tours.reshape(B * S, V + 1)
        rep = jnp.repeat(pts, S, axis=0)
        flat, _ = batched_two_opt(rep, flat, args.two_opt_iterations)
        costs = jax.vmap(tour_cost)(rep, flat).reshape(B, S)
        best = jnp.argmin(costs, axis=1)
        best_tours = flat.reshape(B, S, V + 1)[jnp.arange(B), best]
        best_costs = costs[jnp.arange(B), best]
        label_costs = jax.vmap(tour_cost)(pts, label_tours)
        return best_tours, best_costs, label_costs

    ds = TSPDataset(args.split)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    out_path = args.out or args.split
    key = jax.random.PRNGKey(77)
    out = []
    improved = 0
    start = 0
    if args.resume_from:
        # seed the refined prefix from a crash-safe .partial file and skip it
        part = TSPDataset(args.resume_from)
        for i in range(len(part)):
            ex = part.get(i)
            out.append((np.asarray(ex["points"], np.float64),
                        np.asarray(ex["tour"])))
        start = (len(part) // B) * B  # re-refine any ragged tail chunk
        out = out[:start]
        print(f"resumed {start} refined instances from {args.resume_from}")
    t0 = time.time()
    for s in range(start, n, B):
        idx = list(range(s, min(s + B, n)))
        exs = [ds.get(i) for i in idx]
        # pad the tail chunk to B for a single compiled shape
        while len(exs) < B:
            exs.append(exs[-1])
        pts = jnp.asarray(np.stack([e["points"] for e in exs]), jnp.float32)
        lts = jnp.asarray(np.stack([e["tour"] for e in exs]))
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(s, s + B))
        bt, bc, lc = decode_chunk(pts, keys, lts)
        bt, bc, lc = np.asarray(bt), np.asarray(bc), np.asarray(lc)
        for j, i in enumerate(idx):
            if bc[j] < lc[j] - 1e-9:
                out.append((np.asarray(exs[j]["points"], np.float64), bt[j]))
                improved += 1
            else:
                out.append((np.asarray(exs[j]["points"], np.float64),
                            np.asarray(exs[j]["tour"])))
        # crash-safe partial output every chunk; --resume_from picks it up
        write_tsp_file(out_path + ".partial.tmp", out)
        os.replace(out_path + ".partial.tmp", out_path + ".partial")
        if (s // B) % 20 == 0:
            rate = (s + B - start) / max(time.time() - t0, 1e-9)
            print(f"  {s + len(idx)}/{n} ({rate:.0f} inst/s, "
                  f"{improved} improved)", flush=True)

    # instances beyond --limit pass through unchanged
    for i in range(n, len(ds)):
        ex = ds.get(i)
        out.append((np.asarray(ex["points"], np.float64),
                    np.asarray(ex["tour"])))
    write_tsp_file(out_path + ".tmp", out)
    os.replace(out_path + ".tmp", out_path)
    if os.path.exists(out_path + ".partial"):
        os.remove(out_path + ".partial")
    print(f"rewrote {out_path}: {improved}/{n} labels improved")


if __name__ == "__main__":
    main()
