"""Evaluate an ER-[700-800] MIS checkpoint on the 128-graph test split.

Reports the reference-parity greedy-decode ratio AND the on-device
local-search-refined ratio (ops/mis_local_search.py), both best-of-4
parallel samples (the reference ER eval config,
reproducing_scripts.md:340-368).

Usage:
  python scripts/eval_mis_er700800.py --ckpt models/.../checkpoints/best/<step> \
      [--diffusion_type gaussian] [--n 128] [--ls_rounds 2048] [--publish NAME]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--diffusion_type", default="gaussian")
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--ls_rounds", type=int, default=2048)
    ap.add_argument("--ls_replicas", type=int, default=2)
    ap.add_argument("--parallel_sampling", type=int, default=4)
    ap.add_argument("--publish", default=None,
                    help="also copy the checkpoint to checkpoints/<NAME>")
    args = ap.parse_args()

    import jax
    import orbax.checkpoint as ocp

    from difusco_tpu.config import Config
    from difusco_tpu.data.mis import MISDataset
    from difusco_tpu.tasks.mis import MISTask

    gaussian = args.diffusion_type == "gaussian"
    cfg = Config(
        task="mis", diffusion_type=args.diffusion_type,
        diffusion_schedule="linear" if gaussian else "cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine",
        inference_trick="ddim" if gaussian else None,
        n_layers=12, hidden_dim=256,
        parallel_sampling=args.parallel_sampling, bf16=True,
        mis_local_search_rounds=args.ls_rounds,
        mis_local_search_replicas=args.ls_replicas,
    )
    task = MISTask(cfg)
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.join(os.path.abspath(args.ckpt), "default"))
    from difusco_tpu.train.checkpoint import as_variables

    params = as_variables(state)

    ds = MISDataset("data/mis_er700800_test/*.gpickle*")
    n = min(args.n, len(ds))
    key = jax.random.PRNGKey(0)
    greedy, ls, gt = [], [], []
    t0 = time.time()
    for i in range(n):
        m = task.evaluate_instance(params, ds.get(i), jax.random.fold_in(key, i))
        greedy.append(m["solved_cost"])
        ls.append(m.get("solved_cost_ls", m["solved_cost"]))
        gt.append(m["gt_cost"])
        if i % 8 == 7:
            print(f"  {i+1}/{n}: greedy={np.mean(greedy):.2f} "
                  f"ls={np.mean(ls):.2f} gt={np.mean(gt):.2f} "
                  f"({(time.time()-t0)/(i+1):.1f}s/inst)", flush=True)
    greedy, ls, gt = map(np.asarray, (greedy, ls, gt))
    print(f"n={n}")
    print(f"greedy decode:  mean={greedy.mean():.3f}  "
          f"ratio_vs_labels={greedy.mean()/gt.mean():.4f}")
    print(f"greedy+LS:      mean={ls.mean():.3f}  "
          f"ratio_vs_labels={ls.mean()/gt.mean():.4f}")
    print(f"labels (ILS):   mean={gt.mean():.3f}")

    if args.publish:
        import shutil

        dst = os.path.join("checkpoints", args.publish)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        # publish weights-only (bench loads state["params"] or raw params)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(os.path.join(dst, "default")),
                       {"params": params["params"] if "params" in params
                        else params})
        print(f"published to {dst}")


if __name__ == "__main__":
    main()
