"""Reference-protocol MCTS evaluation for the large TSP splits.

The reference's headline TSP-1000/10000 numbers come from MCTS decode over
diffusion heatmaps (tsp_mcts/solve-1000.sh, solve-10000.sh): 128 / 16
instances, Param_T = 0.10 s/city wall budget each, with the TSP-10000
heatmaps first converted through merge + 2-opt so MCTS is seeded by the
decoded tour's edges (convert_numpy_with_2opt.py:55-112). This script runs
that protocol with this framework's checkpoints + native solver, in three
resumable phases so the TPU (sampling) and CPU (convert + solve) work can
be scheduled independently:

  1. sample   (TPU)  raw sparse heatmaps (+ the merge/2-opt tour at 10000)
                     cached as data/mcts_heatmaps_tsp{V}/raw_{i}.npz
  2. convert  (CPU)  sparsify (distance prior + top-quantile/top-3,
                     expected_valid_prob 0.01 / 0.00128 per solve-*.sh) ->
                     SPARSE text heatmaps for the native solver
  3. solve    (CPU)  native MCTS at --time 0.10 s/city; stats JSON with
                     per-instance costs, gap vs current labels, gap vs the
                     certified Held-Karp lower bounds

Usage: python scripts/run_mcts_protocol_large.py --split 1000 --phase sample
       python scripts/run_mcts_protocol_large.py --split 1000 --phase convert
       python scripts/run_mcts_protocol_large.py --split 1000 --phase solve
       (--phase all runs everything; phases skip work already on disk)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPLITS = {
    1000: dict(
        test_file=os.path.join(REPO, "data", "tsp1000", "tsp1000_test.txt"),
        ckpt="tsp1000_sparse_categorical",
        k=100,
        n=128,
        evp=0.01,        # solve-1000.sh --expected_valid_prob
        with_2opt=False,
        hk=os.path.join(REPO, "data", "hk_lb", "tsp1000_test_hk.json"),
    ),
    10000: dict(
        test_file=os.path.join(REPO, "data", "tsp10000", "tsp10000_test.txt"),
        ckpt="tsp1000_sparse_categorical",  # same transfer as the offline eval
        k=100,
        n=16,
        evp=0.00128,     # solve-10000.sh --expected_valid_prob
        with_2opt=True,  # convert_numpy_with_2opt.py path
        hk=os.path.join(REPO, "data", "hk_lb", "tsp10000_test_hk.json"),
    ),
}


def heat_dir(split):
    return os.path.join(REPO, "data", f"mcts_heatmaps_tsp{split}")


def phase_sample(split, n):
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.tasks.tsp import TSPTask

    sp = SPLITS[split]
    out_dir = heat_dir(split)
    os.makedirs(out_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(
            os.path.join(REPO, "checkpoints", sp["ckpt"], "default"))["params"]
    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine", n_layers=12, hidden_dim=256,
        sparse_factor=sp["k"], parallel_sampling=1,
        two_opt_iterations=5000, bf16=True,
    )
    task = TSPTask(cfg)
    ds = TSPDataset(sp["test_file"], sparse_factor=sp["k"])
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(min(n, len(ds))):
        out = os.path.join(out_dir, f"raw_{i}.npz")
        if os.path.exists(out):
            continue
        ex = ds.get(i)
        pts = jnp.asarray(ex["points"])
        nbrs = jnp.asarray(ex["neighbors"])
        heat = task.sample(params, pts, jax.random.fold_in(key, i), 1,
                           neighbors=nbrs)
        payload = dict(
            heat=np.asarray(heat[0], np.float32),
            neighbors=np.asarray(ex["neighbors"], np.int32),
        )
        if sp["with_2opt"]:
            tours, costs, _ = task.decode(pts, heat, neighbors=nbrs)
            payload["tour"] = np.asarray(tours[0], np.int32)
            payload["decode_cost"] = np.float64(costs[0])
        tmp = out + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, out)
        print(f"  raw {i} ({time.time() - t0:.0f}s)", flush=True)


def phase_convert(split, n):
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.decode.mcts import (
        sparsify_heatmap_large, tour_edges_heatmap, write_heatmap_sparse_txt)

    sp = SPLITS[split]
    out_dir = heat_dir(split)
    ds = TSPDataset(sp["test_file"])
    t0 = time.time()
    for i in range(min(n, len(ds))):
        out = os.path.join(out_dir, f"heatmap_{i}.txt")
        raw_p = os.path.join(out_dir, f"raw_{i}.npz")
        if os.path.exists(out) or not os.path.exists(raw_p):
            continue
        raw = np.load(raw_p)
        pts = np.asarray(ds.get(i)["points"], np.float32)
        V = pts.shape[0]
        if sp["with_2opt"]:
            dense = tour_edges_heatmap(raw["tour"][None], V).astype(np.float32)
        else:
            dense = np.zeros((V, V), np.float32)
            nb = raw["neighbors"]
            rows = np.arange(V)[:, None].repeat(nb.shape[1], 1)
            dense[rows, nb] = raw["heat"]
        r, c, v = sparsify_heatmap_large(dense, pts, sp["evp"])
        tmp = out + ".tmp"
        write_heatmap_sparse_txt(tmp, V, r, c, v)
        os.replace(tmp, out)
        print(f"  convert {i} nnz={len(r)} ({time.time() - t0:.0f}s)",
              flush=True)


def phase_solve(split, n, tpc, threads, tag=""):
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.decode.mcts import run_mcts
    from difusco_tpu.utils.tours import tour_cost_np

    sp = SPLITS[split]
    out_dir = heat_dir(split)
    tours_path = os.path.join(out_dir, f"tours{tag}.txt")
    stats = run_mcts(
        sp["test_file"], os.path.join(out_dir, "heatmap_{i}.txt"),
        os.path.join(out_dir, f"stats{tag}.txt"), time_per_city=tpc,
        threads=threads, extra_args=["--count", str(n)],
        tours_path=tours_path,
    )

    ds = TSPDataset(sp["test_file"])
    costs, gts = [], []
    with open(tours_path) as f:
        tour_lines = [ln.split() for ln in f if ln.strip()]
    for i, toks in enumerate(tour_lines[:n]):
        tour = np.array([int(x) - 1 for x in toks])  # solver is 1-indexed
        ex = ds.get(i)
        pts = np.asarray(ex["points"])
        costs.append(tour_cost_np(pts, tour))
        gts.append(tour_cost_np(pts, np.asarray(ex["tour"])))
    costs = np.array(costs)
    gts = np.array(gts)

    result = {
        "protocol": f"reference solve-{split}.sh"
                    + (", heatmap = merge+2-opt tour edges "
                       "(convert_numpy_with_2opt.py)" if sp["with_2opt"]
                       else "")
                    + ("" if abs(tpc - 0.10) < 1e-9 else
                       f"; Param_T reduced 0.10->{tpc} (2-core CPU budget; "
                       f"see the _T010 calibration artifact)"),
        "time_per_city": tpc,
        "threads": threads,
        "n": len(costs),
        "gap_vs_best_known": float(np.mean((costs - gts) / gts)),
        "solver_avg_gap_percent": stats.get("avg_gap_percent"),
        "mean_cost": float(costs.mean()),
        "costs": [round(float(c), 6) for c in costs],
    }
    if os.path.exists(sp["hk"]):
        with open(sp["hk"]) as f:
            lbs = json.load(f)["lb"]
        lb = np.array([lbs[i] for i in range(len(costs))], np.float64)
        ok = np.isfinite(lb) & (lb > 0)
        result["gap_vs_hk_lb"] = float(np.mean((costs[ok] - lb[ok]) / lb[ok]))
        result["hk_label_slack"] = float(np.mean((gts[ok] - lb[ok]) / lb[ok]))

    out_json = os.path.join(REPO, "data",
                            f"mcts_protocol_tsp{split}{tag}.json")
    with open(out_json + ".tmp", "w") as f:
        json.dump(result, f, indent=1)
    os.replace(out_json + ".tmp", out_json)
    print(json.dumps({k: v for k, v in result.items() if k != "costs"},
                     indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", type=int, required=True, choices=[1000, 10000])
    ap.add_argument("--phase", default="all",
                    choices=["sample", "convert", "solve", "all"])
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--time", type=float, default=0.10)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--tag", default="",
                    help="suffix for the artifact/tours/stats files (e.g. "
                         "'_T010_n8' for a full-budget calibration subset)")
    args = ap.parse_args()
    n = args.n or SPLITS[args.split]["n"]
    if args.phase in ("sample", "all"):
        phase_sample(args.split, n)
    if args.phase in ("convert", "all"):
        phase_convert(args.split, n)
    if args.phase in ("solve", "all"):
        phase_solve(args.split, n, args.time, args.threads, args.tag)


if __name__ == "__main__":
    main()
