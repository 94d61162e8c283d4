"""Compute certified Held-Karp 1-tree lower bounds for a TSP split (offline).

The bounds depend only on instance coordinates — never on labels or any
model — so they are computed once per split and committed
(data/hk_lb/<split>_hk.json). bench.py reports gap_vs_HK_LB against them:
a certified upper bound on the true optimality gap, immune to the
label-refinement circularity (VERDICT round 1, item 1).

Usage:
  python scripts/compute_hk_bounds.py --split data/tsp50/tsp50_test.txt \
      [--iterations 1000] [--workers 2] [--limit 0] [--out data/hk_lb/...]
"""

import argparse
import json
import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _one(task):
    i, pts, label_cost, iterations, native = task
    t0 = time.time()
    if native:
        lb = _native_bound(pts, label_cost, iterations)
    else:
        from difusco_tpu.ops.held_karp import held_karp_lower_bound

        lb = held_karp_lower_bound(pts, upper_bound=label_cost,
                                   iterations=iterations)
    return i, lb, time.time() - t0


def _native_bound(pts, label_cost, iterations):
    """Run native/build/hk_bound (same ascent schedule as the numpy path,
    validated to ~1e-12 relative agreement; ~1000x faster at large V)."""
    import subprocess
    import tempfile

    binary = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "build", "hk_bound")
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for x, y in pts:
            f.write(f"{float(x):.17g} {float(y):.17g}\n")
        path = f.name
    try:
        out = subprocess.run(
            [binary, path, "--iterations", str(iterations),
             "--ub", f"{label_cost:.17g}"],
            capture_output=True, text=True, check=True)
        return float(out.stdout.split()[1])
    finally:
        os.unlink(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", required=True)
    ap.add_argument("--iterations", type=int, default=1000)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--native", action="store_true",
                    help="use native/build/hk_bound (C++; ~1000x faster at "
                         "large V, agrees with numpy to ~1e-12)")
    args = ap.parse_args()

    from difusco_tpu.data.tsp import TSPDataset

    ds = TSPDataset(args.split)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    out_path = args.out
    if out_path is None:
        stem = os.path.splitext(os.path.basename(args.split))[0]
        out_path = os.path.join("data", "hk_lb", f"{stem}_hk.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    # resume: keep bounds already computed for identical settings
    done = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        if prev.get("iterations") == args.iterations and len(prev["lb"]) <= n:
            done = {i: v for i, v in enumerate(prev["lb"]) if v is not None}

    tasks = []
    for i in range(n):
        if i in done:
            continue
        ex = ds.get(i)
        from difusco_tpu.utils.tours import tour_cost_np

        pts = np.asarray(ex["points"], np.float64)
        label_cost = tour_cost_np(pts, np.asarray(ex["tour"]))
        tasks.append((i, pts, label_cost, args.iterations, args.native))

    lbs = [done.get(i) for i in range(n)]
    t0 = time.time()
    if tasks:
        with multiprocessing.Pool(args.workers) as pool:
            for k, (i, lb, dt) in enumerate(pool.imap_unordered(_one, tasks)):
                lbs[i] = lb
                # write after EVERY completion: at large V an instance takes
                # minutes, and a partial file is directly usable by bench
                print(f"  {k + 1}/{len(tasks)} (inst {i}: LB={lb:.4f}, "
                      f"{dt:.1f}s)", flush=True)
                with open(out_path + ".tmp", "w") as f:
                    json.dump({"split": args.split,
                               "iterations": args.iterations,
                               "lb": lbs}, f)
                os.replace(out_path + ".tmp", out_path)
    with open(out_path + ".tmp", "w") as f:
        json.dump({"split": args.split, "iterations": args.iterations,
                   "lb": lbs}, f)
    os.replace(out_path + ".tmp", out_path)
    print(f"wrote {out_path}: {sum(v is not None for v in lbs)}/{n} bounds "
          f"in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
