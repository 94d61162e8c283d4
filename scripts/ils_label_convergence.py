"""ILS label-quality convergence study for the ER-[700-800] test split.

VERDICT r2 weak #8: the ER-700-800 quality ratios are measured against this
repo's own ILS labels with no independent certificate. A full certificate
(Lovász theta SDP) is out of scope, but a budget-escalation study bounds the
labels' distance from ILS-convergence: re-solve every test graph at 1x, 10x
and 30x the labeling budget and record the marginal set-size gains. If 30x
budget moves the mean by <epsilon nodes, the 2s labels are epsilon-close to
what this solver family can ever find, and quality ratios vs them are stable
to that epsilon.

Writes data/mis_er700800_test_labels/convergence.json.

Usage: python scripts/ils_label_convergence.py [--budgets 2,20,60] [--n 16]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="2,20,60")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--split_dir", default="mis_er700800_test",
                    help="graph dir under data/ (e.g. mis_er700800_train4a "
                         "to bound the 0.25 s TRAINING-label budget noise, "
                         "VERDICT r4 weak #6)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    budgets = [float(b) for b in args.budgets.split(",")]

    from difusco_tpu.data.mis_solvers import _load_graph, solve_ils

    files = sorted(glob.glob(
        os.path.join(REPO, "data", args.split_dir, "*.gpickle*")))[: args.n]
    graphs = [_load_graph(f) for f in files]

    import multiprocessing

    results = {}
    for b in budgets:
        with multiprocessing.Pool(args.workers) as pool:
            labels = pool.starmap(solve_ils, [(g, b) for g in graphs])
        sizes = [int(np.asarray(l).sum()) for l in labels]
        results[str(b)] = {"mean": float(np.mean(sizes)), "sizes": sizes}
        print(f"budget {b:5.1f}s: mean set size {np.mean(sizes):.3f}")

    base = results[str(budgets[0])]["mean"]
    best = max(r["mean"] for r in results.values())
    results["marginal_gain_vs_base"] = best - base
    out = args.out or os.path.join(
        REPO, "data", "mis_er700800_test_labels", "convergence.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"max marginal gain over {budgets[0]}s budget: "
          f"{best - base:.3f} nodes -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
