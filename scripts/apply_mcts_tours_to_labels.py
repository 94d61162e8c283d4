"""Keep-if-better label refinement from an MCTS protocol tour dump.

Takes the tours written by scripts/run_mcts_protocol.py (native solver
--tours output: 1-indexed, possibly closed) and rewrites the split's label
tour wherever the MCTS tour is strictly shorter. Labels only improve, so
gaps measured against them remain upper bounds on the true gap; the frozen
splits (data/frozen/) stay untouched for unbiased cross-round tracking.

Usage: python scripts/apply_mcts_tours_to_labels.py \
           --split data/tsp500_test.txt \
           --tours data/mcts_heatmaps_tsp500/tours.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from difusco_tpu.utils.tours import tour_cost_np as _cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", required=True)
    ap.add_argument("--tours", required=True)
    args = ap.parse_args()

    with open(args.tours) as f:
        tour_lines = [ln.split() for ln in f if ln.strip()]

    lines = open(args.split).read().splitlines()
    improved = 0
    total_gain = 0.0
    out = []
    for i, line in enumerate(lines):
        coords, _, tourstr = line.partition(" output ")
        vals = np.fromstring(coords, sep=" ")
        pts = vals.reshape(-1, 2)
        label = np.array([int(x) - 1 for x in tourstr.split()])
        if i < len(tour_lines):
            mt = np.array([int(x) - 1 for x in tour_lines[i]])
            if mt[0] == mt[-1]:
                mt = mt[:-1]
            assert sorted(mt.tolist()) == list(range(len(pts))), i
            c_old = _cost(pts, label[:-1])
            c_new = _cost(pts, mt)
            if c_new < c_old - 1e-9:
                label = np.concatenate([mt, mt[:1]])
                improved += 1
                total_gain += c_old - c_new
        out.append(coords + " output " +
                   " ".join(str(int(v) + 1) for v in label))
    if len(tour_lines) < len(lines):
        print(f"WARNING: tours file has {len(tour_lines)} lines for "
              f"{len(lines)} instances; instances past that are unrefined")
    # atomic replace: a crash mid-write must never truncate the committed
    # benchmark split
    tmp = args.split + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(out) + "\n")
    os.replace(tmp, args.split)
    print(f"improved {improved}/{len(lines)} labels, "
          f"total length gain {total_gain:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
