"""CPU-only keep-if-better label polish via the native MCTS solver.

Unlike scripts/refine_tsp_labels.py (which seeds MCTS with model heatmaps and
therefore needs the accelerator), this tool seeds the solver with the
distance-prior-only heatmap (the 0.01*(1-d) term of sparsify_heatmap) so it
runs entirely on CPU — useful for tightening split labels toward optimality
while the chip is busy training. Labels only improve (keep-if-better).

Usage:
  python scripts/mcts_polish_labels.py --split data/tsp50/tsp50_test.txt \
      [--time 0.2] [--threads 2] [--limit 0]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tour_len(pts, tour):
    d = pts[tour[1:]] - pts[tour[:-1]]
    return float(np.sqrt((d * d).sum(-1)).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", required=True)
    ap.add_argument("--time", type=float, default=0.2,
                    help="MCTS budget, seconds per city")
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--start", type=int, default=0,
                    help="first instance to polish (earlier ones pass "
                         "through unchanged)")
    ap.add_argument("--out", default=None,
                    help="output path (default: atomically rewrite --split)")
    args = ap.parse_args()

    from difusco_tpu.data.tsp import TSPDataset, write_tsp_file
    from difusco_tpu.decode.mcts import (run_mcts, sparsify_heatmap,
                                         write_heatmap_txt)

    ds = TSPDataset(args.split)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    start = min(args.start, n)
    out_path = args.out or args.split

    with tempfile.TemporaryDirectory() as tmp:
        inst_path = os.path.join(tmp, "inst.txt")
        rows = []
        for i in range(start, n):
            ex = ds.get(i)
            pts = np.asarray(ex["points"], np.float64)
            rows.append((pts, np.asarray(ex["tour"])))
            write_heatmap_txt(
                os.path.join(tmp, f"h_{i - start}.txt"),
                sparsify_heatmap(np.zeros((len(pts), len(pts))), pts),
            )
        write_tsp_file(inst_path, rows)

        run_mcts(
            inst_path, os.path.join(tmp, "h_{i}.txt"),
            os.path.join(tmp, "stats.txt"), time_per_city=args.time,
            threads=args.threads, tours_path=os.path.join(tmp, "tours.txt"),
            extra_args=["--count", str(n - start)],
        )

        improved = 0
        out = []
        for i in range(start):  # untouched prefix passes through
            ex = ds.get(i)
            out.append((np.asarray(ex["points"], np.float64),
                        np.asarray(ex["tour"])))
        with open(os.path.join(tmp, "tours.txt")) as f:
            lines = f.readlines()
    for i, (pts, old) in enumerate(rows):
        V = len(pts)
        mt = np.asarray([int(x) - 1 for x in lines[i].split()], np.int64)
        if len(mt) == V + 1 and mt[0] == mt[-1]:
            mt = mt[:-1]
        assert len(mt) == V and len(set(mt.tolist())) == V, f"bad tour {i}"
        mt = np.concatenate([mt, mt[:1]])
        if tour_len(pts, mt) < tour_len(pts, old) - 1e-9:
            out.append((pts, mt))
            improved += 1
        else:
            out.append((pts, old))
    for i in range(n, len(ds)):
        ex = ds.get(i)
        out.append((np.asarray(ex["points"], np.float64),
                    np.asarray(ex["tour"])))
    # atomic replace so an interrupt can't corrupt the dataset file
    write_tsp_file(out_path + ".tmp", out)
    os.replace(out_path + ".tmp", out_path)
    print(f"rewrote {out_path}: {improved}/{n - start} labels improved by MCTS")


if __name__ == "__main__":
    main()
