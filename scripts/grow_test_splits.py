"""Grow TSP test splits to reference size (VERDICT round 1, item 2):
TSP-500 -> 128, TSP-1000 -> 128, TSP-10000 -> 16 instances
(reference eval sizes, reproducing_scripts.md:254-311). New instances get
NN+2-opt labels from the built-in generator; label refinement (model
best-of / MCTS keep-if-better) happens separately once the chip is free.
Runs fully on CPU. Appends atomically; skips splits already at target size.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from difusco_tpu.data.generate_tsp import generate
from difusco_tpu.data.tsp import TSPDataset, write_tsp_file

TARGETS = [
    ("data/tsp500_test.txt", 500, 128, 975000),
    ("data/tsp1000/tsp1000_test.txt", 1000, 128, 971000),
    ("data/tsp10000/tsp10000_test.txt", 10000, 16, 9710000),
]

for path, V, target, seed in TARGETS:
    ds = TSPDataset(path)
    have = len(ds)
    if have >= target:
        print(f"{path}: already {have} >= {target}")
        continue
    need = target - have
    rows = [(np.asarray(ds.get(i)["points"], np.float64),
             np.asarray(ds.get(i)["tour"])) for i in range(have)]
    t0 = time.time()
    chunk = 8 if V <= 1000 else 1
    made = 0
    while made < need:
        k = min(chunk, need - made)
        rows += generate(k, V, seed=seed + made)
        made += k
        write_tsp_file(path + ".partial", rows)
        print(f"{path}: {have + made}/{target} ({time.time()-t0:.0f}s)", flush=True)
    write_tsp_file(path + ".tmp", rows)
    os.replace(path + ".tmp", path)
    os.remove(path + ".partial")
    print(f"{path}: grown to {len(rows)} instances in {time.time()-t0:.0f}s")
print("GROW_DONE")
