"""Regenerate the seeded base ER-[700-800] training graphs to match the
committed labels.

The 5120 graphs of data/mis_er700800_train/ are not committed (only their
ILS labels are); they are deterministic functions of the recorded seeds:
er_00000-01023 from `gendata --seed 0` and er_01024-05119 from
`gendata --seed 100000` merged at offset 1024 (scripts/gen_er700800.sh,
scripts/merge_er700800_train.py). gendata draws exactly two integers per
graph from the master rng (n, then the per-graph nx seed —
difusco_tpu/data/generate_mis.py:61-63,156-160), so this script replays
those draws, skips graphs whose file already exists, and validates every
regenerated graph against its committed label (the ILS set must be
independent on the right graph — a mismatched graph fails with ~certainty
at p=0.15). Also emits the pack chunks (data/packs/er700800_train) via
ChunkWriter so no separate repack pass is needed.

Usage: python scripts/regen_er700800_base.py [--deadline_ts T]
"""

import argparse
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.gen_label_fused import ChunkWriter  # noqa: E402

OUT = os.path.join(REPO, "data", "mis_er700800_train")
LABELS = os.path.join(REPO, "data", "mis_er700800_train_labels")
SEGMENTS = [  # (master seed, count, index offset in the merged dir)
    (0, 1024, 0),
    (100000, 4096, 1024),
]


def regen_segment(seed, count, offset, writer, deadline_ts=0.0):
    import networkx as nx

    rng = np.random.default_rng(seed)
    done = 0
    for i in range(count):
        n = int(rng.integers(700, 800 + 1))
        gseed = int(rng.integers(2 ** 31))
        idx = offset + i
        path = os.path.join(OUT, f"er_{idx:05d}.gpickle")
        lab_p = os.path.join(LABELS, f"er_{idx:05d}_unweighted.result")
        need_graph = not os.path.exists(path)
        need_chunk = writer is not None and not writer.chunk_done(
            idx // writer.chunk)
        if not (need_graph or need_chunk):
            continue
        if deadline_ts and time.time() > deadline_ts:
            print(f"deadline hit at index {idx}", flush=True)
            return done, True
        g = nx.fast_gnp_random_graph(n, 0.15, seed=gseed)
        assert g.number_of_nodes() == n
        e = np.array([(min(a, b), max(a, b)) for a, b in g.edges()],
                     np.int32).reshape(-1, 2)
        with open(lab_p) as f:
            lab = np.array([int(x) for x in f.read().split()], np.int64)
        assert lab.shape[0] == n, \
            f"{idx}: label len {lab.shape[0]} != n {n} — regen mismatch"
        assert not np.any(lab[e[:, 0]] & lab[e[:, 1]]), \
            f"{idx}: committed label is not an IS on the regenerated graph"
        if need_graph:
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(g, f, protocol=4)
            os.replace(tmp, path)
        if need_chunk:
            writer.add(idx, n, e, lab)
        done += 1
        if done % 256 == 0:
            print(f"seed {seed}: {done} regenerated (idx {idx})", flush=True)
    return done, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline_ts", type=float, default=0.0)
    ap.add_argument("--pack", type=int, default=1)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    writer = ChunkWriter(os.path.join(REPO, "data", "packs",
                                      "er700800_train")) if args.pack else None
    t0 = time.time()
    total = 0
    for seed, count, offset in SEGMENTS:
        done, hit = regen_segment(seed, count, offset, writer,
                                  args.deadline_ts)
        total += done
        if hit:
            break
    print(f"REGEN done: {total} graphs in {time.time() - t0:.0f}s "
          f"(validated against committed labels)", flush=True)


if __name__ == "__main__":
    main()
