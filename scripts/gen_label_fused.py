"""Fused ER-[700-800] generate+label pipeline (round-4 training-set growth).

One process does gen -> METIS -> native ILS -> gpickle + .result per graph,
skipping the gpickle round-trip and per-batch interpreter startups of the
two-stage `generate_mis gendata` + `mis_solvers solve` flow (measured
~1.7 s/graph there vs ~0.8 s/graph here at the same 0.25 s ILS budget).

Outputs are byte-compatible with the two-stage flow: pickled networkx
graphs in data/mis_<name>/ and 0/1-per-line KaMIS-style label files in
data/mis_<name>_labels/, so `pack_er700800.py` / PackedMISDataset /
MISDataset consume them unchanged. Resumable: graphs whose .result exists
are skipped, and each index derives its own rng stream so resumption is
order-independent.

With --pack (default on) it also emits the packed chunk format of
``pack_mis_dir`` (edges/eoff/labels/noff .npy per 1024-graph chunk under
data/packs/<name>/) straight from the in-memory edge arrays — identical
layout, verified array-equal in tests — so a later repack of the whole dir
(~0.15 s/graph of unpickling) is never needed.

Usage: python scripts/gen_label_fused.py --name er700800_train4a \
           --num 8000 --seed 400000 [--time_limit 0.25]
"""

import argparse
import os
import pickle
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ILS = os.path.join(REPO, "native", "build", "mis_ils")


def er_edges(n: int, p: float, rng: np.random.Generator):
    """Vectorized G(n, p): Bernoulli over the upper triangle."""
    iu, ju = np.triu_indices(n, k=1)
    mask = rng.random(iu.shape[0]) < p
    return iu[mask].astype(np.int32), ju[mask].astype(np.int32)


def write_metis_arrays(n: int, u: np.ndarray, v: np.ndarray, path: str):
    """METIS adjacency text (same format as mis_solvers.write_metis) built
    straight from edge arrays — no networkx iteration."""
    src = np.concatenate([u, v])
    dst = np.concatenate([v, u])
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order] + 1  # 1-indexed neighbors
    counts = np.bincount(src, minlength=n)
    splits = np.cumsum(counts)[:-1]
    rows = np.split(dst, splits)
    with open(path, "w") as f:
        f.write(f"{n} {u.shape[0]}\n")
        f.write("\n".join(" ".join(map(str, r)) for r in rows))
        f.write("\n")


class ChunkWriter:
    """Emit pack_mis_dir's chunk files (edges/eoff/labels/noff/stats per
    1024 graphs) in generation order. add() takes each graph's undirected
    (E,2) edges + labels; complete chunks are flushed with the stats file
    written last as the chunk-complete marker, exactly like pack_mis_dir
    (difusco_tpu/data/mis.py:186-256) so PackedMISDataset reads either."""

    def __init__(self, out_dir: str, chunk: int = 1024):
        self.out_dir = out_dir
        self.chunk = chunk
        os.makedirs(out_dir, exist_ok=True)
        self.reset()

    def reset(self):
        self.edges, self.eoff = [], [0]
        self.labels, self.noff = [], [0]
        self.max_nodes = self.max_degree = 0

    def chunk_done(self, j: int) -> bool:
        return os.path.exists(os.path.join(self.out_dir,
                                           f"stats_{j:05d}.json"))

    def add(self, i: int, n: int, und: np.ndarray, labels: np.ndarray):
        j = i // self.chunk
        if self.chunk_done(j):
            return
        # degree as MISDataset counts it: bidirectional + self-loop
        deg = np.bincount(np.concatenate([und[:, 0], und[:, 1],
                                          np.arange(n)]), minlength=n)
        self.max_nodes = max(self.max_nodes, n)
        self.max_degree = max(self.max_degree, int(deg.max()) if n else 0)
        self.edges.append(und.astype(np.int32))
        self.eoff.append(self.eoff[-1] + len(und))
        self.labels.append(labels.astype(np.int8))
        self.noff.append(self.noff[-1] + n)
        if (i + 1) % self.chunk == 0:
            self.flush(j)

    def repair_partial_tail(self, num: int):
        """If the highest packed chunk is partial (tail-flushed by an earlier
        run with a smaller --num) and this run wants graphs beyond it, remove
        that chunk's files so it is rebuilt full-size from the on-disk
        gpickle/.result pairs (cheap resume path)."""
        import glob
        import json

        stats = sorted(glob.glob(os.path.join(self.out_dir, "stats_*.json")))
        if not stats:
            return
        j = int(os.path.basename(stats[-1])[6:11])
        with open(stats[-1]) as f:
            n = json.load(f)["n"]
        if n < self.chunk and num > j * self.chunk + n:
            for kind in ("edges", "eoff", "labels", "noff", "stats"):
                ext = "json" if kind == "stats" else "npy"
                p = os.path.join(self.out_dir, f"{kind}_{j:05d}.{ext}")
                if os.path.exists(p):
                    os.remove(p)
            print(f"repacking partial tail chunk {j} ({n} graphs) for growth",
                  flush=True)

    def finalize(self, last_i: int):
        """Flush the trailing partial chunk so no labeled graph is silently
        absent from the pack when --num is not a multiple of the chunk size
        (advisor r4 finding #1)."""
        if self.edges:
            self.flush(last_i // self.chunk)

    def flush(self, j: int):
        import json

        if self.chunk_done(j) or not self.edges:
            self.reset()
            return
        np.save(os.path.join(self.out_dir, f"edges_{j:05d}.npy"),
                np.concatenate(self.edges))
        np.save(os.path.join(self.out_dir, f"eoff_{j:05d}.npy"),
                np.asarray(self.eoff, np.int64))
        np.save(os.path.join(self.out_dir, f"labels_{j:05d}.npy"),
                np.concatenate(self.labels))
        np.save(os.path.join(self.out_dir, f"noff_{j:05d}.npy"),
                np.asarray(self.noff, np.int64))
        stats_p = os.path.join(self.out_dir, f"stats_{j:05d}.json")
        with open(stats_p + ".tmp", "w") as f:
            json.dump({"n": len(self.noff) - 1, "max_nodes": self.max_nodes,
                       "max_degree": self.max_degree}, f)
        os.replace(stats_p + ".tmp", stats_p)
        self.reset()


def load_done_graph(gpath: str, rpath: str):
    """Re-read an already-labeled graph (resume path) as pack arrays."""
    with open(gpath, "rb") as f:
        g = pickle.load(f)
    n = g.number_of_nodes()
    e = np.array([(min(a, b), max(a, b)) for a, b in g.edges() if a != b],
                 np.int32).reshape(-1, 2)
    with open(rpath) as f:
        labels = np.array([int(x) for x in f.read().split()], np.int64)
    return n, e, labels


def one_graph(i: int, args, td: str, writer=None):
    import networkx as nx

    gpath = os.path.join(REPO, "data", f"mis_{args.name}",
                         f"er_{i:05d}.gpickle")
    rpath = os.path.join(REPO, "data", f"mis_{args.name}_labels",
                         f"er_{i:05d}_unweighted.result")
    have_result = os.path.exists(rpath) and os.path.getsize(rpath) > 0
    need_chunk = writer is not None and not writer.chunk_done(
        i // writer.chunk)
    if have_result and os.path.exists(gpath):
        if need_chunk:
            n, e, labels = load_done_graph(gpath, rpath)
            writer.add(i, n, e, labels)
        return 0.0

    rng = np.random.default_rng(args.seed + i)
    n = int(rng.integers(args.min_n, args.max_n + 1))
    u, v = er_edges(n, args.er_p, rng)

    if have_result:
        # labels committed but graphs absent (they are gitignored —
        # regenerable from seed+index): rebuild the graph, validate the
        # label is an IS on it, skip the ILS solve
        import networkx as nx

        with open(rpath) as f:
            labels = np.array([int(x) for x in f.read().split()], np.int64)
        assert labels.shape[0] == n, (i, labels.shape, n)
        assert not np.any(labels[u] & labels[v]), \
            f"{i}: committed label is not an IS on the regenerated graph"
        if need_chunk:
            writer.add(i, n, np.stack([u, v], 1), labels)
        if args.no_gpickle:
            # fast pack-rebuild: training consumes only the packed chunks,
            # so skip the nx-build + pickle.dump (the dominant ~70 ms of
            # this path); gpickles regenerate on demand without the flag
            return 0.0
        g = nx.empty_graph(n)
        g.add_edges_from(np.stack([u, v], 1).tolist())
        tmp = gpath + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(g, f, protocol=4)
        os.replace(tmp, gpath)
        return 0.0

    mpath = os.path.join(td, "g.graph")
    opath = os.path.join(td, "g.result")
    write_metis_arrays(n, u, v, mpath)
    subprocess.run(
        [ILS, mpath, f"--output={opath}",
         f"--time_limit={args.time_limit}", f"--seed={args.seed + i}"],
        check=True, capture_output=True)
    with open(opath) as f:
        labels = np.array([int(x) for x in f.read().split()], np.int64)
    assert labels.shape[0] == n, (labels.shape, n)
    # independent-set sanity: no labeled edge endpoints may both be 1
    assert not np.any(labels[u] & labels[v]), f"ILS returned non-IS for {i}"

    if writer is not None:
        writer.add(i, n, np.stack([u, v], 1), labels)
    g = nx.empty_graph(n)
    g.add_edges_from(np.stack([u, v], 1).tolist())
    tmp = gpath + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(g, f, protocol=4)
    os.replace(tmp, gpath)
    tmpr = rpath + ".tmp"
    with open(tmpr, "w") as f:
        f.write("\n".join(map(str, labels.tolist())) + "\n")
    os.replace(tmpr, rpath)
    return float(labels.sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--num", type=int, required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--min_n", type=int, default=700)
    ap.add_argument("--max_n", type=int, default=800)
    ap.add_argument("--er_p", type=float, default=0.15)
    ap.add_argument("--time_limit", type=float, default=0.25)
    ap.add_argument("--deadline_ts", type=float, default=0.0,
                    help="unix ts after which no new graph is started")
    ap.add_argument("--pack", type=int, default=1,
                    help="also emit pack_mis_dir chunks under data/packs/")
    ap.add_argument("--no_gpickle", action="store_true",
                    help="pack-rebuild mode: regenerate chunks from "
                         "seed+committed labels without writing gpickles "
                         "(~7x faster; use when only --packed_dirs training "
                         "needs the data)")
    args = ap.parse_args()

    os.makedirs(os.path.join(REPO, "data", f"mis_{args.name}"), exist_ok=True)
    os.makedirs(os.path.join(REPO, "data", f"mis_{args.name}_labels"),
                exist_ok=True)
    writer = ChunkWriter(os.path.join(REPO, "data", "packs", args.name)) \
        if args.pack else None
    if writer is not None:
        writer.repair_partial_tail(args.num)
    t0 = time.time()
    done = 0
    sizes = []
    with tempfile.TemporaryDirectory() as td:
        for i in range(args.num):
            if args.deadline_ts and time.time() > args.deadline_ts:
                print(f"deadline hit after {done} graphs", flush=True)
                break
            s = one_graph(i, args, td, writer)
            if s:
                sizes.append(s)
            done += 1
            if done % 200 == 0:
                dt = time.time() - t0
                print(f"{done}/{args.num} graphs, {dt/max(done,1):.2f} s/graph,"
                      f" mean set {np.mean(sizes):.2f}", flush=True)
        if writer is not None and done:
            writer.finalize(done - 1)
    dt = time.time() - t0
    print(f"DONE {args.name}: {done} graphs in {dt:.0f}s "
          f"({dt/max(done,1):.2f} s/graph)", flush=True)


if __name__ == "__main__":
    main()
