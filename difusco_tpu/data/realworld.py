"""Real-world graph ingestion for MIS benchmarks.

Capability parity with the reference's real-world tier
(data/mis-benchmark-framework/data_generation/realworld.py): it downloads
named datasets (citation nets, SNAP social/road nets, Amazon conflict
graphs, wiki-RfA .mtx ...), cleans each graph — undirected, self-loops
removed, nodes relabeled to contiguous ints (``clean_nx_graph``,
realworld.py:55-57) — and writes ``.gpickle`` files consumed by the MIS
dataset.

This environment has no network egress, so the download step is out of
scope by design; this module is the *conversion* tier for local files in
the same source formats:

- ``edgelist``: whitespace/comma-separated ``u v [extra...]`` lines with
  ``#``/``%`` comments (SNAP .txt, .edges, .csv — realworld.py:86,133,170+)
- ``mtx``: Matrix Market coordinate files (wiki-RfA — realworld.py:217-218)
- ``dimacs``: DIMACS ``p edge N M`` / ``e u v`` clique-benchmark files (the
  classic MIS/clique exchange format)

Labels are optionally produced with the built-in randomized-greedy labeler
(KaMIS/Gurobi via difusco_tpu.data.mis_solvers when installed).

Usage:
  python -m difusco_tpu.data.realworld convert --input 'graphs/*.mtx' \\
      --output_dir data/realworld [--format auto] [--label]
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
from typing import Iterable, Tuple

import numpy as np


def clean_edges(edges: Iterable[Tuple[int, int]]) -> Tuple[int, np.ndarray]:
    """Undirect, dedupe, drop self-loops, relabel nodes to 0..V-1
    (reference clean_nx_graph, realworld.py:55-57).

    Returns (num_nodes, edges (E, 2) with u < v).
    """
    e = np.asarray(list(edges), dtype=np.int64)
    if e.size == 0:
        return 0, np.zeros((0, 2), np.int64)
    e = e[e[:, 0] != e[:, 1]]  # self-loops
    lo = np.minimum(e[:, 0], e[:, 1])
    hi = np.maximum(e[:, 0], e[:, 1])
    e = np.unique(np.stack([lo, hi], 1), axis=0)
    nodes, inv = np.unique(e.reshape(-1), return_inverse=True)
    return len(nodes), inv.reshape(-1, 2)


def load_edgelist(path: str) -> Tuple[int, np.ndarray]:
    """Parse ``u v [extra...]`` lines; ``#``/``%`` comments and non-numeric
    header lines are skipped; separators: whitespace, comma, or tab."""
    edges = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line[0] in "#%":
                continue
            parts = line.replace(",", " ").split()
            try:
                u, v = int(float(parts[0])), int(float(parts[1]))
            except (ValueError, IndexError):
                continue  # header row (e.g. "source target")
            edges.append((u, v))
    return clean_edges(edges)


def load_mtx(path: str) -> Tuple[int, np.ndarray]:
    """Parse a Matrix Market coordinate file (the wiki-RfA path,
    realworld.py:217-218) without a scipy dependency."""
    edges = []
    with open(path) as f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise ValueError(f"{path}: not a MatrixMarket file")
        if "array" in header:
            raise ValueError(f"{path}: dense 'array' format unsupported")
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            break
        # `line` is the size line "rows cols nnz"; entries follow
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            parts = line.split()
            edges.append((int(parts[0]) - 1, int(parts[1]) - 1))  # 1-indexed
    return clean_edges(edges)


def load_dimacs(path: str) -> Tuple[int, np.ndarray]:
    """Parse DIMACS 'p edge N M' + 'e u v' (1-indexed) clique files."""
    edges = []
    n_declared = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] == "c":
                continue
            if parts[0] == "p":
                n_declared = int(parts[2])
            elif parts[0] == "e":
                edges.append((int(parts[1]) - 1, int(parts[2]) - 1))
    n, e = clean_edges(edges)
    return max(n, n_declared), e


_LOADERS = {"edgelist": load_edgelist, "mtx": load_mtx, "dimacs": load_dimacs}


def detect_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mtx":
        return "mtx"
    if ext in (".clq", ".dimacs", ".col"):
        return "dimacs"
    if ext in (".edges", ".csv", ".txt", ".edgelist", ".tsv"):
        return "edgelist"
    with open(path) as f:
        head = f.readline()
    if head.startswith("%%MatrixMarket"):
        return "mtx"
    if head.startswith(("c ", "p ")):
        return "dimacs"
    return "edgelist"


def convert_file(path: str, fmt: str = "auto"):
    """Load one graph file -> networkx Graph (cleaned)."""
    import networkx as nx

    if fmt == "auto":
        fmt = detect_format(path)
    n, e = _LOADERS[fmt](path)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(e.tolist())
    return g


def convert_cmd(args):
    import networkx as nx  # noqa: F401  (gpickle payload type)

    paths = sorted(glob.glob(args.input))
    if not paths:
        raise SystemExit(f"no files match {args.input!r}")
    os.makedirs(args.output_dir, exist_ok=True)
    for p in paths:
        g = convert_file(p, args.format)
        if args.label:
            from difusco_tpu.data.generate_mis import greedy_mis_label

            labels = greedy_mis_label(g, np.random.default_rng(args.seed))
            for node, lab in zip(g.nodes, labels):
                g.nodes[node]["label"] = int(lab)
        name = os.path.splitext(os.path.basename(p))[0]
        out = os.path.join(args.output_dir, f"{name}.gpickle")
        with open(out, "wb") as f:
            pickle.dump(g, f)
        print(
            f"{p} -> {out}: {g.number_of_nodes()} nodes, "
            f"{g.number_of_edges()} edges"
        )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("convert", help="convert local graph files to .gpickle")
    c.add_argument("--input", required=True, help="glob of input files")
    c.add_argument("--output_dir", required=True)
    c.add_argument(
        "--format", default="auto", choices=["auto", "edgelist", "mtx", "dimacs"]
    )
    c.add_argument("--label", action="store_true", help="greedy MIS labels")
    c.add_argument("--seed", type=int, default=0)
    c.set_defaults(fn=convert_cmd)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
