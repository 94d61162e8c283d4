"""MIS label solvers + results tooling.

Capability parity with the reference mis-benchmark-framework solver tier
(``data/mis-benchmark-framework/solvers/kamis.py``, ``gurobi.py`` and
``helper_scripts/aggregator.py``): solve pickled graphs to
``<stem>_unweighted.result`` label files (one 0/1 per line, the format
``MISDataset`` reads) and aggregate result sets to CSV.

External solvers are optional, discovered at runtime:
  greedy  — built-in randomized greedy + restarts (always available)
  kamis   — KaMIS ``redumis`` binary on PATH (the reference clones+builds it)
  gurobi  — gurobipy if importable (commercial license required)

Usage:
  python -m difusco_tpu.data.mis_solvers solve --input 'dir/*.gpickle' \\
      --output labels_dir [--solver greedy] [--time_limit 60] [--workers 8]
  python -m difusco_tpu.data.mis_solvers aggregate --input labels_dir \\
      --csv results.csv
"""

from __future__ import annotations

import argparse
import csv
import glob
import multiprocessing
import os
import pickle
import shutil
import subprocess
import tempfile

import numpy as np


def _load_graph(path):
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as f:
            return pickle.load(f)
    with open(path, "rb") as f:
        return pickle.load(f)


def solve_greedy(graph, seed=0, restarts=16):
    from difusco_tpu.data.generate_mis import greedy_mis_label

    return greedy_mis_label(graph, np.random.default_rng(seed), restarts=restarts)


def write_metis(graph, path):
    """Write the METIS adjacency format KaMIS consumes
    (reference solvers/kamis.py:40-60 writes the same header + 1-indexed
    neighbor lines)."""
    n = graph.number_of_nodes()
    with open(path, "w") as f:
        f.write(f"{n} {graph.number_of_edges()}\n")
        adj = {i: sorted(graph.neighbors(i)) for i in graph.nodes}
        for i in range(n):
            f.write(" ".join(str(j + 1) for j in adj.get(i, [])) + "\n")


def _run_redumis_protocol(binary, graph, time_limit, seed=None):
    """Run a redumis-CLI-compatible binary: METIS graph in, ``--output=`` /
    ``--time_limit=`` flags, 0/1-per-line result file out."""
    with tempfile.TemporaryDirectory() as td:
        gpath = os.path.join(td, "g.graph")
        rpath = os.path.join(td, "g.result")
        write_metis(graph, gpath)
        cmd = [binary, gpath, f"--output={rpath}", f"--time_limit={time_limit}"]
        if seed is not None:
            cmd.append(f"--seed={seed}")
        subprocess.run(cmd, check=True, capture_output=True)
        with open(rpath) as f:
            return np.array([int(x) for x in f.read().split()], np.int64)


def solve_kamis(graph, time_limit=60.0):
    """Drive the KaMIS ``redumis`` binary (reference solvers/kamis.py:81-134):
    write the METIS graph format, run, read the 0/1 result file."""
    binary = shutil.which("redumis")
    if binary is None:
        raise RuntimeError("KaMIS 'redumis' not found on PATH")
    return _run_redumis_protocol(binary, graph, time_limit)


def solve_ils(graph, time_limit=10.0, seed=1):
    """Native C++ iterated-local-search solver (native/mis/mis_ils.cpp) —
    the framework's strong built-in labeler; speaks the redumis CLI
    protocol. Falls back to a PATH lookup when the repo build is absent."""
    binary = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native", "build", "mis_ils",
    )
    if not os.path.exists(binary):
        binary = shutil.which("mis_ils")
    if binary is None or not os.path.exists(binary):
        raise RuntimeError("mis_ils binary not built (run `make -C native`)")
    return _run_redumis_protocol(binary, graph, time_limit, seed=seed)


def solve_gurobi(graph, time_limit=60.0):
    """MIS as a binary program: max sum(x) s.t. x_i + x_j <= 1 per edge
    (reference solvers/gurobi.py:57-97)."""
    try:
        import gurobipy as gp
    except ImportError as e:
        raise RuntimeError("gurobipy not installed") from e
    n = graph.number_of_nodes()
    m = gp.Model("mis")
    m.Params.OutputFlag = 0
    m.Params.TimeLimit = time_limit
    x = m.addVars(n, vtype=gp.GRB.BINARY)
    for a, b in graph.edges:
        if a != b:
            m.addConstr(x[a] + x[b] <= 1)
    m.setObjective(x.sum(), gp.GRB.MAXIMIZE)
    m.optimize()
    return np.array([int(round(x[i].X)) for i in range(n)], np.int64)


SOLVERS = {
    "greedy": solve_greedy,
    "ils": solve_ils,
    "kamis": solve_kamis,
    "gurobi": solve_gurobi,
}


def _solve_one(args):
    path, out_dir, solver, kwargs = args
    stem = os.path.basename(path).replace(".gpickle", "")
    out = os.path.join(out_dir, f"{stem}_unweighted.result")
    graph = None
    if os.path.exists(out):  # resumable: interrupted runs pick up where left
        with open(out) as f:
            labels = np.array([int(x) for x in f.read().split()], np.int64)
        if labels.size:
            # only reuse a file whose length matches the graph — a truncated
            # legacy file or one from a different instance is stale
            graph = _load_graph(path)
            if labels.size == graph.number_of_nodes():
                return stem, int(labels.sum())
    if graph is None:
        graph = _load_graph(path)
    labels = SOLVERS[solver](graph, **kwargs)
    assert len(labels) == graph.number_of_nodes()
    tmp = out + ".tmp"
    with open(tmp, "w") as f:  # atomic: a killed run never leaves a
        f.write("\n".join(str(int(v)) for v in labels) + "\n")  # short file
    os.replace(tmp, out)
    return stem, int(labels.sum())


def solve_cmd(args):
    files = sorted(glob.glob(args.input))
    if not files:
        raise SystemExit(f"no graphs match {args.input!r}")
    os.makedirs(args.output, exist_ok=True)
    kwargs = {}
    if args.solver in ("ils", "kamis", "gurobi"):
        kwargs["time_limit"] = args.time_limit
    work = [(f, args.output, args.solver, kwargs) for f in files]
    if args.workers > 1 and args.solver != "gurobi":
        with multiprocessing.Pool(args.workers) as pool:
            results = pool.map(_solve_one, work)
    else:
        results = [_solve_one(w) for w in work]
    sizes = [s for _, s in results]
    print(
        f"solved {len(results)} graphs with {args.solver}: "
        f"mean set size {np.mean(sizes):.2f} (min {min(sizes)}, max {max(sizes)})"
    )


def aggregate_cmd(args):
    """Collect label files to a CSV of set sizes (reference aggregator.py)."""
    rows = []
    for path in sorted(glob.glob(os.path.join(args.input, "*_unweighted.result"))):
        with open(path) as f:
            labels = [int(x) for x in f.read().split()]
        rows.append(
            {
                "graph": os.path.basename(path).replace("_unweighted.result", ""),
                "nodes": len(labels),
                "set_size": sum(labels),
            }
        )
    with open(args.csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["graph", "nodes", "set_size"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.csv}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("solve")
    s.add_argument("--input", required=True, help="glob of .gpickle graphs")
    s.add_argument("--output", required=True, help="label output dir")
    s.add_argument("--solver", default="greedy", choices=sorted(SOLVERS))
    s.add_argument("--time_limit", type=float, default=60.0)
    s.add_argument("--workers", type=int, default=8)
    s.set_defaults(fn=solve_cmd)
    a = sub.add_parser("aggregate")
    a.add_argument("--input", required=True)
    a.add_argument("--csv", required=True)
    a.set_defaults(fn=aggregate_cmd)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
