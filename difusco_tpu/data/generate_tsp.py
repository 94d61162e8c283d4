"""TSP instance generation with labeled tours.

Capability parity with reference ``data/generate_tsp_data.py``: sample
uniform-random points in the unit square and label each instance with a tour.
The reference shells out to Concorde/LKH-3; those solvers are not vendored
here, so the built-in labeler is nearest-neighbor construction + exhaustive
2-opt refinement **on device** (our own decode stack), which is exact-enough
for smoke/bench datasets and runs at TPU speed. External solvers remain
supported through the same CLI shape when their binaries are present.

Usage:
  python -m difusco_tpu.data.generate_tsp --num_samples 128 --num_nodes 50 \\
      --filename /tmp/tsp50.txt [--solver {two_opt,concorde,lkh}] [--seed 0]
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import tempfile

import numpy as np

from difusco_tpu.data.tsp import write_tsp_file


def nearest_neighbor_tour(points: np.ndarray) -> np.ndarray:
    """Greedy NN construction -> closed 0-indexed tour (V+1,)."""
    V = points.shape[0]
    visited = np.zeros(V, bool)
    tour = [0]
    visited[0] = True
    for _ in range(V - 1):
        cur = tour[-1]
        d = np.linalg.norm(points - points[cur], axis=-1)
        d[visited] = np.inf
        nxt = int(np.argmin(d))
        tour.append(nxt)
        visited[nxt] = True
    tour.append(0)
    return np.array(tour, np.int32)


def two_opt_solve(points_batch: np.ndarray, chunk: int = 16) -> np.ndarray:
    """Label a (N, V, 2) batch with NN + device 2-opt tours -> (N, V+1).

    Instances are refined in fixed-size device batches (per-instance point
    sets; one compile, lockstep while_loop)."""
    import jax.numpy as jnp

    from difusco_tpu.ops.two_opt import batched_two_opt

    N, V, _ = points_batch.shape
    out = np.zeros((N, V + 1), np.int32)
    for s in range(0, N, chunk):
        b = min(chunk, N - s)
        pts = np.zeros((chunk, V, 2), np.float32)
        pts[:b] = points_batch[s : s + b]
        pts[b:] = points_batch[s]  # pad with a repeat; discarded
        tours = np.stack([nearest_neighbor_tour(p) for p in pts])
        for attempt in range(3):  # retry transient device/tunnel errors
            try:
                refined, _ = batched_two_opt(
                    jnp.asarray(pts), jnp.asarray(tours), max_iterations=5000
                )
                out[s : s + b] = np.asarray(refined)[:b]
                break
            except Exception:
                if attempt == 2:
                    raise
        print(f"  labeled {s + b}/{N}", flush=True)
    return out


def write_tsplib(path: str, points: np.ndarray, name: str = "gen") -> None:
    """TSPLIB EUC_2D instance file (the format both Concorde and LKH
    consume; coordinates scaled to integers as the reference's wrappers do,
    generate_tsp_data.py:46-67)."""
    V = points.shape[0]
    with open(path, "w") as f:
        f.write(f"NAME: {name}\nTYPE: TSP\nDIMENSION: {V}\n")
        f.write("EDGE_WEIGHT_TYPE: EUC_2D\nNODE_COORD_SECTION\n")
        for i, (x, y) in enumerate(points):
            f.write(f"{i + 1} {x * 1e6:.0f} {y * 1e6:.0f}\n")
        f.write("EOF\n")


def _close_tour(tour: np.ndarray, V: int) -> np.ndarray:
    tour = np.asarray(tour, np.int32)
    assert sorted(tour.tolist()) == list(range(V)), "solver tour not a permutation"
    return np.concatenate([tour, tour[:1]])


def solve_concorde(points: np.ndarray, binary: str = "concorde") -> np.ndarray:
    """Concorde CLI protocol: ``concorde -x -o out.sol inst.tsp``; the
    solution file is "<V>\\n<space-separated 0-indexed tour>" (what the
    reference reaches through pyconcorde, generate_tsp_data.py:46-56).
    Returns a closed 0-indexed tour (V+1,)."""
    V = points.shape[0]
    with tempfile.TemporaryDirectory() as td:
        inst = f"{td}/inst.tsp"
        sol = f"{td}/inst.sol"
        write_tsplib(inst, points)
        subprocess.run(
            [binary, "-x", "-o", sol, inst],
            capture_output=True, text=True, timeout=3600, check=True, cwd=td,
        )
        toks = open(sol).read().split()
    assert int(toks[0]) == V, f"solution header {toks[0]} != V={V}"
    return _close_tour(np.array(toks[1:], np.int32), V)


def solve_lkh(points: np.ndarray, binary: str = "LKH",
              runs: int = 1, seed: int = 0) -> np.ndarray:
    """LKH-3 CLI protocol: a parameter file naming PROBLEM_FILE and
    TOUR_FILE; the tour file's TOUR_SECTION lists 1-indexed cities
    terminated by -1 (what the reference reaches through the lkh wrapper,
    generate_tsp_data.py:57-67). Returns a closed 0-indexed tour (V+1,)."""
    V = points.shape[0]
    with tempfile.TemporaryDirectory() as td:
        inst = f"{td}/inst.tsp"
        tourf = f"{td}/inst.tour"
        par = f"{td}/inst.par"
        write_tsplib(inst, points)
        with open(par, "w") as f:
            f.write(f"PROBLEM_FILE = {inst}\nTOUR_FILE = {tourf}\n"
                    f"RUNS = {runs}\nSEED = {seed}\nTRACE_LEVEL = 0\n")
        subprocess.run([binary, par], capture_output=True, text=True,
                       timeout=3600, check=True)
        lines = [ln.strip() for ln in open(tourf)]
    tour = []
    in_section = False
    for ln in lines:
        if ln == "TOUR_SECTION":
            in_section = True
            continue
        if not in_section:
            continue
        if ln in ("-1", "EOF"):
            break
        tour.append(int(ln) - 1)
    return _close_tour(np.array(tour, np.int32), V)


def _external_solve(points: np.ndarray, solver: str) -> np.ndarray:
    """Solve one instance with an external binary (concorde / lkh), matching
    the reference's external-solver tier (generate_tsp_data.py:46-67)."""
    name = {"concorde": "concorde", "lkh": "LKH"}.get(solver, solver)
    binary = shutil.which(name) or shutil.which(solver)
    if binary is None:
        raise RuntimeError(
            f"external solver {solver!r} not found on PATH; "
            "use --solver two_opt for the built-in labeler"
        )
    if solver == "concorde":
        return solve_concorde(points, binary)
    return solve_lkh(points, binary)


def generate(
    num_samples: int, num_nodes: int, solver: str = "two_opt", seed: int = 0
):
    rng = np.random.default_rng(seed)
    points = rng.random((num_samples, num_nodes, 2))
    if solver == "two_opt":
        tours = two_opt_solve(points)
    else:
        tours = np.stack([_external_solve(p, solver) for p in points])
    return list(zip(points, tours))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num_samples", type=int, default=128)
    p.add_argument("--num_nodes", type=int, default=50)
    p.add_argument("--filename", type=str, required=True)
    p.add_argument("--solver", type=str, default="two_opt")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    instances = generate(args.num_samples, args.num_nodes, args.solver, args.seed)
    write_tsp_file(args.filename, instances)
    print(f"wrote {len(instances)} TSP-{args.num_nodes} instances to {args.filename}")


if __name__ == "__main__":
    main()
