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


def two_opt_knn_numpy(
    points: np.ndarray,
    tour: np.ndarray,
    k: int = 10,
    max_sweeps: int = 400,
    tol: float = 1e-9,
) -> np.ndarray:
    """Candidate-restricted 2-opt on CPU for instances too large for the
    dense device path (V=10000 needs a B*V*V delta tensor on device, which
    does not fit HBM). Moves are limited to city pairs that are k-nearest
    neighbors; each sweep computes all O(V*k) candidate deltas vectorized,
    then applies a maximal set of non-overlapping improving reversals
    (best-delta first). Matches the move semantics of the reference's
    batched_two_opt_torch (tsp_utils.py:12-49) restricted to kNN candidates.

    Args: points (V,2); tour closed 0-indexed (V+1,). Returns refined
    closed tour (V+1,)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    V = pts.shape[0]
    seq = np.asarray(tour[:-1], np.int64).copy()  # open tour, length V
    nbr = cKDTree(pts).query(pts, k=k + 1)[1][:, 1:]  # (V,k) excl. self

    for _ in range(max_sweeps):
        pos = np.empty(V, np.int64)
        pos[seq] = np.arange(V)
        nxt = np.roll(seq, -1)                      # city after position p
        # candidate move: remove (seq[i],nxt[i]) and (seq[j],nxt[j]),
        # add (seq[i],seq[j]) and (nxt[i],nxt[j]); i<j in position space
        ci = np.repeat(np.arange(V), k)             # position i
        cj = pos[nbr[seq].reshape(-1)]              # position of neighbor city
        lo = np.minimum(ci, cj)
        hi = np.maximum(ci, cj)
        valid = hi - lo >= 2
        lo, hi = lo[valid], hi[valid]
        a, b = seq[lo], seq[hi]
        an, bn = nxt[lo], nxt[hi]
        delta = (
            np.linalg.norm(pts[a] - pts[b], axis=-1)
            + np.linalg.norm(pts[an] - pts[bn], axis=-1)
            - np.linalg.norm(pts[a] - pts[an], axis=-1)
            - np.linalg.norm(pts[b] - pts[bn], axis=-1)
        )
        imp = delta < -tol
        if not imp.any():
            break
        lo, hi, delta = lo[imp], hi[imp], delta[imp]
        order = np.argsort(delta)
        used = np.zeros(V + 1, bool)
        applied = False
        for m in order:
            i, j = int(lo[m]), int(hi[m])
            # positions i..j+1 are touched (edges (i,i+1) and (j,j+1) removed,
            # segment i+1..j reversed); skip if any already claimed this sweep
            if used[i : j + 2].any():
                continue
            used[i : j + 2] = True
            seq[i + 1 : j + 1] = seq[i + 1 : j + 1][::-1]
            applied = True
        if not applied:
            break
    return np.concatenate([seq, seq[:1]]).astype(np.int32)


def _or_opt_sweep(
    pts: np.ndarray, seq: np.ndarray, nbr: np.ndarray, seg_len: int,
    tol: float = 1e-9,
) -> tuple[np.ndarray, bool]:
    """One Or-opt sweep: relocate segments of ``seg_len`` cities next to a
    kNN candidate. Candidate move for segment at positions p..p+L-1 and
    anchor position q: remove edges (p-1,p), (p+L-1,p+L), (q,q+1); add
    (p-1,p+L), (q,first) and (last,q+1) (forward) or (q,last), (first,q+1)
    (reversed). Non-overlapping accepted moves are applied in one rebuild
    (segments removed, then re-inserted after their anchor CITY, so position
    shifts cannot corrupt the result). Returns (new_seq, improved)."""
    V = seq.shape[0]
    L = seg_len
    k = nbr.shape[1]
    pos = np.empty(V, np.int64)
    pos[seq] = np.arange(V)

    p = np.arange(V)                      # segment start position
    first = seq[p]
    last = seq[(p + L - 1) % V]
    prev = seq[(p - 1) % V]
    nxt = seq[(p + L) % V]
    # anchors: kNN of the segment's first city, as positions
    q = pos[nbr[first]]                   # (V,k) anchor position
    qn = (q + 1) % V
    anc = seq[q]
    ancn = seq[qn]

    d = lambda a, b: np.linalg.norm(pts[a] - pts[b], axis=-1)
    base = d(prev, first) + d(last, nxt)                       # (V,)
    gain_close = base - d(prev, nxt)                           # (V,)
    ins_fwd = d(anc, first[:, None]) + d(last[:, None], ancn) - d(anc, ancn)
    ins_rev = d(anc, last[:, None]) + d(first[:, None], ancn) - d(anc, ancn)
    delta_fwd = ins_fwd - gain_close[:, None]                  # (V,k)
    delta_rev = ins_rev - gain_close[:, None]
    rev_better = delta_rev < delta_fwd
    delta = np.where(rev_better, delta_rev, delta_fwd)

    # anchor must not touch the segment (q in [p, p+L)) or be the city just
    # before it (q == p-1, i.e. the insertion edge is a boundary edge)
    bad = ((q - p[:, None]) % V < L) | ((q - (p[:, None] - 1)) % V == 0)
    delta = np.where(bad, np.inf, delta)
    jbest = np.argmin(delta, axis=1)
    dbest = delta[p, jbest]
    imp = np.flatnonzero(dbest < -tol)
    if imp.size == 0:
        return seq, False

    order = imp[np.argsort(dbest[imp])]
    used = np.zeros(V, bool)
    moves = []                            # (first_city, seg cities, anchor city, reversed)
    for m in order:
        pp = int(m)
        qq = int(q[pp, jbest[pp]])
        span = [(pp - 1) % V] + [(pp + t) % V for t in range(L)] + [(pp + L) % V]
        span += [qq, (qq + 1) % V]
        if any(used[s] for s in span):
            continue
        for s in span:
            used[s] = True
        seg = [int(seq[(pp + t) % V]) for t in range(L)]
        if rev_better[pp, jbest[pp]]:
            seg = seg[::-1]
        moves.append((seg, int(seq[qq])))
    if not moves:
        return seq, False

    moved = {c for seg, _ in moves for c in seg}
    rest = [int(c) for c in seq if int(c) not in moved]
    insert_after = {}
    for seg, anchor_city in moves:
        insert_after.setdefault(anchor_city, []).extend(seg)
    new = []
    for c in rest:
        new.append(c)
        if c in insert_after:
            new.extend(insert_after[c])
    return np.asarray(new, np.int64), True


def local_search_knn(
    points: np.ndarray, tour: np.ndarray, k: int = 10,
    max_rounds: int = 60,
) -> np.ndarray:
    """2-opt + Or-opt(1..3) local search restricted to kNN candidates —
    the CPU labeler for instances beyond dense-device reach. Alternates
    2-opt convergence with Or-opt relocation sweeps until neither improves."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    V = pts.shape[0]
    nbr = cKDTree(pts).query(pts, k=k + 1)[1][:, 1:]
    seq = np.asarray(tour[:-1], np.int64).copy()
    for _ in range(max_rounds):
        seq = np.asarray(
            two_opt_knn_numpy(pts, np.concatenate([seq, seq[:1]]), k=k)[:-1],
            np.int64,
        )
        any_or = False
        for L in (1, 2, 3):
            seq, ch = _or_opt_sweep(pts, seq, nbr, L)
            any_or = any_or or ch
        if not any_or:
            break
    return np.concatenate([seq, seq[:1]]).astype(np.int32)


def two_opt_knn_solve(points_batch: np.ndarray, k: int = 10) -> np.ndarray:
    """Label a (N, V, 2) batch with NN + CPU kNN-restricted 2-opt/Or-opt
    tours -> (N, V+1). The large-V counterpart of two_opt_solve."""
    N = points_batch.shape[0]
    out = []
    for s in range(N):
        tour = nearest_neighbor_tour(points_batch[s])
        out.append(local_search_knn(points_batch[s], tour, k=k))
        print(f"  labeled {s + 1}/{N}", flush=True)
    return np.stack(out)


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
    if solver == "two_opt_knn":
        tours = two_opt_knn_solve(points)
    elif solver == "two_opt":
        if num_nodes > 2000:
            # dense device 2-opt needs a B*V*V delta tensor; too big at this
            # scale — fall back to the CPU kNN-candidate variant
            print(f"V={num_nodes} > 2000: routing solver two_opt -> "
                  "two_opt_knn (candidate-restricted CPU labeler)",
                  flush=True)
            tours = two_opt_knn_solve(points)
        else:
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
