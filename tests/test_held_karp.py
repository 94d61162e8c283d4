"""Held–Karp 1-tree lower bound: exactness on brute-forceable instances and
validity (LB <= any tour cost) on larger ones."""

import itertools

import numpy as np

from difusco_tpu.ops.held_karp import held_karp_lower_bound


def _brute_force_opt(pts):
    V = pts.shape[0]
    D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    return min(
        sum(D[p[i], p[i + 1]] for i in range(V - 1)) + D[p[-1], p[0]]
        for p in itertools.permutations(range(V)) if p[0] == 0
    )


def test_matches_optimum_on_tiny_instances():
    rng = np.random.default_rng(0)
    for _ in range(3):
        pts = rng.random((8, 2))
        opt = _brute_force_opt(pts)
        lb = held_karp_lower_bound(pts, iterations=300)
        assert lb <= opt + 1e-9, "not a lower bound"
        assert lb >= 0.99 * opt, f"weak bound: {lb} vs {opt}"


def test_is_lower_bound_for_any_tour():
    rng = np.random.default_rng(1)
    pts = rng.random((40, 2))
    lb = held_karp_lower_bound(pts, iterations=400)
    D = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    for seed in range(5):
        perm = np.random.default_rng(seed).permutation(40)
        cost = D[perm, np.roll(perm, -1)].sum()
        assert lb <= cost + 1e-9


def test_explicit_upper_bound_step_sizing():
    rng = np.random.default_rng(2)
    pts = rng.random((20, 2))
    lb_auto = held_karp_lower_bound(pts, iterations=200)
    lb_ub = held_karp_lower_bound(pts, upper_bound=10.0, iterations=200)
    # both are valid bounds; they should land near each other
    assert abs(lb_auto - lb_ub) / lb_auto < 0.05


def test_jax_path_matches_numpy():
    """use_jax runs a jitted lazy-reduced-cost Prim (no O(V^2) temporary)
    with fp64 recertification — the bound must agree with the pure-numpy
    ascent to fp32-ascent tolerance and stay a valid lower bound."""
    rng = np.random.default_rng(3)
    pts = rng.random((40, 2))
    lb_np = held_karp_lower_bound(pts, iterations=150)
    lb_jx = held_karp_lower_bound(pts, iterations=150, use_jax=True)
    assert abs(lb_np - lb_jx) / lb_np < 1e-4
    # validity: below any tour (nearest-neighbor tour as a cheap UB)
    from difusco_tpu.data.generate_tsp import nearest_neighbor_tour

    t = nearest_neighbor_tour(pts)
    d = pts[t[1:]] - pts[t[:-1]]
    ub = float(np.sqrt((d * d).sum(-1)).sum())
    assert lb_jx <= ub
