"""Native Held-Karp bound tool (native/hk/hk_bound.cpp) vs the numpy
reference implementation (difusco_tpu/ops/held_karp.py).

Both run the same subgradient ascent schedule in fp64, so the certified
bounds must agree to floating-point noise — this is what licenses
scripts/compute_hk_bounds.py --native to substitute the C++ path for the
numpy one on the V=10000 split (VERDICT r2 missing #3).
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from difusco_tpu.ops.held_karp import held_karp_lower_bound

BINARY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "native", "build", "hk_bound")

pytestmark = pytest.mark.skipif(
    not os.path.exists(BINARY), reason="native hk_bound not built")


def _native(pts, iterations, ub=None):
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for x, y in pts:
            f.write(f"{float(x):.17g} {float(y):.17g}\n")
        path = f.name
    try:
        cmd = [BINARY, path, "--iterations", str(iterations)]
        if ub is not None:
            cmd += ["--ub", f"{ub:.17g}"]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        return float(out.stdout.split()[1])
    finally:
        os.unlink(path)


@pytest.mark.parametrize("V,seed", [(20, 0), (60, 1), (120, 2)])
def test_native_matches_numpy(V, seed):
    rng = np.random.default_rng(seed)
    pts = rng.random((V, 2))
    lb_np = held_karp_lower_bound(pts, iterations=80)
    lb_c = _native(pts, iterations=80)
    assert lb_c == pytest.approx(lb_np, rel=1e-9)


def test_native_with_explicit_ub():
    rng = np.random.default_rng(3)
    pts = rng.random((40, 2))
    tour = np.arange(41) % 40  # arbitrary closed tour as UB
    d = pts[tour[1:]] - pts[tour[:-1]]
    ub = float(np.sqrt((d * d).sum(-1)).sum())
    lb_np = held_karp_lower_bound(pts, upper_bound=ub, iterations=80)
    lb_c = _native(pts, iterations=80, ub=ub)
    assert lb_c == pytest.approx(lb_np, rel=1e-9)
    assert lb_c <= ub


def test_native_bound_below_optimal_square():
    # 4 corners of a unit square: optimal tour = 4.0; HK bound must certify
    pts = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    lb = _native(pts, iterations=200)
    assert lb <= 4.0 + 1e-9
    assert lb >= 3.9  # ascent should get essentially tight here
