"""Conformance tests for the external-solver subprocess protocols.

The real binaries (Concorde, LKH-3, KaMIS redumis) are not installed in this
environment, so each driver is exercised against a FAKE binary that speaks
the same file protocol — verifying the instance files we write are
well-formed and the output parsing is correct end-to-end (VERDICT r1 item 9).
The fake solvers validate their input and exit non-zero on malformed files,
so a protocol regression fails loudly.
"""

import os
import stat
import sys
import textwrap

import networkx as nx
import numpy as np
import pytest

from difusco_tpu.data.generate_tsp import solve_concorde, solve_lkh
from difusco_tpu.data import mis_solvers


def _make_fake(tmp_path, name, body):
    path = tmp_path / name
    path.write_text(f"#!{sys.executable}\n" + textwrap.dedent(body))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


FAKE_CONCORDE = """
    import sys
    # argv: -x -o <sol> <inst.tsp>
    args = sys.argv[1:]
    assert args[0] == "-x" and args[1] == "-o", f"unexpected argv {args}"
    sol, inst = args[2], args[3]
    dim = None
    coords = []
    in_coords = False
    for ln in open(inst):
        ln = ln.strip()
        if ln.startswith("DIMENSION"):
            dim = int(ln.split(":")[1])
        elif ln.startswith("EDGE_WEIGHT_TYPE"):
            assert "EUC_2D" in ln
        elif ln == "NODE_COORD_SECTION":
            in_coords = True
        elif ln == "EOF":
            break
        elif in_coords:
            i, x, y = ln.split()
            coords.append((int(i), float(x), float(y)))
    assert dim is not None and len(coords) == dim, "bad TSPLIB file"
    assert [c[0] for c in coords] == list(range(1, dim + 1))
    # a deterministic non-identity permutation (reversed order)
    tour = list(range(dim))[::-1]
    with open(sol, "w") as f:
        f.write(f"{dim}\\n" + " ".join(map(str, tour)) + "\\n")
"""

FAKE_LKH = """
    import sys
    par = dict()
    for ln in open(sys.argv[1]):
        if "=" in ln:
            k, v = ln.split("=", 1)
            par[k.strip()] = v.strip()
    assert "PROBLEM_FILE" in par and "TOUR_FILE" in par, par
    dim = None
    for ln in open(par["PROBLEM_FILE"]):
        if ln.startswith("DIMENSION"):
            dim = int(ln.split(":")[1])
    assert dim is not None
    with open(par["TOUR_FILE"], "w") as f:
        f.write("NAME : inst.tour\\nTYPE : TOUR\\n")
        f.write(f"DIMENSION : {dim}\\nTOUR_SECTION\\n")
        for i in range(dim, 0, -1):   # 1-indexed, reversed
            f.write(f"{i}\\n")
        f.write("-1\\nEOF\\n")
"""

FAKE_REDUMIS = """
    import sys
    args = sys.argv[1:]
    graph = args[0]
    out = [a.split("=", 1)[1] for a in args if a.startswith("--output=")][0]
    tl = [a for a in args if a.startswith("--time_limit=")]
    assert tl, "missing --time_limit"
    float(tl[0].split("=", 1)[1])
    lines = open(graph).read().splitlines()
    n, m = map(int, lines[0].split())
    assert len(lines) == n + 1, f"METIS line count {len(lines)} != n+1"
    deg_sum = 0
    for i, ln in enumerate(lines[1:]):
        nbrs = [int(x) for x in ln.split()]
        assert all(1 <= j <= n and j != i + 1 for j in nbrs), "bad METIS nbr"
        deg_sum += len(nbrs)
    assert deg_sum == 2 * m, f"edge count mismatch {deg_sum} != 2m={2 * m}"
    # greedy independent set by node order (valid protocol output)
    adj = [set(int(x) - 1 for x in ln.split()) for ln in lines[1:]]
    chosen, banned = [], set()
    for i in range(n):
        if i not in banned:
            chosen.append(i)
            banned |= adj[i]
    bits = ["1" if i in set(chosen) else "0" for i in range(n)]
    with open(out, "w") as f:
        f.write("\\n".join(bits) + "\\n")
"""


class TestConcordeProtocol:
    def test_roundtrip_with_fake_binary(self, tmp_path):
        binary = _make_fake(tmp_path, "concorde", FAKE_CONCORDE)
        pts = np.random.default_rng(0).random((12, 2))
        tour = solve_concorde(pts, binary=binary)
        assert tour.shape == (13,)
        assert tour[0] == tour[-1]
        assert sorted(tour[:-1].tolist()) == list(range(12))
        # the fake emits the reversed order — parsing must preserve it
        assert tour[:-1].tolist() == list(range(12))[::-1]


class TestLKHProtocol:
    def test_roundtrip_with_fake_binary(self, tmp_path):
        binary = _make_fake(tmp_path, "LKH", FAKE_LKH)
        pts = np.random.default_rng(1).random((9, 2))
        tour = solve_lkh(pts, binary=binary)
        assert tour[0] == tour[-1]
        assert sorted(tour[:-1].tolist()) == list(range(9))
        assert tour[:-1].tolist() == list(range(9))[::-1]


class TestKamisProtocol:
    def test_roundtrip_with_fake_binary(self, tmp_path, monkeypatch):
        binary = _make_fake(tmp_path, "redumis", FAKE_REDUMIS)
        monkeypatch.setattr(
            mis_solvers.shutil, "which",
            lambda name: binary if name == "redumis" else None)
        g = nx.erdos_renyi_graph(30, 0.2, seed=3)
        label = mis_solvers.solve_kamis(g, time_limit=5.0)
        assert label.shape == (30,)
        assert set(np.unique(label)) <= {0, 1}
        # independence: the returned set must contain no edge
        chosen = {i for i in range(30) if label[i]}
        assert not any(a in chosen and b in chosen for a, b in g.edges
                       if a != b)
        assert label.sum() >= 1

    def test_metis_writer_counts(self, tmp_path):
        """write_metis must emit the KaMIS header + 1-indexed neighbor
        lines exactly (reference solvers/kamis.py:40-60)."""
        g = nx.path_graph(4)
        path = tmp_path / "g.graph"
        mis_solvers.write_metis(g, str(path))
        lines = path.read_text().splitlines()
        assert lines[0] == "4 3"
        assert lines[1] == "2"
        assert lines[2] == "1 3"
        assert lines[3] == "2 4"
        assert lines[4] == "3"


class TestNativeILSViaProtocol:
    def test_ils_speaks_redumis_protocol(self):
        """The native mis_ils binary is driven through the SAME protocol
        path as KaMIS — an end-to-end real-binary exercise of the driver."""
        g = nx.erdos_renyi_graph(40, 0.15, seed=5)
        try:
            label = mis_solvers.solve_ils(g, time_limit=0.5)
        except RuntimeError:
            pytest.skip("mis_ils binary not built")
        chosen = {i for i in range(40) if label[i]}
        assert not any(a in chosen and b in chosen for a, b in g.edges
                       if a != b)
        assert label.sum() >= 3
