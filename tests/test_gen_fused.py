"""Fused gen+label pipeline (scripts/gen_label_fused.py): the single-process
generator must produce gpickle/.result files and pack chunks identical in
content to the two-stage generate_mis + mis_solvers + pack_mis_dir flow."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def fused_out(tmp_path_factory):
    td = tmp_path_factory.mktemp("fused")
    name = "er_fused_ut"
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_label_fused.py"),
         "--name", name, "--num", "6", "--seed", "77",
         "--min_n", "40", "--max_n", "50", "--time_limit", "0.05"],
        capture_output=True, text=True, cwd=str(td), env=env)
    assert r.returncode == 0, r.stderr
    yield name
    import shutil
    for d in (f"data/mis_{name}", f"data/mis_{name}_labels",
              f"data/packs/{name}"):
        shutil.rmtree(os.path.join(REPO, d), ignore_errors=True)


def test_labels_are_independent_sets(fused_out):
    import pickle

    for i in range(6):
        with open(os.path.join(
                REPO, "data", f"mis_{fused_out}",
                f"er_{i:05d}.gpickle"), "rb") as f:
            g = pickle.load(f)
        with open(os.path.join(
                REPO, "data", f"mis_{fused_out}_labels",
                f"er_{i:05d}_unweighted.result")) as f:
            lab = np.array([int(x) for x in f.read().split()])
        assert lab.shape[0] == g.number_of_nodes()
        assert lab.sum() > 0
        for u, v in g.edges():
            assert not (lab[u] and lab[v])


def test_chunkwriter_matches_pack_mis_dir(fused_out, tmp_path):
    from difusco_tpu.data.mis import pack_mis_dir
    from scripts.gen_label_fused import ChunkWriter, load_done_graph

    ref_dir = str(tmp_path / "ref")
    pack_mis_dir(os.path.join(REPO, "data", f"mis_{fused_out}", "*.gpickle"),
                 os.path.join(REPO, "data", f"mis_{fused_out}_labels"),
                 ref_dir, chunk=6)
    w = ChunkWriter(str(tmp_path / "fused"), chunk=6)
    for i in range(6):
        n, e, lab = load_done_graph(
            os.path.join(REPO, "data", f"mis_{fused_out}",
                         f"er_{i:05d}.gpickle"),
            os.path.join(REPO, "data", f"mis_{fused_out}_labels",
                         f"er_{i:05d}_unweighted.result"))
        w.add(i, n, e, lab)
    for f in ("eoff_00000.npy", "noff_00000.npy", "labels_00000.npy"):
        assert np.array_equal(np.load(tmp_path / "fused" / f),
                              np.load(os.path.join(ref_dir, f))), f
    ea = np.load(tmp_path / "fused" / "edges_00000.npy")
    eb = np.load(os.path.join(ref_dir, "edges_00000.npy"))
    eo = np.load(tmp_path / "fused" / "eoff_00000.npy")

    def canon(E):
        E = np.sort(E, axis=1)
        return E[np.lexsort((E[:, 1], E[:, 0]))]

    for g in range(6):
        assert np.array_equal(canon(ea[eo[g]:eo[g + 1]]),
                              canon(eb[eo[g]:eo[g + 1]]))
    import json
    sa = json.load(open(tmp_path / "fused" / "stats_00000.json"))
    sb = json.load(open(os.path.join(ref_dir, "stats_00000.json")))
    assert sa == sb


def test_er_edges_distribution():
    from scripts.gen_label_fused import er_edges

    rng = np.random.default_rng(0)
    u, v = er_edges(500, 0.15, rng)
    n_pairs = 500 * 499 // 2
    assert np.all(u < v)
    # binomial(n_pairs, .15): mean 18712, sd ~126 — 6 sigma band
    assert abs(len(u) - 0.15 * n_pairs) < 800


def test_regen_from_labels_only(tmp_path):
    """Graphs are gitignored; a fresh checkout has labels only. The
    generator must deterministically rebuild each graph from seed+index,
    validate the committed label is an IS on it, and skip the ILS solve."""
    import pickle
    import shutil
    import subprocess

    name = "er_regen_ut"
    env = dict(os.environ, PYTHONPATH=REPO)
    cmd = [sys.executable, os.path.join(REPO, "scripts", "gen_label_fused.py"),
           "--name", name, "--num", "3", "--seed", "913",
           "--min_n", "30", "--max_n", "40", "--time_limit", "0.05"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        g1 = os.path.join(REPO, "data", f"mis_{name}", "er_00001.gpickle")
        with open(g1, "rb") as f:
            edges_before = sorted(pickle.load(f).edges())
        os.remove(g1)
        shutil.rmtree(os.path.join(REPO, "data", "packs", name))
        r = subprocess.run(cmd, capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stderr
        with open(g1, "rb") as f:
            edges_after = sorted(pickle.load(f).edges())
        assert edges_before == edges_after
    finally:
        for d in (f"data/mis_{name}", f"data/mis_{name}_labels",
                  f"data/packs/{name}"):
            shutil.rmtree(os.path.join(REPO, d), ignore_errors=True)
