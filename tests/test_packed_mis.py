"""Packed MIS dataset: pack_mis_dir + PackedMISDataset must reproduce
MISDataset's padded examples exactly (same graphs, same labels, same static
shapes) — the packed path exists so reference-scale training sets
(reproducing_scripts.md:340-368 trains on 163k ER graphs) load lazily
instead of residing in RAM."""

import glob
import os

import numpy as np
import pytest

from difusco_tpu.data.mis import MISDataset, PackedMISDataset, pack_mis_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VAL_GLOB = os.path.join(REPO, "data", "mis_er700800_val", "*.gpickle*")
VAL_LABELS = os.path.join(REPO, "data", "mis_er700800_val_labels")


@pytest.fixture(scope="module")
def packed_dir(tmp_path_factory):
    if not glob.glob(VAL_GLOB):
        pytest.skip("no val graphs committed")
    d = str(tmp_path_factory.mktemp("pack"))
    n = pack_mis_dir(VAL_GLOB, VAL_LABELS, d, chunk=6)
    assert n == len(glob.glob(VAL_GLOB))
    return d


class TestPackedParity:
    def test_examples_match_misdataset(self, packed_dir):
        ref = MISDataset(VAL_GLOB, label_dir=VAL_LABELS)
        ds = PackedMISDataset(packed_dir, max_nodes=ref.max_nodes,
                              max_degree=ref.max_degree)
        assert len(ds) == len(ref)
        for i in range(len(ds)):
            a, b = ds.get(i), ref.get(i)
            for k in ("labels", "neighbors", "mask", "node_mask"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{i}/{k}")
            assert a["num_nodes"] == b["num_nodes"]

    def test_stats_match(self, packed_dir):
        ref = MISDataset(VAL_GLOB, label_dir=VAL_LABELS)
        ds = PackedMISDataset(packed_dir)
        assert ds.max_nodes == ref.max_nodes
        assert ds.max_degree == ref.max_degree

    def test_batches_shapes(self, packed_dir):
        ds = PackedMISDataset(packed_dir, max_nodes=800, max_degree=180)
        b = next(iter(ds.batches(4, seed=0)))
        assert b["labels"].shape == (4, 800)
        assert b["neighbors"].shape == (4, 800, 180)

    def test_pack_resumes_and_skips_complete_chunks(self, packed_dir,
                                                    tmp_path):
        # re-running over the same dir packs nothing new but reports all
        n1 = pack_mis_dir(VAL_GLOB, VAL_LABELS, packed_dir, chunk=6)
        assert n1 == len(glob.glob(VAL_GLOB))

    def test_partial_chunk_not_frozen_while_growing(self, tmp_path):
        # copy 3 graphs + labels for only 2 of them: with chunk=2 the packer
        # must write one full chunk and leave the partial tail unpacked
        import shutil

        files = sorted(glob.glob(VAL_GLOB))[:3]
        if len(files) < 3:
            pytest.skip("need 3 val graphs")
        gdir = tmp_path / "g"
        ldir = tmp_path / "l"
        gdir.mkdir()
        ldir.mkdir()
        for i, f in enumerate(files):
            base = os.path.basename(f)
            shutil.copy(f, gdir / base)
            if i < 2:
                stem = base[: -len(".gz")] if base.endswith(".gz") else base
                stem = stem.replace(".gpickle", "_unweighted.result")
                shutil.copy(os.path.join(VAL_LABELS, stem), ldir / stem)
        out = str(tmp_path / "pack")
        n = pack_mis_dir(str(gdir / "*.gpickle*"), str(ldir), out, chunk=2)
        assert n == 2  # full chunk packed, partial tail deferred


class TestPackedCLITraining:
    def test_cli_trains_from_packed_dirs(self, tmp_path):
        """End-to-end: generate tiny ER graphs -> label -> pack -> train 1
        epoch through the CLI --packed_dirs surface."""
        import subprocess
        import sys

        from difusco_tpu.cli import arg_parser, config_from_args, run
        from difusco_tpu.data.generate_mis import main as gen_main

        gdir = tmp_path / "graphs"
        gen_main(["gendata", "--model", "er", "--num_graphs", "12",
                  "--min_n", "12", "--max_n", "16", "--er_p", "0.3",
                  "--output_dir", str(gdir), "--seed", "0"])
        ldir = tmp_path / "labels"
        subprocess.run(
            [sys.executable, "-m", "difusco_tpu.data.mis_solvers", "solve",
             "--input", str(gdir / "*.gpickle"), "--output", str(ldir),
             "--solver", "greedy", "--workers", "1"],
            check=True, capture_output=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PALLAS_AXON_POOL_IPS": ""},
        )
        pdir = tmp_path / "pack"
        n = pack_mis_dir(str(gdir / "*.gpickle"), str(ldir), str(pdir),
                         chunk=8)
        assert n == 12

        args = arg_parser().parse_args([
            "--task", "mis", "--do_train",
            "--storage_path", str(tmp_path),
            "--packed_dirs", str(pdir),
            "--validation_split", str(gdir / "*.gpickle"),
            "--test_split", str(gdir / "*.gpickle"),
            "--diffusion_type", "gaussian",
            "--diffusion_steps", "20", "--inference_diffusion_steps", "2",
            "--n_layers", "2", "--hidden_dim", "32", "--batch_size", "4",
            "--num_epochs", "1", "--validation_examples", "2",
            "--logger_name", "packtest",
        ])
        metrics = run(config_from_args(args))
        assert np.isfinite(metrics.get("val/solved_cost", np.nan))


class TestRefresh:
    def test_epoch_boundary_refresh_picks_up_new_chunks(self, tmp_path):
        import json

        def write_chunk(d, j, n_graphs, n=8, seed=0):
            rng = np.random.default_rng(seed)
            edges, eoff, labels, noff = [], [0], [], [0]
            for _ in range(n_graphs):
                e = np.array([[i, (i + 1) % n] for i in range(n)], np.int32)
                edges.append(e)
                eoff.append(eoff[-1] + len(e))
                lab = np.zeros(n, np.int8)
                lab[::2] = 1
                labels.append(lab)
                noff.append(noff[-1] + n)
            np.save(d / f"edges_{j:05d}.npy", np.concatenate(edges))
            np.save(d / f"eoff_{j:05d}.npy", np.asarray(eoff, np.int64))
            np.save(d / f"labels_{j:05d}.npy", np.concatenate(labels))
            np.save(d / f"noff_{j:05d}.npy", np.asarray(noff, np.int64))
            with open(d / f"stats_{j:05d}.json", "w") as f:
                json.dump({"n": n_graphs, "max_nodes": n,
                           "max_degree": 3}, f)

        d = tmp_path / "packs"
        d.mkdir()
        write_chunk(d, 0, 4)
        ds = PackedMISDataset([str(d)], max_nodes=8, max_degree=3,
                              auto_refresh=True)
        assert len(ds) == 4
        it = ds.batches(2, epochs=None, seed=1)
        for _ in range(2):  # consume epoch 0 (4 graphs / B=2)
            next(it)
        write_chunk(d, 1, 4, seed=1)
        seen = set()
        for _ in range(4):  # epoch 1 must cover all 8 graphs
            b = next(it)
            seen.add(b["labels"].shape[0])
        assert len(ds) == 8

    def test_oversize_late_chunk_skipped(self, tmp_path, capsys):
        import json

        d = tmp_path / "p"
        d.mkdir()
        e = np.array([[0, 1]], np.int32)
        for j, n in [(0, 4), (1, 99)]:
            np.save(d / f"edges_{j:05d}.npy", e)
            np.save(d / f"eoff_{j:05d}.npy", np.array([0, 1], np.int64))
            np.save(d / f"labels_{j:05d}.npy", np.zeros(n, np.int8))
            np.save(d / f"noff_{j:05d}.npy", np.array([0, n], np.int64))
            if j == 0:
                with open(d / f"stats_{j:05d}.json", "w") as f:
                    json.dump({"n": 1, "max_nodes": n, "max_degree": 2}, f)
        ds = PackedMISDataset([str(d)], max_nodes=8, max_degree=4,
                              auto_refresh=True)
        with open(d / "stats_00001.json", "w") as f:
            json.dump({"n": 1, "max_nodes": 99, "max_degree": 2}, f)
        assert ds.refresh() == 0  # oversize chunk skipped, len unchanged
        assert len(ds) == 1
