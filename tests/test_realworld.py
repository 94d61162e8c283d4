"""Real-world graph ingestion: format parsers, cleaning, gpickle round-trip."""

import os

import numpy as np

from difusco_tpu.data.mis import MISDataset
from difusco_tpu.data.realworld import (
    clean_edges,
    convert_cmd,
    detect_format,
    load_dimacs,
    load_edgelist,
    load_mtx,
    main,
)


class TestCleanEdges:
    def test_dedupes_undirects_drops_self_loops(self):
        n, e = clean_edges([(3, 5), (5, 3), (3, 3), (5, 7), (7, 5), (3, 7)])
        assert n == 3
        # relabeled to 0..2, unique undirected edges
        assert e.shape == (3, 2)
        assert (e[:, 0] < e[:, 1]).all()

    def test_empty(self):
        n, e = clean_edges([])
        assert n == 0 and e.shape == (0, 2)


class TestParsers:
    def test_edgelist_with_comments_and_header(self, tmp_path):
        p = tmp_path / "g.txt"
        p.write_text(
            "# SNAP-style comment\nsource target\n0\t1\n1\t2\n2,0\n% pct comment\n"
        )
        n, e = load_edgelist(str(p))
        assert n == 3 and len(e) == 3

    def test_mtx(self, tmp_path):
        p = tmp_path / "g.mtx"
        p.write_text(
            "%%MatrixMarket matrix coordinate real general\n"
            "% comment\n"
            "3 3 3\n"
            "1 2 0.5\n2 3 1.0\n3 1 2.0\n"
        )
        n, e = load_mtx(str(p))
        assert n == 3 and len(e) == 3

    def test_dimacs(self, tmp_path):
        p = tmp_path / "g.clq"
        p.write_text("c clique file\np edge 5 3\ne 1 2\ne 2 3\ne 4 5\n")
        n, e = load_dimacs(str(p))
        assert n == 5 and len(e) == 3

    def test_detect(self, tmp_path):
        assert detect_format(str(tmp_path / "x.mtx")) == "mtx"
        assert detect_format(str(tmp_path / "x.clq")) == "dimacs"
        assert detect_format(str(tmp_path / "x.edges")) == "edgelist"


class TestConvertEndToEnd:
    def test_convert_to_gpickle_and_load(self, tmp_path):
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.edges").write_text("0 1\n1 2\n2 3\n3 0\n")
        (src / "b.clq").write_text("p edge 4 2\ne 1 2\ne 3 4\n")
        out = tmp_path / "out"
        main([
            "convert", "--input", str(src / "*"), "--output_dir", str(out),
            "--label",
        ])
        files = sorted(os.listdir(out))
        assert files == ["a.gpickle", "b.gpickle"]

        ds = MISDataset(str(out / "*.gpickle"))
        assert len(ds) == 2
        ex = ds.get(0)
        # labels exist and form an independent set
        labels = np.asarray(ex["labels"])
        assert labels.sum() >= 1
