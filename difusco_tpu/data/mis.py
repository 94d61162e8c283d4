"""MIS dataset: pickled networkx graphs with optional external labels.

Capability parity with reference ``MISDataset``
(difusco/co_datasets/mis_dataset.py): a glob of ``.gpickle`` files, node
labels from the ``label`` node attribute or from KaMIS ``*_unweighted.result``
files; edges are made bidirectional and self-loops are added.

TPU-native redesign: each graph is converted to the padded fixed-degree
layout (neighbors (V, K) + mask), where K is the dataset-wide max degree
(+1 for the self-loop) so every batch has static shapes for XLA. Variable
node counts are padded to the dataset max with a node mask.
"""

from __future__ import annotations

import dataclasses
import glob
import os
import pickle
from typing import Iterator, Optional

import numpy as np


def graph_to_fixed_degree(edges: np.ndarray, num_nodes: int, max_degree: int):
    """COO edges (2, E) (already bidirectional, with self-loops) -> padded
    (neighbors (V, K), mask (V, K)). Vectorized: sort by source, rank each
    edge within its source group, one scatter."""
    src, dst = edges[0], edges[1]
    order = np.argsort(src, kind="stable")
    src_s, dst_s = src[order], dst[order]
    # rank within the source group: position minus the group's start offset
    starts = np.searchsorted(src_s, np.arange(num_nodes))
    rank = np.arange(src_s.shape[0]) - starts[src_s]
    nbrs = np.zeros((num_nodes, max_degree), np.int32)
    mask = np.zeros((num_nodes, max_degree), np.float32)
    nbrs[src_s, rank] = dst_s
    mask[src_s, rank] = 1.0
    return nbrs, mask


def load_gpickle(path: str):
    """Load one pickled networkx graph -> (num_nodes, labels or None,
    edges (2, E) bidirectional with self-loops) — mirrors
    mis_dataset.py:23-50. ``.gpickle.gz`` files are transparently
    decompressed."""
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rb") as f:
            graph = pickle.load(f)
    else:
        with open(path, "rb") as f:
            graph = pickle.load(f)
    num_nodes = graph.number_of_nodes()
    labels = [lab for _, lab in graph.nodes(data="label")]
    node_labels = (
        np.array(labels, np.int64) if labels and labels[0] is not None else None
    )
    edges = np.array(graph.edges, dtype=np.int64)
    if edges.size == 0:
        edges = np.zeros((0, 2), np.int64)
    edges = np.concatenate([edges, edges[:, ::-1]], axis=0)
    self_loop = np.arange(num_nodes).reshape(-1, 1).repeat(2, axis=1)
    edges = np.concatenate([edges, self_loop], axis=0)
    return num_nodes, node_labels, edges.T


def _pad_example(n, labels, edges, max_nodes, max_degree):
    """COO bidir+self-loop edges -> the padded fixed-degree example dict."""
    nbrs, mask = graph_to_fixed_degree(edges, n, max_degree)
    V = max_nodes
    out_labels = np.zeros(V, np.float32)
    out_labels[:n] = labels
    out_nbrs = np.zeros((V, max_degree), np.int32)
    out_nbrs[:n] = nbrs
    out_mask = np.zeros((V, max_degree), np.float32)
    out_mask[:n] = mask
    node_mask = np.zeros(V, np.float32)
    node_mask[:n] = 1.0
    return {
        "labels": out_labels,
        "neighbors": out_nbrs,
        "mask": out_mask,
        "node_mask": node_mask,
        "num_nodes": np.int32(n),
    }


@dataclasses.dataclass
class MISDataset:
    """MIS dataset over a glob of .gpickle graphs.

    Args:
      data_glob: e.g. "path/*.gpickle".
      label_dir: directory of KaMIS ``<stem>_unweighted.result`` files
        (one 0/1 per line), overriding node attributes.
    """

    data_glob: str
    label_dir: Optional[str] = None

    def __post_init__(self):
        self.files = sorted(glob.glob(self.data_glob))
        if not self.files:
            raise ValueError(f"no graphs match {self.data_glob!r}")
        # one pass to size the static shapes; raw graphs are cached so
        # epochs never re-read or re-unpickle files (host input pipeline
        # feeding the device stays cheap)
        self.max_nodes = 0
        self.max_degree = 0
        self._raw = []
        self._cache: dict = {}
        for f in self.files:
            n, labels, edges = load_gpickle(f)
            self._raw.append((n, labels, edges))
            deg = np.bincount(edges[0], minlength=n)
            self.max_nodes = max(self.max_nodes, n)
            self.max_degree = max(self.max_degree, int(deg.max()) if n else 0)

    def __len__(self) -> int:
        return len(self.files)

    def get(self, idx: int) -> dict:
        """One example, padded to (max_nodes, max_degree):
        dict(labels (V,), neighbors (V,K), mask (V,K), node_mask (V,),
             num_nodes scalar)."""
        if idx in self._cache:
            return self._cache[idx]
        path = self.files[idx]
        n, labels, edges = self._raw[idx]
        if self.label_dir is not None:
            base = os.path.basename(path)
            if base.endswith(".gz"):
                base = base[: -len(".gz")]
            base = base.replace(".gpickle", "_unweighted.result")
            with open(os.path.join(self.label_dir, base)) as f:
                labels = np.array([int(x) for x in f.read().splitlines()], np.int64)
            assert labels.shape[0] == n
        if labels is None:
            labels = np.zeros(n, np.int64)
        ex = _pad_example(n, labels, edges, self.max_nodes, self.max_degree)
        self._cache[idx] = ex
        return ex

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        epochs: Optional[int] = 1,
    ) -> Iterator[dict]:
        rng = np.random.default_rng(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(self))
            if shuffle:
                rng.shuffle(order)
            limit = (len(self) // batch_size) * batch_size if drop_last else len(self)
            for s in range(0, limit, batch_size):
                idxs = order[s : s + batch_size]
                if drop_last and len(idxs) < batch_size:
                    continue
                examples = [self.get(int(i)) for i in idxs]
                yield {
                    k: np.stack([ex[k] for ex in examples]) for k in examples[0]
                }
            epoch += 1


# -- packed format: reference-scale training sets ---------------------------
#
# MISDataset eagerly unpickles every networkx graph and holds both the raw
# edge lists and the converted padded examples in RAM — right for the
# reference-sized test splits, but a 30k-graph ER-[700-800] training set
# would cost ~40 min of startup unpickling and tens of GB of residency.
# The packed format converts a labeled gpickle directory ONCE into flat
# memory-mapped chunk arrays; PackedMISDataset then builds each padded
# example on the fly from an mmap slice (~5 ms), so startup is instant and
# residency is the OS page cache's problem. This is the TPU-native analog
# of the reference's DataLoader-with-workers scaling path
# (difusco/co_datasets/mis_dataset.py + pl_meta_model.py:186-192).


def pack_mis_dir(data_glob: str, label_dir: str, out_dir: str,
                 chunk: int = 1024, require_labels: bool = True) -> int:
    """Pack labeled graphs into chunked .npy arrays under ``out_dir``.

    Per chunk j: edges_{j}.npy (E,2) int32 undirected COO, eoff_{j}.npy
    int64 (n+1), labels_{j}.npy int8, noff_{j}.npy int64 (n+1), and
    stats_{j}.json with that chunk's max_nodes / max_degree (degree
    counted as MISDataset does: bidirectional + self-loop). Resumable —
    complete chunks (stats file present) are skipped; only graphs whose
    label file exists are packed, so it can run incrementally behind a
    labeling pipeline. Returns the number of graphs packed in total."""
    import json

    files = sorted(glob.glob(data_glob))
    os.makedirs(out_dir, exist_ok=True)
    labeled = []
    for f in files:
        base = os.path.basename(f)
        if base.endswith(".gz"):
            base = base[: -len(".gz")]
        lab = os.path.join(label_dir, base.replace(".gpickle",
                                                   "_unweighted.result"))
        if os.path.exists(lab):
            labeled.append((f, lab))
        elif require_labels:
            break  # keep chunk->graph mapping stable: stop at first gap
    total = 0
    for j in range(len(labeled) // chunk + (len(labeled) % chunk > 0)):
        part = labeled[j * chunk : (j + 1) * chunk]
        if len(part) < chunk and len(labeled) < len(files):
            break  # dir still growing: don't freeze a partial trailing
            # chunk — its chunk->graph mapping would drop later arrivals
        stats_p = os.path.join(out_dir, f"stats_{j:05d}.json")
        if os.path.exists(stats_p):
            with open(stats_p) as f:
                total += json.load(f)["n"]
            continue
        all_edges, eoff = [], [0]
        all_labels, noff = [], [0]
        max_nodes = max_degree = 0
        for gp, lp in part:
            n, _, edges = load_gpickle(gp)
            with open(lp) as f:
                labels = np.array([int(x) for x in f.read().split()], np.int8)
            assert labels.shape[0] == n, (gp, labels.shape, n)
            deg = np.bincount(edges[0], minlength=n)
            max_nodes = max(max_nodes, n)
            max_degree = max(max_degree, int(deg.max()) if n else 0)
            # store undirected edges only; get() rebuilds bidir + self-loops
            und = edges.T[: (edges.shape[1] - n) // 2]
            all_edges.append(und.astype(np.int32))
            eoff.append(eoff[-1] + len(und))
            all_labels.append(labels)
            noff.append(noff[-1] + n)
        np.save(os.path.join(out_dir, f"edges_{j:05d}.npy"),
                np.concatenate(all_edges) if all_edges else
                np.zeros((0, 2), np.int32))
        np.save(os.path.join(out_dir, f"eoff_{j:05d}.npy"),
                np.asarray(eoff, np.int64))
        np.save(os.path.join(out_dir, f"labels_{j:05d}.npy"),
                np.concatenate(all_labels) if all_labels else
                np.zeros((0,), np.int8))
        np.save(os.path.join(out_dir, f"noff_{j:05d}.npy"),
                np.asarray(noff, np.int64))
        tmp = stats_p + ".tmp"
        with open(tmp, "w") as f:  # stats file last = chunk-complete marker
            json.dump({"n": len(part), "max_nodes": max_nodes,
                       "max_degree": max_degree}, f)
        os.replace(tmp, stats_p)
        total += len(part)
    return total


class PackedMISDataset:
    """Lazy dataset over one or more packed directories (``pack_mis_dir``).

    ``max_nodes`` / ``max_degree`` fix the padded static shapes; pass them
    explicitly for a still-growing training set so XLA never sees a new
    shape as data arrives (defaults: the max over all packed chunks)."""

    def __init__(self, pack_dirs, max_nodes: Optional[int] = None,
                 max_degree: Optional[int] = None,
                 auto_refresh: bool = False):
        if isinstance(pack_dirs, str):
            pack_dirs = [pack_dirs]
        self._dirs = list(pack_dirs)
        self._seen = set()
        self._chunks = []  # (edges, eoff, labels, noff, n)
        self._stat_nodes = self._stat_deg = 0
        self.auto_refresh = auto_refresh
        if max_nodes and max_degree:
            # explicit caps: install them BEFORE the initial scan so an
            # oversize chunk gets the same skip-with-warning path as a
            # refresh-time scan — otherwise a job that ran fine by skipping
            # a late oversize chunk crashes on restart (advisor r4 #2)
            self.max_nodes = max_nodes
            self.max_degree = max_degree
        self._scan()
        if not self._chunks:
            raise ValueError(f"no packed chunks under {pack_dirs!r}")
        self.max_nodes = max_nodes or self._stat_nodes
        self.max_degree = max_degree or self._stat_deg
        assert self.max_nodes >= self._stat_nodes, (self.max_nodes,
                                                    self._stat_nodes)
        assert self.max_degree >= self._stat_deg, (self.max_degree,
                                                   self._stat_deg)

    def _scan(self) -> int:
        """Pick up chunk files not yet loaded (append-only: a labeling
        pipeline behind this dataset only ever adds chunks). Returns the
        number of new chunks."""
        import json

        new = 0
        for d in self._dirs:
            for sp in sorted(glob.glob(os.path.join(d, "stats_*.json"))):
                if sp in self._seen:
                    continue
                j = os.path.basename(sp)[len("stats_"):-len(".json")]
                with open(sp) as f:
                    st = json.load(f)
                if hasattr(self, "max_nodes") and (
                        st["max_nodes"] > self.max_nodes
                        or st["max_degree"] > self.max_degree):
                    # a late chunk that would break the fixed padded shapes:
                    # skip it (XLA must never see a new shape mid-run)
                    print(f"packed chunk {sp} exceeds the fixed caps "
                          f"({st['max_nodes']}>{self.max_nodes} or "
                          f"{st['max_degree']}>{self.max_degree}); skipped")
                    self._seen.add(sp)
                    continue
                self._chunks.append((
                    np.load(os.path.join(d, f"edges_{j}.npy"), mmap_mode="r"),
                    np.load(os.path.join(d, f"eoff_{j}.npy")),
                    np.load(os.path.join(d, f"labels_{j}.npy"), mmap_mode="r"),
                    np.load(os.path.join(d, f"noff_{j}.npy")),
                    st["n"],
                ))
                self._seen.add(sp)
                self._stat_nodes = max(self._stat_nodes, st["max_nodes"])
                self._stat_deg = max(self._stat_deg, st["max_degree"])
                new += 1
        if new:
            self._starts = np.cumsum([0] + [c[4] for c in self._chunks])
        return new

    def refresh(self) -> int:
        """Rescan the pack dirs for chunks written since construction —
        lets an epoch loop train on a still-growing labeled set (the
        ``batches`` generator re-reads ``len(self)`` every epoch)."""
        n = self._scan()
        if n:
            print(f"packed dataset refresh: +{n} chunks -> {len(self)} "
                  "graphs")
        return n

    def __len__(self) -> int:
        return int(self._starts[-1])

    def get(self, idx: int) -> dict:
        c = int(np.searchsorted(self._starts, idx, side="right")) - 1
        loc = idx - int(self._starts[c])
        edges, eoff, labels, noff, _ = self._chunks[c]
        e = np.asarray(edges[eoff[loc]:eoff[loc + 1]], np.int64)
        lab = np.asarray(labels[noff[loc]:noff[loc + 1]], np.int64)
        n = len(lab)
        bidir = np.concatenate([e, e[:, ::-1]], axis=0)
        self_loop = np.arange(n).reshape(-1, 1).repeat(2, axis=1)
        coo = np.concatenate([bidir, self_loop], axis=0).T
        return _pad_example(n, lab, coo, self.max_nodes, self.max_degree)

    def batches(self, batch_size, shuffle=True, seed=0, drop_last=True,
                epochs: Optional[int] = 1) -> Iterator[dict]:
        """MISDataset.batches plus an optional per-epoch ``refresh()`` so a
        growing pack dir (labeling pipeline still running) feeds later
        epochs; the epoch's index order is drawn AFTER the refresh."""
        rng = np.random.default_rng(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            if self.auto_refresh and epoch > 0:
                self.refresh()
            order = np.arange(len(self))
            if shuffle:
                rng.shuffle(order)
            limit = ((len(self) // batch_size) * batch_size
                     if drop_last else len(self))
            for s in range(0, limit, batch_size):
                idxs = order[s:s + batch_size]
                if drop_last and len(idxs) < batch_size:
                    continue
                examples = [self.get(int(i)) for i in idxs]
                yield {
                    k: np.stack([ex[k] for ex in examples])
                    for k in examples[0]
                }
            epoch += 1
