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
        nbrs, mask = graph_to_fixed_degree(edges, n, self.max_degree)
        V = self.max_nodes
        out_labels = np.zeros(V, np.float32)
        out_labels[:n] = labels
        out_nbrs = np.zeros((V, self.max_degree), np.int32)
        out_nbrs[:n] = nbrs
        out_mask = np.zeros((V, self.max_degree), np.float32)
        out_mask[:n] = mask
        node_mask = np.zeros(V, np.float32)
        node_mask[:n] = 1.0
        ex = {
            "labels": out_labels,
            "neighbors": out_nbrs,
            "mask": out_mask,
            "node_mask": node_mask,
            "num_nodes": np.int32(n),
        }
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
