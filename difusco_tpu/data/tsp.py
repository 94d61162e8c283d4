"""TSP dataset: the reference's text format, batched to fixed shapes.

Capability parity with reference ``TSPGraphDataset``
(difusco/co_datasets/tsp_graph_dataset.py): lines of
``x1 y1 x2 y2 ... output t1 t2 ... t1`` with a 1-indexed closed tour.
Dense mode yields the directed tour adjacency; sparse mode yields a kNN graph
(self included, ascending distance — the KDTree convention) with edge labels
marking tour successor edges.

TPU-native redesign: instead of PyG disjoint-graph batching with edge-index
offset bookkeeping (pl_meta_model.py:177-184), graphs use the fixed-degree
(V, K) neighbor layout so a batch is a plain leading dimension. All arrays
are NumPy on the host; the training loop moves full batches to device.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import numpy as np

from difusco_tpu.ops.knn import knn_graph_numpy


def parse_tsp_line(line: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse one instance line -> (points (V, 2) float64, tour (V+1,) int32
    0-indexed closed)."""
    pts_str, tour_str = line.strip().split(" output ")
    points = np.array(pts_str.split(), dtype=np.float64).reshape(-1, 2)
    tour = np.array(tour_str.split(), dtype=np.int64).astype(np.int32) - 1
    return points, tour


def write_tsp_file(path: str, instances) -> None:
    """Write instances [(points, closed 0-indexed tour)] in the reference
    text format (1-indexed tours, first node repeated at the end)."""
    with open(path, "w") as f:
        for points, tour in instances:
            pts = " ".join(f"{x} {y}" for x, y in np.asarray(points))
            tr = " ".join(str(int(t) + 1) for t in np.asarray(tour))
            f.write(f"{pts} output {tr}\n")


def tour_adjacency(tour: np.ndarray, V: int) -> np.ndarray:
    """Directed 0/1 successor adjacency from a closed tour
    (tsp_graph_dataset.py:42-44)."""
    adj = np.zeros((V, V), np.float32)
    adj[tour[:-1], tour[1:]] = 1.0
    return adj


def tour_successors(tour: np.ndarray, V: int) -> np.ndarray:
    """succ[i] = node after i in the tour direction (tsp_graph_dataset.py:64-65)."""
    succ = np.zeros(V, np.int32)
    succ[tour[:-1]] = tour[1:]
    return succ


@dataclasses.dataclass
class TSPDataset:
    """In-memory TSP dataset over the reference text format.

    Args:
      path: text file, one instance per line (uniform V per file).
      sparse_factor: kNN degree K; <= 0 for dense.
    """

    path: str
    sparse_factor: int = -1

    def __post_init__(self):
        with open(self.path) as f:
            self.lines = f.read().splitlines()
        if not self.lines:
            raise ValueError(f"empty dataset {self.path!r}")
        points, tour = parse_tsp_line(self.lines[0])
        self.num_nodes = points.shape[0]

    def __len__(self) -> int:
        return len(self.lines)

    def get(self, idx: int):
        """One example.

        dense -> dict(points (V,2) f32, adj (V,V) f32, tour (V+1,) i32)
        sparse -> dict(points, neighbors (V,K) i32, edge_labels (V,K) f32,
                       tour)
        """
        points, tour = parse_tsp_line(self.lines[idx])
        V = points.shape[0]
        out = {"points": points.astype(np.float32), "tour": tour}
        if self.sparse_factor <= 0:
            out["adj"] = tour_adjacency(tour, V)
        else:
            nbrs = knn_graph_numpy(points, self.sparse_factor)
            succ = tour_successors(tour, V)
            out["neighbors"] = nbrs
            out["edge_labels"] = (nbrs == succ[:, None]).astype(np.float32)
        return out

    def batches(
        self,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        epochs: Optional[int] = 1,
    ) -> Iterator[dict]:
        """Yield stacked batches as dicts of numpy arrays."""
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
