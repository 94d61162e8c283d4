"""TSP tour rasterization / image dataset.

Capability parity with reference ``TSPImageDataset``
(difusco/co_datasets/tsp_image_dataset.py): render instances as images —
points as dots, tour (or heatmap) edges as line segments — used for the
diffusion-process visualizations (the repo's demo GIFs). Not consumed by
training; provided for the same demo/visualization workflows.
"""

from __future__ import annotations

import numpy as np

from difusco_tpu.data.tsp import TSPDataset


def rasterize_instance(
    points: np.ndarray,
    edges: np.ndarray,
    img_size: int = 64,
    point_radius: int = 1,
    line_value: float = 0.5,
) -> np.ndarray:
    """Render points + weighted edges to a (img_size, img_size) float image.

    Args:
      points: (V, 2) in [0, 1].
      edges: (V, V) edge weights in [0, 1] (e.g. tour adjacency or heatmap).
    """
    img = np.zeros((img_size, img_size), np.float32)
    px = np.clip((points * (img_size - 1)).astype(int), 0, img_size - 1)

    def draw_line(a, b, w):
        n = int(np.hypot(*(px[b] - px[a]))) + 1
        ts = np.linspace(0, 1, n)
        xs = np.clip((px[a][0] + ts * (px[b][0] - px[a][0])).astype(int), 0, img_size - 1)
        ys = np.clip((px[a][1] + ts * (px[b][1] - px[a][1])).astype(int), 0, img_size - 1)
        img[ys, xs] = np.maximum(img[ys, xs], w * line_value)

    ii, jj = np.nonzero(edges > 1e-3)
    for a, b in zip(ii, jj):
        draw_line(a, b, float(edges[a, b]))

    for x, y in px:
        y0, y1 = max(y - point_radius, 0), min(y + point_radius + 1, img_size)
        x0, x1 = max(x - point_radius, 0), min(x + point_radius + 1, img_size)
        img[y0:y1, x0:x1] = 1.0
    return img


class TSPImageDataset:
    """Image view over a TSP text dataset (tour adjacency rendered)."""

    def __init__(self, path: str, img_size: int = 64):
        self.ds = TSPDataset(path)
        self.img_size = img_size

    def __len__(self) -> int:
        return len(self.ds)

    def get(self, idx: int) -> dict:
        ex = self.ds.get(idx)
        img = rasterize_instance(ex["points"], ex["adj"] + ex["adj"].T, self.img_size)
        return {"image": img, **ex}


def render_denoising_trajectory(points, heatmaps, img_size: int = 64):
    """Render a sequence of heatmaps (T, V, V) -> (T, img, img) frames,
    the data behind the reference's demo GIFs."""
    return np.stack(
        [rasterize_instance(points, np.asarray(h), img_size) for h in heatmaps]
    )
