"""MCTS decode pipeline: heatmap sparsification + native solver driver.

Capability parity with the reference's offline MCTS path
(tsp_mcts/convert_numpy_to_txt.py:14-73 + solve-*.sh): add a distance prior
0.01*(1 - d), keep the top-quantile of entries union each node's top-3
edges, bump kept entries by 1e-2, symmetrize A + A^T, row-normalize, write
the text heatmap, then run the C++ solver (one thread per instance instead
of shell-level process fan-out).

For TSP-10000 the reference first merges+2-opts the heatmap and feeds the
resulting tour edges (convert_numpy_with_2opt.py:55-112); that variant is
``tour_edges_heatmap``.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_MCTS_BIN = os.path.join(_REPO_ROOT, "native", "build", "tsp_mcts")


def sparsify_heatmap(
    heat: np.ndarray, points: np.ndarray, expected_valid_prob: float = 0.02
) -> np.ndarray:
    """Distance-prior + top-quantile/top-3 sparsify + row-normalize
    (convert_numpy_to_txt.py:20-48)."""
    n = heat.shape[0]
    dists = np.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
    a = heat + 0.01 * (1.0 - dists)
    a[~np.isfinite(a)] = 0.0

    k = max(int(n * n * expected_valid_prob), 1)
    valid = np.sort(a[a > 0.0])
    thresh = valid[-k] if len(valid) >= k else 0.0
    top3 = np.argsort(a, axis=1)[:, -3:]
    mask = a > thresh
    mask[np.arange(n)[:, None], top3] = True
    a = a * mask
    a[a != 0.0] += 1e-2
    a = a + a.T
    a = a / a.sum(axis=1, keepdims=True)
    return a


def tour_edges_heatmap(tours: np.ndarray, n: int) -> np.ndarray:
    """Heatmap from decoded tour edges (the TSP-10000 variant,
    convert_numpy_with_2opt.py:85-95): 1.0 on each traversed edge."""
    a = np.zeros((n, n))
    for tour in np.atleast_2d(tours):
        a[tour[:-1], tour[1:]] = 1.0
    return a


def convert_with_2opt(
    heat: np.ndarray,
    points: np.ndarray,
    two_opt_iterations: int = 5000,
) -> np.ndarray:
    """The TSP-10000 converter variant (convert_numpy_with_2opt.py:55-112):
    merge + 2-opt the raw heatmap first and emit the resulting tour edges as
    the MCTS heatmap. Runs the decode on device."""
    import jax.numpy as jnp

    from difusco_tpu.ops.merge import merge_heatmap_device
    from difusco_tpu.ops.two_opt import batched_two_opt

    jpts = jnp.asarray(points, jnp.float32)
    tours, _ = merge_heatmap_device(jpts, jnp.asarray(heat, jnp.float32)[None])
    tours, _ = batched_two_opt(jpts, tours, two_opt_iterations)
    tour = np.asarray(tours)[0]
    assert tour[0] == tour[-1] and len(set(tour[:-1].tolist())) == heat.shape[0]
    return tour_edges_heatmap(tour[None], heat.shape[0])


def sparsify_heatmap_large(
    heat: np.ndarray, points: np.ndarray, expected_valid_prob: float = 0.01
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Memory-lean sparsify for V>=1000: identical selection rule to
    ``sparsify_heatmap`` (convert_numpy_to_txt.py:20-48) but float32,
    chunked distance computation, partition-based threshold/top-3 instead
    of full sorts, and a COO (rows, cols, vals) return so a V=10000
    heatmap never has to round-trip through an 860 MB dense text file."""
    n = heat.shape[0]
    pts = points.astype(np.float32)
    a = np.empty((n, n), np.float32)
    chunk = max(1, (1 << 24) // n)
    for s in range(0, n, chunk):
        d = np.sqrt(
            ((pts[s : s + chunk, None, :] - pts[None, :, :]) ** 2).sum(-1)
        )
        a[s : s + chunk] = heat[s : s + chunk] + 0.01 * (1.0 - d)
    np.nan_to_num(a, copy=False, posinf=0.0, neginf=0.0)

    k = max(int(n * n * expected_valid_prob), 1)
    flat = a.reshape(-1)
    pos = flat[flat > 0.0]
    if len(pos) >= k:
        thresh = np.partition(pos, len(pos) - k)[len(pos) - k]
    else:
        thresh = 0.0
    top3 = np.argpartition(a, n - 3, axis=1)[:, -3:]
    mask = a > thresh
    mask[np.arange(n)[:, None], top3] = True
    a *= mask
    a[a != 0.0] += 1e-2
    # symmetrize + row-normalize without a second dense temp
    at = a.T.copy()
    a += at
    del at
    a /= a.sum(axis=1, keepdims=True)
    rows, cols = np.nonzero(a)
    return rows, cols, a[rows, cols]


def write_heatmap_txt(path: str, heat: np.ndarray) -> None:
    n = heat.shape[0]
    with open(path, "w") as f:
        f.write(f"{n}\n")
        for row in heat:
            f.write(" ".join(f"{x:.6f}" for x in row) + "\n")


def write_heatmap_sparse_txt(
    path: str, n: int, rows: np.ndarray, cols: np.ndarray, vals: np.ndarray
) -> None:
    """COO heatmap in the solver's SPARSE format (native/mcts/tsp_mcts.cpp
    read_heatmap): "SPARSE n nnz" then nnz "i j v" lines."""
    with open(path, "w") as f:
        f.write(f"SPARSE {n} {len(rows)}\n")
        lines = [
            f"{i} {j} {v:.8f}" for i, j, v in zip(rows, cols, vals)
        ]
        f.write("\n".join(lines))
        if lines:
            f.write("\n")


def run_mcts(
    instances_path: str,
    heatmap_pattern: str,
    output_path: str,
    time_per_city: float = 0.10,
    threads: int = 0,
    extra_args: Sequence[str] = (),
    tours_path: Optional[str] = None,
) -> dict:
    """Invoke the native solver; returns the parsed stats dict."""
    if not os.path.exists(_MCTS_BIN):
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native"), "build/tsp_mcts"],
            check=True,
            capture_output=True,
        )
    cmd = [
        _MCTS_BIN,
        "--instances", instances_path,
        "--heatmaps", heatmap_pattern,
        "--output", output_path,
        "--time", str(time_per_city),
    ]
    if threads:
        cmd += ["--threads", str(threads)]
    if tours_path:
        cmd += ["--tours", tours_path]
    cmd += list(extra_args)
    subprocess.run(cmd, check=True)
    stats = {}
    with open(output_path) as f:
        for line in f:
            k, v = line.split()
            stats[k] = float(v)
    return stats
