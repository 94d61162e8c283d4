"""Offline model selection for the ER-[700-800] published checkpoint.

DIFUSCO_SAVE_ONLY training saves top-k-by-step (no val metric — the V=800
val-sampler compile RPC has wedged mid-run, see PARITY round-5 notes), so
selection happens here on the real test metric: each candidate step is
swapped into checkpoints/mis_er700800_gaussian (the name the pre-built AOT
sampler blob is keyed to, bench.bench_mis) and scored greedy-decode on the
first N test graphs. The best candidate is left installed only if it beats
the incumbent; otherwise the incumbent is restored from git.

Usage: python scripts/select_er700800_ckpt.py --run models/<name>/run \
           [--steps 3200,2400] [--n 32]
"""

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PUB = os.path.join(REPO, "checkpoints", "mis_er700800_gaussian")


def install(step_dir: str):
    dst = os.path.join(PUB, "default")
    shutil.rmtree(dst)
    shutil.copytree(os.path.join(step_dir, "default"), dst)


def score(n: int):
    from bench import bench_mis

    r = bench_mis(n_instances=n, ckpt_name="mis_er700800_gaussian",
                  data_dir="mis_er700800_test", hidden_dim=256,
                  diffusion_type="gaussian")
    assert r is not None
    return r[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--steps", default="")
    ap.add_argument("--n", type=int, default=32)
    args = ap.parse_args()
    os.environ.setdefault("BENCH_AOT", "1")

    best_dir = os.path.join(REPO, args.run, "checkpoints", "best")
    steps = ([s.strip() for s in args.steps.split(",") if s.strip()]
             or sorted(os.listdir(best_dir), key=int, reverse=True))

    incumbent = score(args.n)
    print(f"incumbent (published): greedy ratio {incumbent:.4f} "
          f"(n={args.n})", flush=True)
    results = {"incumbent": incumbent}
    best_step, best_ratio = None, incumbent
    for s in steps:
        install(os.path.join(best_dir, s))
        r = score(args.n)
        results[s] = r
        print(f"step {s}: greedy ratio {r:.4f}", flush=True)
        if r > best_ratio:
            best_step, best_ratio = s, r

    if best_step is None:
        print("no candidate beat the incumbent; restoring it from git")
        subprocess.run(["git", "checkout", "--",
                        os.path.relpath(PUB, REPO)], cwd=REPO, check=True)
    else:
        install(os.path.join(best_dir, best_step))
        print(f"installed step {best_step} (greedy {best_ratio:.4f} vs "
              f"incumbent {incumbent:.4f})")
    print(results)


if __name__ == "__main__":
    main()
