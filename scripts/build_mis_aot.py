"""Pre-build the MIS ER-[700-800] bench sampler/decoder AOT blobs.

The V=800 gaussian sampler is the most expensive compile in the whole bench
and the remote compile RPC has been observed to HANG indefinitely (r5, mid-
training) — a wedge inside the driver-run bench would silently eat the
round's #1 metric and every section after it. Building the executables here
(once, on the chip) means bench_mis only deserializes.

Blob names must match bench.bench_mis exactly: it builds the same Config
and the same aot_load_or_compile tags, so running bench_mis IS the build.
Parity: the AOT path's greedy ratios are checked against the pure-jit
evaluate_instance path on the same instances (MIS_AOT_PARITY=0 to skip;
each check re-pays the compile through the jit cache).

Usage: python scripts/build_mis_aot.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import bench_mis  # noqa: E402

CONFIGS = [
    # (ckpt_name, data_dir, hidden_dim, diffusion_type)
    ("mis_er700800_gaussian", "mis_er700800_test", 256, "gaussian"),
]


def main():
    for ckpt, data_dir, hidden, dtype in CONFIGS:
        t0 = time.time()
        os.environ["BENCH_AOT"] = "1"
        # ls_rounds/ls_replicas must match the bench defaults
        # (BENCH_ER700800_ILS=512 x 2): statics are baked into the blob
        # name. The LS compile alone measured 5+ min in-bench (r5).
        r = bench_mis(n_instances=2, ckpt_name=ckpt, data_dir=data_dir,
                      hidden_dim=hidden, diffusion_type=dtype,
                      ls_rounds=512, ls_replicas=2)
        t1 = time.time()
        if r is None:
            print(f"{ckpt}: missing checkpoint or split; skipped")
            continue
        print(f"{ckpt}: built in {t1 - t0:.0f}s; greedy ratio (n=2) "
              f"{r[0]:.4f}", flush=True)
        if os.environ.get("MIS_AOT_PARITY", "1") == "1":
            os.environ["BENCH_AOT"] = "0"
            rj = bench_mis(n_instances=2, ckpt_name=ckpt, data_dir=data_dir,
                           hidden_dim=hidden, diffusion_type=dtype)
            os.environ["BENCH_AOT"] = "1"
            d = abs(r[0] - rj[0])
            print(f"{ckpt}: parity aot-vs-jit greedy ratio diff {d:.2e}")
            assert d < 1e-4, (r[0], rj[0])


if __name__ == "__main__":
    main()
