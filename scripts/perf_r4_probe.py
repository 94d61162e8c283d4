"""Round-4 perf probes on the real chip (run while deciding the training
config; results inform scripts/train_er700800_v3.sh and the sparse-MFU work):

  1. MIS ER-[700-800] training-step throughput vs batch size (4/8/16/32),
     with and without activation checkpointing — picks the batch size for
     the round's big training run.
  2. Sparse TSP-500 sampler throughput vs parallel_sampling S (4/8/16/32)
     — VERDICT r3 weak #2 says S=4 starves the MXU; quantify the S sweep.
  3. AOT feasibility: can a lowered+compiled executable be serialized and
     reloaded on this backend (the persistent compile cache never hits over
     the remote tunnel)? Answers whether jax.export can reclaim the ~270 s
     per-round recompile burn (VERDICT r3 item 6).

Writes /tmp/perf_r4_probe.json and prints one line per result.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = {}


def probe_mis_train():
    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.tasks.mis import MISTask
    from difusco_tpu.train.trainer import Trainer, make_optimizer

    rng = np.random.default_rng(0)
    V, K = 800, 168
    for remat in (True, False):
        for B in (4, 8, 16, 32):
            cfg = Config(
                task="mis", diffusion_type="gaussian",
                diffusion_schedule="linear", diffusion_steps=1000,
                n_layers=12, hidden_dim=256, batch_size=B,
                learning_rate=2e-4, bf16=True,
                use_activation_checkpoint=remat,
            )
            task = MISTask(cfg)
            nbrs = rng.integers(0, V, (B, V, K)).astype(np.int32)
            mask = (rng.random((B, V, K)) < 0.9).astype(np.float32)
            labels = (rng.random((B, V)) < 0.05).astype(np.float32)
            batch = {"labels": labels, "neighbors": nbrs, "mask": mask,
                     "node_mask": np.ones((B, V), np.float32)}
            try:
                params = task.init_params(jax.random.PRNGKey(0), batch)
                opt = make_optimizer(cfg, 1000)
                step = Trainer(task, cfg)._build_step(opt)
                opt_state = opt.init(params)
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                key = jax.random.PRNGKey(1)
                t0 = time.perf_counter()
                params, opt_state, loss = step(params, opt_state, jb, key)
                loss.block_until_ready()
                compile_s = time.perf_counter() - t0
                n = 6
                t0 = time.perf_counter()
                for i in range(n):
                    params, opt_state, loss = step(
                        params, opt_state, jb, jax.random.fold_in(key, i))
                loss.block_until_ready()
                dt = (time.perf_counter() - t0) / n
                # with the host->device batch upload in the loop (the real
                # training path re-uploads every step over the tunnel)
                t0 = time.perf_counter()
                for i in range(n):
                    jb2 = {k: jnp.asarray(v) for k, v in batch.items()}
                    params, opt_state, loss = step(
                        params, opt_state, jb2, jax.random.fold_in(key, 50 + i))
                loss.block_until_ready()
                dt_up = (time.perf_counter() - t0) / n
                OUT[f"mis_train_B{B}_remat{int(remat)}"] = {
                    "step_s": round(dt, 4),
                    "step_s_with_upload": round(dt_up, 4),
                    "graphs_per_s": round(B / dt_up, 2),
                    "compile_s": round(compile_s, 1),
                }
            except Exception as e:
                OUT[f"mis_train_B{B}_remat{int(remat)}"] = {
                    "error": f"{type(e).__name__}: {e}"[:200]}
            print(f"mis_train B={B} remat={remat}: "
                  f"{OUT[f'mis_train_B{B}_remat{int(remat)}']}", flush=True)


def probe_sparse_sweep():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    for S in (4, 8, 16, 32):
        r = bench.bench_sparse_throughput(S=S, n_iters=2, both_kernels=False)
        OUT[f"tsp500_sparse_S{S}"] = r
        print(f"tsp500 sparse S={S}: {r}", flush=True)


def probe_aot():
    import jax
    import jax.numpy as jnp

    def f(x):
        return jnp.sin(x @ x.T).sum()

    x = jnp.ones((256, 256))
    res = {}
    try:
        lowered = jax.jit(f).lower(x)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        res["compile_s"] = round(time.perf_counter() - t0, 2)
        try:
            from jax.experimental import serialize_executable

            t0 = time.perf_counter()
            blob = serialize_executable.serialize(compiled)
            res["serialize_ok"] = True
            res["serialize_s"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            reloaded = serialize_executable.deserialize_and_load(
                blob[0] if isinstance(blob, tuple) else blob,
                *(blob[1:] if isinstance(blob, tuple) else ()))
            res["deserialize_s"] = round(time.perf_counter() - t0, 2)
            res["reload_call_ok"] = bool(
                jnp.isfinite(reloaded(x)).all())
        except Exception as e:
            res["serialize_error"] = f"{type(e).__name__}: {e}"[:300]
    except Exception as e:
        res["error"] = f"{type(e).__name__}: {e}"[:300]
    OUT["aot"] = res
    print(f"aot: {res}", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "aot"):
        probe_aot()
    if which in ("all", "mis"):
        probe_mis_train()
    if which in ("all", "sparse"):
        probe_sparse_sweep()
    with open("/tmp/perf_r4_probe.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
