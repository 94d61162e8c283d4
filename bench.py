"""Benchmark harness: flagship diffusion sampling throughput on one chip.

Prints a cumulative JSON result line after EVERY section, so the LAST line
of stdout is always a complete, parseable result no matter where the driver
budget runs out (VERDICT r2: round 2's single-line-at-the-end design lost
the whole round to rc=124). Sections run cheapest-first under a global
deadline (env ``BENCH_DEADLINE_S``, default 1020 s); a section that would
not fit in the remaining time is skipped and recorded in
``detail.sections_skipped``.

Headline metric: diffusion samples/sec/chip on the flagship config
(TSP-50 dense, categorical, 12x256 GatedGCN, 50 cosine inference steps,
full on-device denoise scan) — one "sample" = one complete 50-step denoised
heatmap. ``vs_baseline`` is measured against a conservative 20 samples/s
reference-design estimate (the reference repo publishes no numbers,
BASELINE.json "published": {}).

In-bench gap sections evaluate a recorded number of instances (``*_n``
in detail) sized to fit the budget; full-split numbers are committed
artifacts refreshed by the offline scripts (scripts/compute_hk_bounds.py,
scripts/run_mcts_protocol.py). Frozen-canary gaps (``frozen_*``) are free
derivatives: the frozen splits share instance points with the live splits
(data/frozen/README.md), so the same solved costs are re-scored against the
never-refined frozen labels — the unbiased cross-round trend line.
"""

import json
import os
import time

import numpy as np

_CKPT_CACHE = {}


def _restore_ckpt(ckpt_name):
    """Restore a checkpoint once per process (several sections share the
    tsp1000 checkpoint; orbax restore on this 2-core host is seconds)."""
    if ckpt_name not in _CKPT_CACHE:
        import orbax.checkpoint as ocp

        ckpt_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "checkpoints", ckpt_name
        )
        if not os.path.isdir(ckpt_dir):
            return None
        from difusco_tpu.train.checkpoint import as_variables

        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(os.path.join(ckpt_dir, "default"))
        _CKPT_CACHE[ckpt_name] = as_variables(state)
    return _CKPT_CACHE[ckpt_name]


def dense_gnn_flops_per_forward(V, H, n_layers, out_channels=2,
                                binary_embed=True):
    """Analytic FLOPs of one dense GatedGCN forward (one denoise step of one
    sample). Counts matmul FLOPs (2*m*n*k): per layer 4 node linears (V,H)x
    (H,H), the edge linear C and the per-layer out projection (V^2,H)x(H,H);
    plus embeddings and the output head. Elementwise work is excluded
    (matmul-dominated model), so reported MFU is slightly conservative^*.

    ``binary_embed=True`` (the categorical sampling path since r3): the edge
    embedding is a 2-row table select, so its (V^2,H)x(H,H) matmul does NOT
    execute and is excluded — counting it would inflate MFU.

    ^* conservative for the utilization claim: true executed FLOPs >= model.
    """
    per_layer = 2 * H * H * (4 * V + 2 * V * V)
    embed = 2 * H * H * (V if binary_embed else V + V * V)
    head = 2 * V * V * H * out_channels
    time_mlp = 2 * (H * (H // 2) + (H // 2) * (H // 2))
    return n_layers * per_layer + embed + head + time_mlp


def sparse_gnn_flops_per_forward(V, K, H, n_layers, out_channels=2,
                                 binary_embed=True):
    """Analytic matmul FLOPs of one fixed-degree sparse forward: per layer
    4 node linears (V,H)x(H,H) + edge linear and out projection on (V*K,H).
    ``binary_embed``: see dense_gnn_flops_per_forward."""
    per_layer = 2 * H * H * (4 * V + 2 * V * K)
    embed = 2 * H * H * (V if binary_embed else V + V * K)
    head = 2 * V * K * H * out_channels
    return n_layers * per_layer + embed + head


def tpu_peak_bf16_flops():
    """Peak bf16 FLOP/s of the attached chip (for MFU). v5e (v5 lite):
    197 TFLOP/s bf16; v4: 275; v5p: 459. Unknown kinds return None."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v4" in kind:
        return 275e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    return None


def bench_sampling(n_warmup=1, n_iters=5, V=50, S=32, steps=50):
    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.tasks.tsp import TSPTask

    cfg = Config(
        task="tsp",
        diffusion_type="categorical",
        diffusion_schedule="cosine",
        diffusion_steps=1000,
        inference_diffusion_steps=steps,
        inference_schedule="cosine",
        n_layers=12,
        hidden_dim=256,
        bf16=True,  # mixed precision: bf16 matmuls, fp32 norms
    )
    task = TSPTask(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.random((V, 2)), jnp.float32)
    batch = {
        "points": np.asarray(pts)[None].repeat(2, 0),
        "adj": np.zeros((2, V, V), np.float32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)

    key = jax.random.PRNGKey(1)
    # AOT path: load a pre-serialized executable (data/aot/, generated by
    # scripts/bench_mega.py) instead of re-paying the ~4-min compile the
    # remote backend charges every process (VERDICT r3 item 6). Fallback to
    # the plain jit on any mismatch.
    sample = lambda p, x, k: task.sample(p, x, k, S)
    if os.environ.get("BENCH_AOT", "1") != "0":
        try:
            from difusco_tpu.utils.aot_cache import aot_load_or_compile

            compiled = aot_load_or_compile(
                task.sample, "flagship_dense_V50_S32", (params, pts, key, S))
            compiled(params, pts, key)  # smoke the calling convention
            sample = compiled
        except Exception as e:
            print(f"bench aot fallback ({type(e).__name__}: {e})")
    heat = sample(params, pts, key)
    heat.block_until_ready()  # compile or AOT load
    for _ in range(n_warmup):
        heat = sample(params, pts, key)
        heat.block_until_ready()

    t0 = time.perf_counter()
    for i in range(n_iters):
        heat = sample(params, pts, jax.random.fold_in(key, i))
        heat.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    samples_per_sec = S / dt
    denoise_steps_per_sec = S * steps / dt
    flops_per_fwd = dense_gnn_flops_per_forward(V, 256, 12)
    peak = tpu_peak_bf16_flops()
    mfu = (denoise_steps_per_sec * flops_per_fwd / peak) if peak else None
    return samples_per_sec, denoise_steps_per_sec, dt, mfu


def _hk_bounds_for(test_file):
    """Load the committed Held-Karp lower bounds for a split, if present
    (data/hk_lb/<stem>_hk.json, produced by scripts/compute_hk_bounds.py)."""
    stem = os.path.splitext(os.path.basename(test_file))[0]
    path = os.path.join(os.path.dirname(__file__), "data", "hk_lb",
                        f"{stem}_hk.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)["lb"]


def _gap_summary(costs, gt_costs, hk_lbs):
    """Mean gap vs labels and (when bounds exist) vs the certified HK lower
    bound — the latter is an upper bound on the true optimality gap that
    label refinement cannot bias (VERDICT r1 item 1)."""
    costs = np.asarray(costs, np.float64)
    gt = np.asarray(gt_costs, np.float64)
    out = {"gap": float(np.mean((costs - gt) / gt)), "n": int(len(costs)),
           "costs": [float(c) for c in costs]}
    if hk_lbs is not None:
        # partial bound files carry None for not-yet-computed instances
        lb = np.asarray(
            [hk_lbs[i] if i < len(hk_lbs) and hk_lbs[i] is not None
             else np.nan for i in range(len(costs))],
            np.float64,
        )
        ok = np.isfinite(lb) & (lb > 0)
        if ok.any():
            out["gap_vs_hk_lb"] = float(np.mean((costs[ok] - lb[ok]) / lb[ok]))
            out["hk_label_slack"] = float(np.mean((gt[ok] - lb[ok]) / lb[ok]))
            out["hk_n"] = int(ok.sum())
    return out


def _frozen_gap(live_test_file, frozen_name, costs):
    """Re-score solved costs against the never-refined frozen labels.

    The frozen splits share instance POINTS with the live splits (only the
    labels differ, data/frozen/README.md), so the costs computed in the live
    gap section apply verbatim; this just swaps the denominator. Point
    identity is verified per instance; any instance whose points diverged
    is dropped from the gap rather than silently mismatched."""
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.ops.two_opt import tour_cost
    import jax.numpy as jnp

    frozen_file = os.path.join(os.path.dirname(__file__), "data", "frozen",
                               frozen_name)
    if not os.path.exists(frozen_file) or not costs:
        return None
    fds = TSPDataset(frozen_file)
    lds = TSPDataset(os.path.join(os.path.dirname(__file__),
                                  *live_test_file.split("/")))
    n = min(len(costs), len(fds))
    kept_costs, gts = [], []
    for i in range(n):
        ex = fds.get(i)
        if not np.allclose(ex["points"], lds.get(i)["points"]):
            continue  # points diverged; this instance's cost is for other pts
        kept_costs.append(costs[i])
        gts.append(float(tour_cost(jnp.asarray(ex["points"]),
                                   jnp.asarray(ex["tour"]))))
    if not kept_costs:
        return None
    c = np.asarray(kept_costs, np.float64)
    g = np.asarray(gts, np.float64)
    return {"gap": float(np.mean((c - g) / g)), "n": len(kept_costs)}


def bench_gap(n_instances=64, ckpt="tsp50_categorical_v3",
              diffusion_type="categorical",
              test_rel="data/tsp50/tsp50_test.txt", deadline_ts=None,
              parallel_sampling=4):
    """Solved-gap benchmark on a committed dense-TSP checkpoint + test split.

    Gap is measured against the split's label tours (best-known, refined
    keep-if-better by this framework's own decode stack — see README caveat)
    AND against the certified Held-Karp lower bound when committed.
    Returns None if the artifacts are missing; respects ``deadline_ts``
    (stops early, reporting the instances actually measured)."""
    test_file = os.path.join(os.path.dirname(__file__), *test_rel.split("/"))
    params = _restore_ckpt(ckpt)
    if params is None or not os.path.exists(test_file):
        return None

    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.tasks.tsp import TSPTask

    gaussian = diffusion_type == "gaussian"
    cfg = Config(
        task="tsp", diffusion_type=diffusion_type,
        diffusion_schedule="linear" if gaussian else "cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine",
        inference_trick="ddim" if gaussian else None,
        n_layers=12, hidden_dim=256,
        parallel_sampling=parallel_sampling, two_opt_iterations=1000,
        bf16=True,
    )
    task = TSPTask(cfg)
    ds = TSPDataset(test_file)
    costs, gts = [], []
    key = jax.random.PRNGKey(0)

    # AOT path (VERDICT r3 item 6): the dense splits have uniform V, so one
    # pre-serialized sample + decode executable pair (data/aot/, built by
    # scripts/build_gap_aot.py) covers the whole split — the remote backend
    # otherwise re-pays a multi-minute compile per section per process,
    # which is what truncated tsp100 at 61/128 in r3. Exact evaluate_
    # instance semantics: same key folding, best-of-S over one sequential
    # sample (parity asserted by the builder script).
    sample_fn = decode_fn = None
    if os.environ.get("BENCH_AOT", "1") != "0":
        try:
            from difusco_tpu.utils.aot_cache import aot_load_or_compile

            V = ds.get(0)["points"].shape[0]
            S = parallel_sampling
            pts_s = jax.ShapeDtypeStruct((V, 2), jnp.float32)
            heat_s = jax.ShapeDtypeStruct((S, V, V), jnp.float32)
            # S must be IN THE NAME: it is a static (non-input) arg, so the
            # signature hash cannot distinguish S=4 from S=16 executables
            stag = "" if S == 4 else f"_S{S}"
            sample_fn = aot_load_or_compile(
                task.sample, f"gap_{ckpt}{stag}_sample",
                (params, pts_s, jax.random.PRNGKey(0), S))
            decode_fn = aot_load_or_compile(
                jax.jit(task.decode), f"gap_{ckpt}{stag}_decode",
                (pts_s, heat_s))
        except Exception as e:
            print(f"gap aot fallback ({type(e).__name__}: {e})")
            sample_fn = decode_fn = None

    from difusco_tpu.utils.tours import tour_cost_np

    for i in range(min(n_instances, len(ds))):
        ex = ds.get(i)
        if sample_fn is not None and decode_fn is not None:
            ki = jax.random.fold_in(jax.random.fold_in(key, i), 0)
            heat = sample_fn(params, jnp.asarray(ex["points"]), ki)
            _, cst, _ = decode_fn(jnp.asarray(ex["points"]), heat)
            m = {
                "solved_cost": float(jnp.min(cst)),
                "gt_cost": float(tour_cost_np(
                    np.asarray(ex["points"]), np.asarray(ex["tour"]))),
            }
        else:
            m = task.evaluate_instance(
                params, jnp.asarray(ex["points"]), jnp.asarray(ex["tour"]),
                jax.random.fold_in(key, i),
            )
        costs.append(float(m["solved_cost"]))
        gts.append(float(m["gt_cost"]))
        if deadline_ts and time.time() > deadline_ts:
            break
    return _gap_summary(costs, gts, _hk_bounds_for(test_file))


def bench_mis(n_instances=8, ckpt_name="mis_er_categorical",
              data_dir="mis_er_small_test", hidden_dim=128,
              diffusion_type="categorical", ls_rounds=0, ls_replicas=2,
              deadline_ts=None):
    """MIS solved/label set-size ratio on a committed checkpoint.

    Returns (greedy_ratio, ls_ratio_or_None, n_measured); ``ls_ratio`` is
    populated when ``ls_rounds`` > 0 (the on-device local-search decode,
    ops/mis_local_search.py)."""
    data_glob = os.path.join(os.path.dirname(__file__), "data",
                             data_dir, "*.gpickle*")
    import glob as g

    params = _restore_ckpt(ckpt_name)
    if params is None or not g.glob(data_glob):
        return None

    import jax

    from difusco_tpu.config import Config
    from difusco_tpu.data.mis import MISDataset
    from difusco_tpu.tasks.mis import MISTask

    gaussian = diffusion_type == "gaussian"
    cfg = Config(
        task="mis", diffusion_type=diffusion_type,
        diffusion_schedule="linear" if gaussian else "cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine",
        inference_trick="ddim" if gaussian else None,
        n_layers=12, hidden_dim=hidden_dim,
        parallel_sampling=4, bf16=True,
        mis_local_search_rounds=ls_rounds,
        mis_local_search_replicas=ls_replicas,
    )
    task = MISTask(cfg)
    ds = MISDataset(data_glob)
    ratios, ls_ratios = [], []
    key = jax.random.PRNGKey(0)

    # AOT path: all instances share one padded (max_nodes, max_degree)
    # shape, so one pre-serialized sampler executable (data/aot/, built by
    # scripts/build_mis_aot.py) replaces the in-bench compile. The V=800
    # sampler compile is the single most expensive compile in the whole
    # bench AND the remote compile RPC has been observed to hang
    # indefinitely (r5) — a wedged compile here would silently eat every
    # section after this one.
    sample_fn = decode_fn = None
    if os.environ.get("BENCH_AOT", "1") != "0":
        try:
            import jax.numpy as jnp

            from difusco_tpu.utils.aot_cache import aot_load_or_compile

            ex0 = ds.get(0)
            nbrs0 = jnp.asarray(ex0["neighbors"])
            mask0 = jnp.asarray(ex0["mask"])
            V, K = nbrs0.shape
            S = cfg.parallel_sampling
            tag = f"mis_{ckpt_name}_V{V}_K{K}_S{S}"
            sample_fn = aot_load_or_compile(
                task.sample, f"{tag}_sample",
                (params, nbrs0, mask0, jax.random.PRNGKey(0), S))
        except Exception as e:
            print(f"mis aot fallback ({type(e).__name__}: {e})")
            sample_fn = None

    if sample_fn is not None:
        import jax.numpy as jnp

        from difusco_tpu.utils.aot_cache import aot_load_or_compile

        ls_fn = None
        for i in range(min(n_instances, len(ds))):
            ex = ds.get(i)
            nbrs = jnp.asarray(ex["neighbors"])
            mask = jnp.asarray(ex["mask"])
            nm = jnp.asarray(ex["node_mask"])
            ki = jax.random.fold_in(key, i)
            heat = sample_fn(params, nbrs, mask, jax.random.fold_in(ki, 0))
            if decode_fn is None:
                # compile decode from the first real heat so its dtype/shape
                # always match the sampler output
                decode_fn = aot_load_or_compile(
                    jax.jit(task.decode), f"{tag}_decode",
                    (heat, nbrs, mask, nm))
            sols = decode_fn(heat, nbrs, mask, nm)
            gt = float(np.sum(ex["labels"] * ex["node_mask"]))
            ratios.append(float(jnp.max(jnp.sum(sols, -1))) / max(gt, 1.0))
            if ls_rounds > 0:
                # same refine as MISTask.evaluate_instance:185-204, one
                # shared AOT executable across instances (uniform padded
                # shapes; statics in the blob NAME). The 512-round LS
                # compile measured 5+ min in-bench — it ate the dense gap
                # sections' budget in the r5 validation run.
                if ls_fn is None:
                    from functools import partial

                    from difusco_tpu.ops.mis_local_search import (
                        mis_local_search_device,
                    )

                    @partial(jax.jit, static_argnames=("rounds", "reps"))
                    def _ls(sols, heats, nbrs, mask, nm, k, rounds, reps):
                        heats = jnp.repeat(heats, reps, axis=0)
                        sols_r = jnp.repeat(sols, reps, axis=0)
                        keys = jax.random.split(k, heats.shape[0])
                        ref = jax.vmap(
                            lambda x, p, kk: mis_local_search_device(
                                x, p, nbrs, mask, nm, kk, rounds=rounds)
                        )(sols_r, heats, keys)
                        return ref * nm[None, :].astype(ref.dtype)

                    ls_fn = aot_load_or_compile(
                        _ls, f"{tag}_ls{ls_rounds}x{ls_replicas}",
                        (sols, heat, nbrs, mask, nm,
                         jax.random.fold_in(ki, 10_007)),
                        kwargs={"rounds": ls_rounds, "reps": ls_replicas})

                refined = ls_fn(sols, heat, nbrs, mask, nm,
                                jax.random.fold_in(ki, 10_007))
                ls_ratios.append(
                    float(jnp.max(jnp.sum(refined, -1))) / max(gt, 1.0))
            if deadline_ts and time.time() > deadline_ts:
                break
    else:
        for i in range(min(n_instances, len(ds))):
            m = task.evaluate_instance(params, ds.get(i),
                                       jax.random.fold_in(key, i))
            ratios.append(m["solved_cost"] / max(m["gt_cost"], 1.0))
            if "solved_cost_ls" in m:
                ls_ratios.append(m["solved_cost_ls"] / max(m["gt_cost"], 1.0))
            if deadline_ts and time.time() > deadline_ts:
                break
    if ls_ratios:
        return float(np.mean(ratios)), float(np.mean(ls_ratios)), len(ratios)
    return float(np.mean(ratios)), None, len(ratios)


def bench_tsp_sparse(ckpt_name, test_rel, k, n_instances=128,
                     parallel_sampling=4, two_opt_iterations=1000,
                     deadline_ts=None):
    """Sparse TSP gap on a committed checkpoint + test split (None if the
    artifacts are missing). ``deadline_ts`` truncates the loop — the
    reported n is the actual count measured; full-split numbers live in
    committed artifacts (reproducing_scripts.md:254-311 for the reference
    eval configs)."""
    test_file = os.path.join(os.path.dirname(__file__), *test_rel.split("/"))
    params = _restore_ckpt(ckpt_name)
    if params is None or not os.path.exists(test_file):
        return None

    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.tasks.tsp import TSPTask

    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine", n_layers=12, hidden_dim=256,
        sparse_factor=k, parallel_sampling=parallel_sampling,
        two_opt_iterations=two_opt_iterations, bf16=True,
    )
    task = TSPTask(cfg)
    ds = TSPDataset(test_file, sparse_factor=k)
    costs, gts = [], []
    key = jax.random.PRNGKey(0)

    # AOT path (VERDICT r4 item 3): the sparse splits have uniform V too, so
    # a pre-serialized sample + decode pair (scripts/build_sparse_aot.py)
    # makes the live tsp10000 section fit the driver deadline (cold V=10000
    # compile alone is ~10 min). Exact evaluate_instance key semantics.
    sample_fn = decode_fn = None
    if os.environ.get("BENCH_AOT", "1") != "0":
        try:
            from difusco_tpu.utils.aot_cache import aot_load_or_compile

            ex0 = ds.get(0)
            V, K = ex0["neighbors"].shape
            pts_s = jax.ShapeDtypeStruct((V, 2), jnp.float32)
            nbr_s = jax.ShapeDtypeStruct((V, K), jnp.int32)
            heat_s = jax.ShapeDtypeStruct((parallel_sampling, V, K),
                                          jnp.float32)
            tag = f"sparse_{ckpt_name}_V{V}_k{k}_S{parallel_sampling}" \
                  f"_t{two_opt_iterations}"
            sample_fn = aot_load_or_compile(
                task.sample, f"{tag}_sample",
                (params, pts_s, jax.random.PRNGKey(0), parallel_sampling),
                kwargs={"neighbors": nbr_s})
            # at V=10000 the merge + 5000-iteration 2-opt as ONE program
            # crashes the TPU worker (measured, r5) — keep task.decode's
            # internal jits there, exactly the path the offline eval runs
            if V <= 2000:
                decode_fn = aot_load_or_compile(
                    jax.jit(task.decode), f"{tag}_decode", (pts_s, heat_s),
                    kwargs={"neighbors": nbr_s})
        except Exception as e:
            print(f"sparse aot fallback ({type(e).__name__}: {e})")
            sample_fn = decode_fn = None

    from difusco_tpu.utils.tours import tour_cost_np

    for i in range(min(n_instances, len(ds))):
        ex = ds.get(i)
        if sample_fn is not None:
            ki = jax.random.fold_in(jax.random.fold_in(key, i), 0)
            heat = sample_fn(params, jnp.asarray(ex["points"]), ki,
                             neighbors=jnp.asarray(ex["neighbors"]))
            if decode_fn is not None:
                _, cst, _ = decode_fn(jnp.asarray(ex["points"]), heat,
                                      neighbors=jnp.asarray(ex["neighbors"]))
            else:
                _, cst, _ = task.decode(jnp.asarray(ex["points"]), heat,
                                        neighbors=jnp.asarray(ex["neighbors"]))
            m = {
                "solved_cost": float(jnp.min(cst)),
                "gt_cost": float(tour_cost_np(
                    np.asarray(ex["points"]), np.asarray(ex["tour"]))),
            }
        else:
            m = task.evaluate_instance(
                params, jnp.asarray(ex["points"]), jnp.asarray(ex["tour"]),
                jax.random.fold_in(key, i),
                neighbors=jnp.asarray(ex["neighbors"]),
            )
        costs.append(float(m["solved_cost"]))
        gts.append(float(m["gt_cost"]))
        if deadline_ts and time.time() > deadline_ts:
            break
    return _gap_summary(costs, gts, _hk_bounds_for(test_file))


def bench_sparse_throughput(ckpt_name="tsp500_sparse_categorical",
                            test_rel="data/tsp500_test.txt", k=50, S=4,
                            n_iters=3, both_kernels=True):
    """Sparse denoise throughput: steps/s and analytic MFU for the fused
    Pallas path and (optionally) the plain XLA path — makes the kernel
    speedup a driver-captured number (VERDICT r2 weak #3)."""
    test_file = os.path.join(os.path.dirname(__file__), *test_rel.split("/"))
    params = _restore_ckpt(ckpt_name)
    if params is None or not os.path.exists(test_file):
        return None

    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.tasks.tsp import TSPTask

    ds = TSPDataset(test_file, sparse_factor=k)
    ex = ds.get(0)
    pts = jnp.asarray(ex["points"])
    nbrs = jnp.asarray(ex["neighbors"])
    V = pts.shape[0]
    steps = 50
    out = {}
    peak = tpu_peak_bf16_flops()
    variants = [("mega", dict(mega_kernel=True)),
                ("fused", dict(mega_kernel=False))]
    if both_kernels:
        variants.append(("xla", dict(fused_inference=False,
                                     mega_kernel=False)))
    if V > 1200:  # mega needs whole-graph VMEM residency
        variants = [v for v in variants if v[0] != "mega"]
    for tag, overrides in variants:
        cfg = Config(
            task="tsp", diffusion_type="categorical",
            diffusion_schedule="cosine", diffusion_steps=1000,
            inference_diffusion_steps=steps, inference_schedule="cosine",
            n_layers=12, hidden_dim=256, sparse_factor=k,
            parallel_sampling=S, bf16=True, **overrides,
        )
        task = TSPTask(cfg)
        key = jax.random.PRNGKey(0)
        try:
            heat = task.sample(params, pts, key, S, neighbors=nbrs)
            heat.block_until_ready()  # compile
        except Exception as e:  # a failed variant must not lose the rest
            out[f"{tag}_error"] = f"{type(e).__name__}: {e}"[:200]
            continue
        t0 = time.perf_counter()
        for i in range(n_iters):
            heat = task.sample(params, pts, jax.random.fold_in(key, i), S,
                               neighbors=nbrs)
            heat.block_until_ready()
        dt = (time.perf_counter() - t0) / n_iters
        out[f"steps_per_sec_{tag}"] = round(S * steps / dt, 2)
        if peak:
            fl = sparse_gnn_flops_per_forward(V, nbrs.shape[1], 256, 12)
            out[f"mfu_{tag}"] = round(S * steps / dt * fl / peak, 4)
    if out.get("steps_per_sec_xla"):
        out["fused_speedup"] = round(
            out["steps_per_sec_fused"] / out["steps_per_sec_xla"], 3)
    if out.get("steps_per_sec_mega") and out.get("steps_per_sec_fused"):
        out["mega_speedup_vs_fused"] = round(
            out["steps_per_sec_mega"] / out["steps_per_sec_fused"], 3)
    out["config"] = f"V={V} k={k} S={S} 50 cosine steps, sample-only"
    return out


def bench_mcts_tsp500(n_instances=2, time_per_city=0.02):
    """MCTS smoke: sample heatmaps with the sparse checkpoint, sparsify,
    run the native C++ solver on a couple of instances. The REFERENCE
    protocol (full 128-instance split, Param_T=0.10 s/city,
    tsp_mcts/code/TSP_IO.h:23-26) runs offline via
    scripts/run_mcts_protocol.py; its committed stats are reported by the
    mcts_protocol section."""
    import tempfile

    test_file = os.path.join(os.path.dirname(__file__), "data",
                             "tsp500_test.txt")
    mcts_bin = os.path.join(os.path.dirname(__file__), "native", "build",
                            "tsp_mcts")
    params = _restore_ckpt("tsp500_sparse_categorical")
    if params is None or not (os.path.exists(test_file)
                              and os.path.exists(mcts_bin)):
        return None

    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.data.tsp import TSPDataset
    from difusco_tpu.decode.mcts import (run_mcts, sparsify_heatmap,
                                         write_heatmap_txt)
    from difusco_tpu.tasks.tsp import TSPTask

    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="cosine",
        diffusion_steps=1000, inference_diffusion_steps=50,
        inference_schedule="cosine", n_layers=12, hidden_dim=256,
        sparse_factor=50, parallel_sampling=1, bf16=True,
    )
    task = TSPTask(cfg)
    ds = TSPDataset(test_file, sparse_factor=50)
    n = min(n_instances, len(ds))
    # AOT blob (scripts/build_sparse_aot.py, tsp500_smoke config) so the
    # S=1 sampler shape doesn't recompile inside the bench deadline
    sample_fn = None
    if os.environ.get("BENCH_AOT", "1") != "0":
        try:
            from difusco_tpu.utils.aot_cache import aot_load_or_compile

            ex0 = ds.get(0)
            V0, K0 = ex0["neighbors"].shape
            sample_fn = aot_load_or_compile(
                task.sample,
                "sparse_tsp500_sparse_categorical_V500_k50_S1_t1000_sample",
                (params, jax.ShapeDtypeStruct((V0, 2), jnp.float32),
                 jax.random.PRNGKey(0), 1),
                kwargs={"neighbors": jax.ShapeDtypeStruct((V0, K0),
                                                          jnp.int32)})
        except Exception as e:
            print(f"smoke aot fallback ({type(e).__name__}: {e})")
            sample_fn = None
    with tempfile.TemporaryDirectory() as tmp:
        key = jax.random.PRNGKey(0)
        for i in range(n):
            ex = ds.get(i)
            if sample_fn is not None:
                heat = sample_fn(params, jnp.asarray(ex["points"]),
                                 jax.random.fold_in(key, i),
                                 neighbors=jnp.asarray(ex["neighbors"]))
            else:
                heat = task.sample(
                    params, jnp.asarray(ex["points"]),
                    jax.random.fold_in(key, i),
                    1, neighbors=jnp.asarray(ex["neighbors"]),
                )
            h = np.asarray(heat)[0]
            V, K = h.shape
            dense = np.zeros((V, V), np.float32)
            rows = np.arange(V)[:, None].repeat(K, 1)
            dense[rows, np.asarray(ex["neighbors"])] = h
            write_heatmap_txt(
                os.path.join(tmp, f"h_{i}.txt"),
                sparsify_heatmap(dense, np.asarray(ex["points"])),
            )
        stats = run_mcts(
            test_file, os.path.join(tmp, "h_{i}.txt"),
            os.path.join(tmp, "stats.txt"), time_per_city=time_per_city,
            threads=n, extra_args=["--count", str(n)],
        )
    return stats["avg_gap_percent"] / 100.0


def bench_train_throughput(n_warmup=2, n_iters=10):
    """Training-step throughput + analytic MFU for the two configs the
    reference spends its GPU-hours on (VERDICT r3 item 8): the flagship
    dense TSP-50 categorical (batch 32) and MIS ER-[700-800] gaussian
    (12x256, batch 4, activation checkpointing — the reproducing_scripts.md
    :340-368 config). Synthetic batches with the real shapes; MFU counts
    useful FLOPs only (fwd+bwd ~= 3x forward; remat recompute excluded)."""
    import jax
    import jax.numpy as jnp

    from difusco_tpu.config import Config
    from difusco_tpu.tasks.mis import MISTask
    from difusco_tpu.tasks.tsp import TSPTask
    from difusco_tpu.train.trainer import Trainer, make_optimizer

    rng = np.random.default_rng(0)
    peak = tpu_peak_bf16_flops()
    out = {}

    def run(task, cfg, batch, fwd_flops_per_batch, name):
        params = task.init_params(jax.random.PRNGKey(0), batch)
        optimizer = make_optimizer(cfg, 1000)
        step = Trainer(task, cfg)._build_step(optimizer)
        opt_state = optimizer.init(params)
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        key = jax.random.PRNGKey(1)
        # AOT the train step like the samplers (built on first bench run;
        # the remote backend re-pays the compile per process otherwise)
        if os.environ.get("BENCH_AOT", "1") != "0":
            try:
                from difusco_tpu.utils.aot_cache import aot_load_or_compile

                step = aot_load_or_compile(
                    step, f"train_{name}_B{cfg.batch_size}",
                    (params, opt_state, jbatch, key))
            except Exception as e:
                print(f"train aot fallback ({type(e).__name__}: {e})")
        for i in range(n_warmup):
            params, opt_state, loss = step(params, opt_state, jbatch,
                                           jax.random.fold_in(key, i))
        loss.block_until_ready()
        t0 = time.perf_counter()
        for i in range(n_iters):
            params, opt_state, loss = step(params, opt_state, jbatch,
                                           jax.random.fold_in(key, 100 + i))
        loss.block_until_ready()
        dt = (time.perf_counter() - t0) / n_iters
        out[f"{name}_train_steps_per_sec"] = round(1.0 / dt, 3)
        # batch size next to the throughput so the number is never quoted
        # without its context (VERDICT r4 weak #4)
        out[f"{name}_train_batch_size"] = cfg.batch_size
        if peak:
            out[f"{name}_train_mfu"] = round(
                3.0 * fwd_flops_per_batch / dt / peak, 4)

    # flagship dense TSP-50 categorical, batch 32
    V, B = 50, 32
    cfg = Config(
        task="tsp", diffusion_type="categorical", diffusion_schedule="linear",
        diffusion_steps=1000, n_layers=12, hidden_dim=256, batch_size=B,
        learning_rate=2e-4, bf16=True,
    )
    pts = rng.random((B, V, 2)).astype(np.float32)
    adj = np.zeros((B, V, V), np.float32)
    perm = np.stack([rng.permutation(V) for _ in range(B)])
    adj[np.arange(B)[:, None], perm, np.roll(perm, 1, axis=1)] = 1.0
    run(TSPTask(cfg), cfg, {"points": pts, "adj": adj},
        B * dense_gnn_flops_per_forward(V, 256, 12), "tsp50")

    # MIS ER-[700-800] gaussian, batch 4, NO activation checkpointing —
    # the config the round-4/5 training runs actually use (remat was a GPU
    # memory workaround; measured 8.72 vs 6.05 graphs/s, perf_r4_probe)
    V, K, B = 800, 168, 4
    cfg = Config(
        task="mis", diffusion_type="gaussian", diffusion_schedule="linear",
        diffusion_steps=1000, n_layers=12, hidden_dim=256, batch_size=B,
        learning_rate=2e-4, bf16=True, use_activation_checkpoint=False,
    )
    nbrs = rng.integers(0, V, (B, V, K)).astype(np.int32)
    mask = (rng.random((B, V, K)) < 0.9).astype(np.float32)
    labels = (rng.random((B, V)) < 0.05).astype(np.float32)
    batch = {"labels": labels, "neighbors": nbrs, "mask": mask,
             "node_mask": np.ones((B, V), np.float32)}
    run(MISTask(cfg), cfg, batch,
        B * sparse_gnn_flops_per_forward(V, K, 256, 12, out_channels=1),
        "mis_er700800")
    return out


def _enable_compile_cache():
    """Persistent XLA compilation cache: bench sections for distinct (V, S)
    shapes each pay a multi-minute compile on this 2-core host otherwise
    (VERDICT r2 weak #7). Outside the repo so it never bloats git."""
    import jax

    try:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/root/.cache/jax_bench")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False


def main():
    t_start = time.time()
    deadline = t_start + float(os.environ.get("BENCH_DEADLINE_S", "1020"))
    cache_on = _enable_compile_cache()

    # The reference publishes no numbers in-repo; vs_baseline is the ratio of
    # our measured throughput to a conservative reference-design estimate of
    # 20 samples/s for TSP-50x32 on a datacenter GPU (50 model fwds + host
    # posterior each step). Recorded transparently in detail.
    baseline_samples_per_sec = 20.0
    result = {
        "metric": "tsp50_diffusion_samples_per_sec_per_chip",
        "value": 0.0,
        "unit": "samples/s",
        "vs_baseline": 0.0,
        "detail": {
            "config": "TSP-50 dense categorical, 12x256, 50 cosine steps, batch 32",
            "baseline_assumption": "20 samples/s reference-design estimate (no published numbers in-repo)",
            "compile_cache": cache_on,
            "sections_skipped": [],
            "section_seconds": {},
        },
    }
    d = result["detail"]

    def emit():
        d["bench_seconds"] = round(time.time() - t_start, 1)
        print(json.dumps(result), flush=True)
        # compact summary line AFTER the full line (newest-last): the
        # driver records only the last ~2 KB of stdout, and the cumulative
        # full line outgrew that window in round 3 — this line alone must
        # carry the round's verdict-critical numbers (VERDICT r3 weak #1)
        summary = {
            "metric": result["metric"],
            "value": result["value"],
            "unit": result["unit"],
            "vs_baseline": result["vs_baseline"],
            "compact": True,
            "mfu": d.get("mfu"),
            "sections_skipped": d["sections_skipped"],
            "sections_no_output": d.get("sections_no_output", []),
            "bench_seconds": d["bench_seconds"],
        }
        # fail-loud compact line (VERDICT r4 item 1): every *_error key and
        # the perf families (sparse/mega steps-per-sec) ride the compact
        # summary too — in r04 the ER-700-800 section's failure was invisible
        # because errors appeared only in the full line, which outgrows the
        # driver's 2 KB stdout tail
        for k, v in d.items():
            if (k.endswith(("_gap_vs_best_known", "_gap_vs_HK_LB",
                            "_gap_vs_hk_lb", "_gap_vs_optimal",
                            "_setsize_vs_labels", "_setsize_vs_optimal",
                            "_gap_vs_2opt_labels", "_error",
                            "_speedup", "_speedup_vs_fused",
                            "_labels_from_protocol",
                            "_gap_vs_pre_run_labels"))
                    or "_steps_per_sec" in k or "_mfu_" in k
                    or k.startswith("mis_er700800")):
                summary[k] = round(v, 5) if isinstance(v, float) else v
        # the driver records only the LAST 2 KB of stdout: if the compact
        # line itself outgrows that, its head (metric/value) is cut and the
        # whole line becomes unparseable — shed lowest-value keys first
        blob = json.dumps(summary)
        if len(blob) > 1900:
            shed = [k for k in summary
                    if "_mfu_" in k or k.endswith(("_HK_label_slack",
                                                   "_time_per_city"))]
            shed += [k for k in summary if k.endswith(
                ("_hk_n", "_n_instances", "_ls_n"))]
            for k in shed:
                summary.pop(k, None)
                if len(json.dumps(summary)) <= 1850:
                    break
            summary["compact_shed"] = len(shed)
            blob = json.dumps(summary)
        print(blob, flush=True)

    def put_gap(prefix, g, test_rel=None):
        if g is None:
            return
        d[f"{prefix}_gap_vs_best_known"] = round(g["gap"], 5)
        d[f"{prefix}_n_instances"] = g["n"]
        if "gap_vs_hk_lb" in g:
            d[f"{prefix}_gap_vs_HK_LB"] = round(g["gap_vs_hk_lb"], 5)
            d[f"{prefix}_HK_label_slack"] = round(g["hk_label_slack"], 5)
            if g.get("hk_n", g["n"]) != g["n"]:
                d[f"{prefix}_hk_n"] = g["hk_n"]
        # when every label of the split is B&B-proven optimal
        # (scripts/prove_optimal.py certificate), the label gap IS the true
        # optimality gap — report it under its real name (VERDICT r3 item 2)
        if test_rel:
            stem = os.path.splitext(os.path.basename(test_rel))[0]
            cert = os.path.join(os.path.dirname(__file__), "data",
                                "optimality", f"{stem}_bnb.json")
            if os.path.exists(cert):
                with open(cert) as f:
                    c = json.load(f)
                if c.get("node_limit", 1) == 0 and c.get("n", 0) >= g["n"]:
                    d[f"{prefix}_gap_vs_optimal"] = round(g["gap"], 5)

    def envn(name, default):
        return int(os.environ.get(name, str(default)))

    def cap(seconds):
        """Soft per-section budget: the gap/mis helpers truncate per
        instance at deadline_ts and record n, so capping each section's
        slice keeps one fat section from starving every later one into a
        SKIP (the r5 validation runs lost whole section families that
        way). The global deadline still dominates."""
        return min(deadline - 20, time.time() + seconds)

    # -- sections, cheapest-first; est = conservative worst-case seconds ----
    gap_costs = {}  # live-split per-instance costs, for frozen canaries

    def sec_sampling():
        s, st, dt, mfu = bench_sampling()
        result["value"] = round(s, 2)
        result["vs_baseline"] = round(s / baseline_samples_per_sec, 2)
        d["denoise_steps_per_sec"] = round(st, 1)
        d["batch_seconds"] = round(dt, 4)
        if mfu is not None:
            d["mfu"] = round(mfu, 4)
            d["mfu_note"] = ("analytic matmul FLOPs / v5e 197 TFLOP/s bf16 "
                             "peak")

    def sec_tsp50():
        # 160 of 256 instances by default: ~0.9 s/instance even with the
        # AOT blobs, and the full-split number is already on record
        # (BENCH_r04, ±0.1pp vs 160) — the saved ~90 s keeps the sparse
        # perf families inside the 1020 s budget alongside every gap
        # section (n is recorded; BENCH_TSP50_N=256 restores the full run)
        g = bench_gap(n_instances=envn("BENCH_TSP50_N", 160),
                      deadline_ts=cap(110))
        put_gap("tsp50", g, "data/tsp50/tsp50_test.txt")
        if g is not None:
            gap_costs["tsp50"] = g["costs"]
            d["gap_config"] = (
                "self-distilled ckpt v3, 4x parallel sampling; labels = "
                "best-known tours (model+MCTS keep-if-better refined; see "
                "README caveat); *_gap_vs_HK_LB = certified upper bound on "
                "the true optimality gap via Held-Karp 1-tree lower bounds "
                "(scripts/compute_hk_bounds.py), independent of labels"
            )

    def sec_tsp100():
        g = bench_gap(n_instances=envn("BENCH_TSP100_N", 128),
                      ckpt="tsp100_categorical_v3",
                      test_rel="data/tsp100/tsp100_test.txt",
                      deadline_ts=cap(120))
        put_gap("tsp100", g, "data/tsp100/tsp100_test.txt")
        emit()
        # the paper's headline TSP-100 sampling row is 16 samples (the
        # reproducing_scripts.md:228-252 command is greedy; the <=0.1%
        # table entry is DIFUSCO 16x) — measure best-of-16 too
        if time.time() < deadline - 60:
            # 64 instances: the S=16 pass costs ~1.5 s/instance and the
            # S=4 full-split number above is the primary gap; 64 keeps the
            # paper's 16x sampling row measured without starving the
            # sparse/tail sections (n is recorded)
            g16 = bench_gap(n_instances=envn("BENCH_TSP100_S16_N", 64),
                            ckpt="tsp100_categorical_v3",
                            test_rel="data/tsp100/tsp100_test.txt",
                            deadline_ts=cap(80), parallel_sampling=16)
            put_gap("tsp100_s16", g16, "data/tsp100/tsp100_test.txt")

    def sec_tsp50_gaussian():
        g = bench_gap(n_instances=envn("BENCH_TSP50G_N", 64),
                      ckpt="tsp50_gaussian_v2", diffusion_type="gaussian",
                      deadline_ts=cap(60))
        if g is not None:
            d["tsp50_gaussian_gap_vs_best_known"] = round(g["gap"], 5)
            if "gap_vs_hk_lb" in g:
                d["tsp50_gaussian_gap_vs_HK_LB"] = round(g["gap_vs_hk_lb"], 5)

    def sec_frozen_tsp50():
        fg = _frozen_gap("data/tsp50/tsp50_test.txt",
                         "tsp50_test_frozen.txt", gap_costs.get("tsp50", []))
        if fg is not None:
            d["frozen_tsp50_gap"] = round(fg["gap"], 5)
            d["frozen_tsp50_n"] = fg["n"]

    def sec_mis_er():
        r = bench_mis(deadline_ts=deadline - 15)
        if r is not None:
            d["mis_er_setsize_vs_labels"] = round(r[0], 5)

    def sec_mis_sat():
        r = bench_mis(ckpt_name="mis_sat_categorical", data_dir="mis_sat_test",
                      deadline_ts=deadline - 15)
        if r is not None:
            d["mis_sat_setsize_vs_labels"] = round(r[0], 5)

    def sec_mis_satp():
        # planted-SAT split: labels are PROVABLY OPTIMAL independent sets, so
        # this ratio is a true fraction-of-optimum (the paper's SATLIB shape)
        r = bench_mis(ckpt_name="mis_satp_categorical",
                      data_dir="mis_satp_test", hidden_dim=256,
                      deadline_ts=deadline - 15)
        if r is not None:
            d["mis_sat_setsize_vs_optimal"] = round(r[0], 5)

    def sec_mis_er_gauss():
        # gaussian MIS (reference ER config, reproducing_scripts.md:340-368)
        r = bench_mis(ckpt_name="mis_er_gaussian_v2",
                      diffusion_type="gaussian", deadline_ts=deadline - 15)
        if r is not None:
            d["mis_er_gaussian_setsize_vs_labels"] = round(r[0], 5)

    def sec_mis_er700800():
        # reference-scale ER-[700-800] p=0.15, gaussian 12x256, ILS labels.
        # greedy = reference-parity decode (pl_mis_model.py:194-200);
        # _ls = with the on-device ILS refinement. Two guarded phases —
        # greedy FIRST with its own emit — so the round's #1 metric can
        # never vanish with a later-phase failure (VERDICT r4 item 1: r04's
        # single-call section produced nothing in the driver artifact).
        try:
            r = bench_mis(
                # 32 instances is ~70 s with the AOT sampler (the compile
                # that used to dominate this section is pre-serialized)
                n_instances=envn("BENCH_ER700800_N", 32),
                ckpt_name="mis_er700800_gaussian",
                data_dir="mis_er700800_test", hidden_dim=256,
                diffusion_type="gaussian",
                deadline_ts=min(deadline - 15, time.time() + 130),
            )
            if r is not None:
                d["mis_er700800_gaussian_greedy_setsize_vs_labels"] = round(
                    r[0], 5)
                d["mis_er700800_n"] = r[2]
        except Exception as e:
            d["mis_er700800_greedy_error"] = f"{type(e).__name__}: {e}"[:300]
        emit()
        ls_rounds = envn("BENCH_ER700800_ILS", 512)
        if ls_rounds <= 0 or time.time() > deadline - 60:
            return
        r = bench_mis(
            n_instances=envn("BENCH_ER700800_LS_N", 8),
            ckpt_name="mis_er700800_gaussian",
            data_dir="mis_er700800_test", hidden_dim=256,
            diffusion_type="gaussian",
            ls_rounds=ls_rounds, ls_replicas=2,
            deadline_ts=min(deadline - 15, time.time() + 90),
        )
        if r is not None and r[1] is not None:
            d["mis_er700800_gaussian_setsize_vs_labels"] = round(r[1], 5)
            # record the benched ILS budget so the number is never
            # quoted for a different config (VERDICT r3 weak #5)
            d["mis_er700800_ls_rounds"] = ls_rounds
            d["mis_er700800_ls_n"] = r[2]

    def sec_sparse_throughput():
        # flat keys (tsp500_sparse_steps_per_sec_mega, ...) so the family
        # rides the compact summary line — the nested dict of r04 survived
        # only in side-committed artifacts (VERDICT r4 weak #1)
        r = bench_sparse_throughput()
        if r is not None:
            for k, v in r.items():
                d[f"tsp500_sparse_{k}"] = v
        r = bench_sparse_throughput(
            ckpt_name="tsp1000_sparse_categorical",
            test_rel="data/tsp1000/tsp1000_test.txt", k=100,
            both_kernels=False)
        if r is not None:
            for k, v in r.items():
                d[f"tsp1000_sparse_{k}"] = v

    def sec_tsp500():
        g = bench_tsp_sparse(
            "tsp500_sparse_categorical", "data/tsp500_test.txt", k=50,
            n_instances=envn("BENCH_TSP500_N", 32),
            deadline_ts=cap(70))
        put_gap("tsp500", g)
        if g is not None:
            gap_costs["tsp500"] = g["costs"]

    def sec_frozen_tsp500():
        fg = _frozen_gap("data/tsp500_test.txt", "tsp500_test_frozen.txt",
                         gap_costs.get("tsp500", []))
        if fg is not None:
            d["frozen_tsp500_gap"] = round(fg["gap"], 5)
            d["frozen_tsp500_n"] = fg["n"]

    def sec_tsp1000():
        g = bench_tsp_sparse(
            "tsp1000_sparse_categorical", "data/tsp1000/tsp1000_test.txt",
            k=100, n_instances=envn("BENCH_TSP1000_N", 16),
            deadline_ts=cap(60))
        put_gap("tsp1000", g)

    def sec_mcts_smoke():
        m = bench_mcts_tsp500()
        if m is not None:
            d["tsp500_mcts_smoke_gap_vs_best_known"] = round(m, 5)

    def _mcts_protocol_family(split, artifact, test_rel):
        # committed artifact from the offline reference-protocol run
        # (scripts/run_mcts_protocol*.py: full split, Param_T=0.10 s/city).
        # gap_vs_best_known is RECOMPUTED from the artifact's stored
        # per-instance costs against the CURRENT split labels — labels can
        # be refined between rounds, so the stored gap can go stale
        # (advisor r3 medium finding).
        path = os.path.join(os.path.dirname(__file__), "data", artifact)
        if not os.path.exists(path):
            return
        with open(path) as f:
            st = json.load(f)
        prefix = f"tsp{split}_mcts_protocol"
        for k in ("gap_vs_hk_lb", "n", "time_per_city"):
            if k in st:
                d[f"{prefix}_{k}"] = round(st[k], 5) \
                    if isinstance(st[k], float) else st[k]
        test_file = os.path.join(os.path.dirname(__file__),
                                 *test_rel.split("/"))
        if "costs" in st and os.path.exists(test_file):
            from difusco_tpu.data.tsp import TSPDataset
            from difusco_tpu.utils.tours import tour_cost_np

            ds = TSPDataset(test_file)
            costs = np.asarray(st["costs"], np.float64)
            n = min(len(costs), len(ds))
            gts = np.asarray(
                [tour_cost_np(np.asarray(ds.get(i)["points"]),
                              np.asarray(ds.get(i)["tour"]))
                 for i in range(n)], np.float64)
            live = float(np.mean((costs[:n] - gts) / gts))
            stored = st.get("gap_vs_best_known")
            if stored is not None and abs(live - stored) > 1e-4 \
                    and abs(live) < 1e-4:
                # the protocol's tours were folded back into this split's
                # labels (keep-if-better), so vs-CURRENT-labels is
                # definitionally ~0 and carries no information — report the
                # artifact's stored pre-fold gap instead (VERDICT r4 item 9)
                d[f"{prefix}_labels_from_protocol"] = True
                d[f"{prefix}_gap_vs_pre_run_labels"] = round(stored, 5)
            else:
                d[f"{prefix}_gap_vs_best_known"] = round(live, 5)
        elif "gap_vs_best_known" in st:
            d[f"{prefix}_gap_vs_best_known"] = st["gap_vs_best_known"]

    def sec_mcts_protocol():
        _mcts_protocol_family(500, "mcts_protocol_tsp500.json",
                              "data/tsp500_test.txt")
        _mcts_protocol_family(1000, "mcts_protocol_tsp1000.json",
                              "data/tsp1000/tsp1000_test.txt")
        _mcts_protocol_family(10000, "mcts_protocol_tsp10000.json",
                              "data/tsp10000/tsp10000_test.txt")
        # full-budget (Param_T = 0.10 s/city, TSP_IO.h:23-26) calibration
        # subsets — grown each round toward full-split full-budget numbers
        for split, tag in ((1000, "_T010_n32"), (10000, "_T010_n2")):
            path = os.path.join(os.path.dirname(__file__), "data",
                                f"mcts_protocol_tsp{split}{tag}.json")
            if not os.path.exists(path):
                continue
            with open(path) as f:
                st = json.load(f)
            pre = f"tsp{split}_mcts_T010"
            d[f"{pre}_gap_vs_best_known"] = round(st["gap_vs_best_known"], 5)
            d[f"{pre}_n"] = st["n"]
            if "gap_vs_hk_lb" in st:
                d[f"{pre}_gap_vs_hk_lb"] = round(st["gap_vs_hk_lb"], 5)

    def sec_tsp10000_offline():
        # committed artifact from the offline reference-config eval (the
        # live section below rarely fits the deadline: V=10000 compile alone
        # is ~10 min on a cold cache)
        path = os.path.join(os.path.dirname(__file__), "data",
                            "tsp10000_offline_eval.json")
        if os.path.exists(path):
            with open(path) as f:
                st = json.load(f)
            d["tsp10000_offline_gap_vs_2opt_labels"] = round(st["gap"], 5)
            d["tsp10000_offline_n"] = st["n"]
            if "gap_vs_hk_lb" in st:
                d["tsp10000_offline_gap_vs_HK_LB"] = round(
                    st["gap_vs_hk_lb"], 5)
                d["tsp10000_offline_HK_label_slack"] = round(
                    st["hk_label_slack"], 5)

    def sec_tsp10000():
        # TSP-10000 (k=100) with the TSP-1000-trained model — the reference
        # evaluates TSP-10000 with its TSP-1000 checkpoint too
        # (reproducing_scripts.md:283-311), --two_opt_iterations 5000.
        g = bench_tsp_sparse(
            "tsp1000_sparse_categorical", "data/tsp10000/tsp10000_test.txt",
            k=100, n_instances=envn("BENCH_TSP10000_N", 2),
            parallel_sampling=1, two_opt_iterations=5000,
            deadline_ts=deadline - 30)
        if g is not None:
            # labels = never-model-touched kNN-2opt/Or-opt tours
            d["tsp10000_gap_vs_2opt_labels"] = round(g["gap"], 5)
            d["tsp10000_n_instances"] = g["n"]
            if "gap_vs_hk_lb" in g:
                d["tsp10000_gap_vs_HK_LB"] = round(g["gap_vs_hk_lb"], 5)
                d["tsp10000_HK_label_slack"] = round(g["hk_label_slack"], 5)

    emit()  # a parseable line exists even if the first section never returns

    # (name, fn, est worst-case seconds on a WARM compile cache). Ordered by
    # value-density: one representative of every metric family lands before
    # the long per-instance tails, so a truncated run still carries the full
    # metric surface (each section emits a cumulative line regardless).
    def sec_train_throughput():
        r = bench_train_throughput()
        d.update(r)

    sections = [
        ("sampling", sec_sampling, 60),
        ("mcts_protocol", sec_mcts_protocol, 5),
        ("tsp10000_offline", sec_tsp10000_offline, 5),
        ("train_throughput", sec_train_throughput, 150),
        ("mis_er", sec_mis_er, 60),
        ("mis_sat", sec_mis_sat, 45),
        ("mis_satp", sec_mis_satp, 60),
        ("mis_er_gauss", sec_mis_er_gauss, 30),
        # quality-gap sections before the perf families: the gap numbers
        # are the scarcer evidence (perf is stable round-over-round), and
        # with their AOT blobs the dense sections are cheap. The r5
        # validation run had the old ordering + a 437 s mis_er700800 (LS
        # compile) and lost tsp50/tsp100/tsp50_gaussian entirely.
        ("tsp50", sec_tsp50, 150),
        ("frozen_tsp50", sec_frozen_tsp50, 5),
        ("tsp100", sec_tsp100, 120),
        ("tsp50_gaussian", sec_tsp50_gaussian, 80),
        ("mis_er700800", sec_mis_er700800, 140),
        ("tsp500", sec_tsp500, 120),
        ("frozen_tsp500", sec_frozen_tsp500, 10),
        ("tsp1000", sec_tsp1000, 120),
        ("sparse_throughput", sec_sparse_throughput, 210),
        ("mcts_smoke", sec_mcts_smoke, 60),
        ("tsp10000", sec_tsp10000, 420),
    ]
    # sections that honor deadline_ts internally may start with little time
    # left (they truncate and record n); the rest must fully fit their est
    truncatable = {"tsp50", "tsp100", "tsp50_gaussian", "mis_er", "mis_sat",
                   "mis_satp", "mis_er_gauss", "mis_er700800", "tsp500",
                   "tsp1000", "tsp10000"}
    # worst-case COLD compile seconds for the long-compile sections: on a
    # cold XLA cache (the axon remote backend never hits the persistent
    # cache) a truncatable section admitted with 30 s left can still burn
    # ~10 min compiling before its first per-instance deadline check
    # (advisor r3 finding) — admit those only if the compile itself fits
    cold_compile_floor = {"tsp10000": 600, "tsp1000": 300, "tsp500": 300,
                          "sparse_throughput": 300, "train_throughput": 200}
    for name, fn, est in sections:
        remaining = deadline - time.time()
        # cold-cache probe: the sampling section compiles the flagship
        # sampler first; a warm cache finishes it in well under 2 min
        cold = d["section_seconds"].get("sampling", 0) > 120
        floor = cold_compile_floor.get(name, 0) if cold else 0
        need = (min(est, 30) if name in truncatable else est) + floor
        if remaining < need:
            d["sections_skipped"].append(name)
            continue
        t0 = time.time()
        keys_before = set(d)
        try:
            fn()
        except Exception as e:  # a failed section must not lose the rest
            d[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
        if not (set(d) - keys_before):
            # ran, didn't error, set nothing — the r04 failure mode where a
            # section's output silently vanishes from the round's evidence
            d.setdefault("sections_no_output", []).append(name)
        d["section_seconds"][name] = round(time.time() - t0, 1)
        emit()
    emit()  # final line always reflects the complete sections_skipped list


if __name__ == "__main__":
    main()
