"""TSP task: diffusion training, sampling, and decoding.

Capability parity with reference ``TSPModel`` (difusco/pl_tsp_model.py):
- categorical training (one-hot tour adjacency, +/-1 rescale with 5% uniform
  amplitude jitter, CE vs adjacency; pl_tsp_model.py:41-87)
- gaussian training (dense only, MSE on eps; pl_tsp_model.py:89-114)
- inference: x_T init, `inference_diffusion_steps` posterior steps with the
  time-warped schedule, heatmap mapping (gaussian *0.5+0.5, categorical
  +1e-6), merge + 2-opt decode, best-of-(parallel x sequential)
  (pl_tsp_model.py:153-256)

TPU-native redesign:
- the entire denoise trajectory is ONE jitted ``lax.scan`` (the reference
  runs a python loop with a host->device transfer per step)
- parallel sampling is a leading device axis (vmapped model apply), shardable
  over a mesh instead of the reference's single-GPU batch replication
- decode (merge + 2-opt) runs on device; no CPU multiprocessing pool
- note the reference's inference feeds {0,1} bits to the model while training
  feeds the +/-1-jittered representation; this quirk is reproduced
  faithfully (pl_tsp_model.py:122-138 vs :57-63)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from difusco_tpu import diffusion as dfn
from difusco_tpu.config import Config
from difusco_tpu.models.gnn import GNNDenoiser
from difusco_tpu.ops.merge import merge_heatmap_device, symmetrize_fixed_degree_batch
from difusco_tpu.ops.two_opt import batched_two_opt, tour_cost


class TSPTask:
    """Holds static config + model; exposes pure jittable functions."""

    def __init__(self, cfg: Config):
        cfg.validate()
        self.cfg = cfg
        self.sparse = cfg.sparse_factor > 0
        self.model = GNNDenoiser(
            n_layers=cfg.n_layers,
            hidden_dim=cfg.hidden_dim,
            out_channels=cfg.out_channels,
            aggregation=cfg.aggregation,
            sparse=self.sparse,
            node_feature_only=False,
            use_checkpoint=cfg.use_activation_checkpoint,
            dtype=jnp.bfloat16 if (cfg.bf16 or cfg.fp16) else jnp.float32,
        )
        if cfg.diffusion_type == "categorical":
            self.sched = dfn.categorical_schedule(
                cfg.diffusion_steps, cfg.diffusion_schedule
            )
        else:
            self.sched = dfn.gaussian_schedule(
                cfg.diffusion_steps, cfg.diffusion_schedule
            )
        self.time_pairs = jnp.asarray(
            dfn.inference_time_pairs(
                cfg.inference_schedule,
                cfg.diffusion_steps,
                cfg.inference_diffusion_steps,
            )
        )
        # jit once per distinct n_samples; schedule arrays are closed over
        self.sample = jax.jit(self._sample, static_argnames=("n_samples",))

    # -- init ---------------------------------------------------------------

    def init_params(self, key: jax.Array, batch: Dict[str, np.ndarray]):
        points = jnp.asarray(batch["points"][:1])
        t = jnp.ones((1,), jnp.float32)
        if self.sparse:
            xt = jnp.asarray(batch["edge_labels"][:1])
            nbrs = jnp.asarray(batch["neighbors"][:1])
            return self.model.init(key, t, xt, points=points, neighbors=nbrs)
        xt = jnp.asarray(batch["adj"][:1])
        return self.model.init(key, t, xt, points=points)

    # -- training -----------------------------------------------------------

    def loss_fn(self, params, batch, key) -> jax.Array:
        """Diffusion training loss for one batch (pure; grad/jit by trainer)."""
        cfg = self.cfg
        points = batch["points"]
        labels = batch["edge_labels"] if self.sparse else batch["adj"]
        B = points.shape[0]
        kt, kx, kj = jax.random.split(key, 3)
        t = jax.random.randint(kt, (B,), 1, cfg.diffusion_steps + 1)

        if cfg.diffusion_type == "categorical":
            xt = dfn.categorical_q_sample(self.sched, labels, t, kx)
            xt = xt * 2.0 - 1.0
            xt = xt * (1.0 + 0.05 * jax.random.uniform(kj, xt.shape))
            logits = self._apply(params, t.astype(jnp.float32), xt, batch)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32)
            )
            return ce.mean()

        # gaussian: jitter x0 BEFORE noising (pl_tsp_model.py:95-99)
        x0 = labels * 2.0 - 1.0
        x0 = x0 * (1.0 + 0.05 * jax.random.uniform(kj, x0.shape))
        xt, eps = dfn.gaussian_q_sample(self.sched, x0, t, kx)
        pred = self._apply(params, t.astype(jnp.float32), xt, batch)[..., 0]
        return jnp.mean((pred - eps) ** 2)

    def _apply(self, params, t, xt, batch):
        if self.sparse:
            return self.model.apply(
                params, t, xt, points=batch["points"], neighbors=batch["neighbors"]
            )
        return self.model.apply(params, t, xt, points=batch["points"])

    # -- sampling -----------------------------------------------------------

    def _sample(self, params, points, key, n_samples: int, neighbors=None):
        """Denoise from x_T to a heatmap, as one lax.scan.

        Args:
          points: (V, 2); neighbors: (V, K) for the sparse path.
        Returns:
          heatmaps: (S, V, V) dense or (S, V, K) sparse.
        """
        cfg = self.cfg
        S = n_samples
        V = points.shape[0]
        pts = jnp.broadcast_to(points[None], (S, V, 2))
        nbrs = (
            jnp.broadcast_to(neighbors[None], (S,) + neighbors.shape)
            if neighbors is not None
            else None
        )
        shape = (S, V, neighbors.shape[-1]) if self.sparse else (S, V, V)
        kx, kloop = jax.random.split(key)

        # The fused Pallas layer reads/writes e exactly once but pads V to a
        # multiple of 16; it only wins when the padding waste is small
        # (measured on v5e: slower at V=50 -> Vp=64, faster at V % 16 == 0).
        pad_waste = (-(V // -16) * 16) ** 2 / (V * V)
        use_fused = (
            cfg.fused_inference
            and not self.sparse
            and (cfg.bf16 or cfg.fp16)
            and jax.default_backend() != "cpu"
            and (pad_waste <= 1.15 or getattr(self, "_force_fused", False))
        )

        # sparse fused kernels: 'onehot' does the gather as an in-kernel
        # one-hot MXU matmul (least HBM traffic, compute O(E V H)) — best for
        # small V; 'gathered' feeds an XLA HBM row-gather into the kernel and
        # fuses all three edge matmuls (compute O(E H^2), traffic O(E H)) —
        # scales to TSP-10000 (1.8x over the XLA path at V=10000). Measured
        # on v5e: onehot wins at V=500 (23 vs 30 ms) and V=1000 (78 vs 98);
        # gathered wins for larger V.
        use_fused_sparse = (
            cfg.fused_inference
            and self.sparse
            and (cfg.bf16 or cfg.fp16)
            and jax.default_backend() != "cpu"
        )
        sparse_variant = "onehot" if V <= 1200 else "gathered"
        # whole-network STEP megakernel (ops/pallas_gnn_mega.py): all layers
        # PLUS the out head + softmax + posterior + Bernoulli in one kernel
        # — needs binary xt (the categorical sampling path) and whole-graph
        # VMEM residency. Fusing the epilogue shrank the kernel output from
        # (1,Vp,K,H) bf16 to (1,Vp,K) f32, so the footprint is the edge
        # scratch + node scratches + stacked weights: at H=256 this now
        # admits TSP-1000 k=100 (~68 MB; the r4 unfused kernel OOMed there
        # at a measured 146.8/128 MB) as well as TSP-500 (~27 MB).
        import os as _os

        _step_fused = _os.environ.get("DIFUSCO_MEGA_STEP", "1") != "0"
        K_mega = neighbors.shape[-1] if neighbors is not None else 0
        if _step_fused:
            mega_bytes = (V + 128) * K_mega * cfg.hidden_dim * 2 \
                + 20 * (V + 128) * cfg.hidden_dim \
                + 12 * cfg.n_layers * cfg.hidden_dim * cfg.hidden_dim
        else:
            # legacy kernel keeps the (1,Vp,K,H) output block resident
            mega_bytes = 2 * (V + 128) * K_mega * cfg.hidden_dim * 2 \
                + 8 * (V + 128) * cfg.hidden_dim * 4
        use_mega = (
            use_fused_sparse
            and getattr(cfg, "mega_kernel", True)
            and cfg.diffusion_type == "categorical"
            and mega_bytes <= 96 * 1024 * 1024
        )
        # dense megakernel: a V<=250 sample's (V,V,H) edge stream is VMEM-
        # resident, so the whole 12-layer forward fuses into one kernel;
        # needs binary xt (categorical) like the sparse variant
        use_mega_dense = (
            cfg.fused_inference
            and not self.sparse
            and getattr(cfg, "mega_kernel", True)
            and cfg.diffusion_type == "categorical"
            and (cfg.bf16 or cfg.fp16)
            and jax.default_backend() != "cpu"
            # V <= 64, not the VMEM-fit bound (~250): Mosaic compile time
            # explodes with the dense chunk count (V=50 compiles in ~2.5
            # min; V=100 exceeded 30 min, measured 2026-08-21) — keep the
            # megakernel to the flagship size it was measured to win at
            and V <= 64
        )

        def apply(t_scalar, xt, xt_binary=False):
            t_vec = jnp.full((S,), t_scalar, jnp.float32)
            if self.sparse:
                if use_mega and xt_binary:
                    from difusco_tpu.ops.pallas_gnn_mega import (
                        sparse_forward_mega)

                    return sparse_forward_mega(
                        params, t_vec, xt, pts, nbrs,
                        n_layers=cfg.n_layers,
                        hidden_dim=cfg.hidden_dim,
                        out_channels=cfg.out_channels,
                    )
                if use_fused_sparse:
                    from difusco_tpu.ops.pallas_gnn_sparse import sparse_forward_fused

                    return sparse_forward_fused(
                        params, t_vec, xt, pts, nbrs,
                        n_layers=cfg.n_layers,
                        hidden_dim=cfg.hidden_dim,
                        out_channels=cfg.out_channels,
                        variant=sparse_variant,
                        xt_binary=xt_binary,
                    )
                return self.model.apply(
                    params, t_vec, xt, points=pts, neighbors=nbrs,
                    xt_binary=xt_binary,
                )
            if use_mega_dense and xt_binary:
                from difusco_tpu.ops.pallas_gnn_mega import dense_forward_mega

                return dense_forward_mega(
                    params, t_vec, xt, pts,
                    n_layers=cfg.n_layers,
                    hidden_dim=cfg.hidden_dim,
                    out_channels=cfg.out_channels,
                )
            if use_fused:
                from difusco_tpu.ops.pallas_gnn import dense_forward_fused

                return dense_forward_fused(
                    params, t_vec, xt, pts,
                    n_layers=cfg.n_layers,
                    hidden_dim=cfg.hidden_dim,
                    out_channels=cfg.out_channels,
                    xt_binary=xt_binary,
                )
            return self.model.apply(params, t_vec, xt, points=pts,
                                    xt_binary=xt_binary)

        if cfg.diffusion_type == "categorical":
            xt = (jax.random.normal(kx, shape) > 0).astype(jnp.float32)

            if use_mega and self.sparse and _step_fused:
                # fully fused denoise step: layers + out head + softmax +
                # posterior + Bernoulli in ONE kernel; the PRNG stream is
                # identical to the unfused path (bernoulli(k,p) ==
                # uniform(k) < p, and the kernel consumes those uniforms)
                from difusco_tpu.ops.pallas_gnn_mega import (
                    sparse_denoise_step_mega)

                def step(carry, pair):
                    xt, key = carry
                    key, sub = jax.random.split(key)
                    xt = sparse_denoise_step_mega(
                        params, self.sched.Q_bar, pair[0], pair[1], xt,
                        points, neighbors, sub,
                        n_layers=cfg.n_layers, hidden_dim=cfg.hidden_dim,
                    )
                    return (xt, key), None

                (xt, _), _ = jax.lax.scan(step, (xt, kloop), self.time_pairs)
                return xt + 1e-6

            if use_mega_dense and _step_fused:
                from difusco_tpu.ops.pallas_gnn_mega import (
                    dense_denoise_step_mega)

                def step(carry, pair):
                    xt, key = carry
                    key, sub = jax.random.split(key)
                    xt = dense_denoise_step_mega(
                        params, self.sched.Q_bar, pair[0], pair[1], xt,
                        points, sub,
                        n_layers=cfg.n_layers, hidden_dim=cfg.hidden_dim,
                    )
                    return (xt, key), None

                (xt, _), _ = jax.lax.scan(step, (xt, kloop), self.time_pairs)
                return xt + 1e-6

            def step(carry, pair):
                xt, key = carry
                key, sub = jax.random.split(key)
                # xt is exactly {0,1} throughout the categorical chain
                probs = jax.nn.softmax(apply(pair[0], xt, xt_binary=True), axis=-1)
                xt = dfn.categorical_posterior(
                    self.sched, pair[0], pair[1], probs, xt, sub
                )
                return (xt, key), None

            (xt, _), _ = jax.lax.scan(step, (xt, kloop), self.time_pairs)
            return xt + 1e-6

        xt = jax.random.normal(kx, shape)
        use_ddim = cfg.inference_trick == "ddim"

        def step(carry, pair):
            xt, key = carry
            key, sub = jax.random.split(key)
            pred = apply(pair[0], xt)[..., 0]
            xt = dfn.gaussian_posterior(
                self.sched, pair[0], pair[1], pred, xt, sub, use_ddim
            )
            return (xt, key), None

        (xt, _), _ = jax.lax.scan(step, (xt, kloop), self.time_pairs)
        return xt * 0.5 + 0.5

    # -- decoding -----------------------------------------------------------

    def decode(
        self, points, heatmaps, neighbors=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
        """merge + 2-opt + cost; returns (tours, costs, work metrics).

        The merge backend follows cfg.merge_backend:
          device — vmapped on-device lax.while_loop (default)
          native — C++ thread-pool library (CPU offload)
          numpy  — host oracle (debugging)
        """
        backend = self.cfg.merge_backend
        if self.sparse:
            sym = symmetrize_fixed_degree_batch(heatmaps, neighbors)
            if backend == "device":
                V, K = neighbors.shape
                src = jnp.repeat(jnp.arange(V, dtype=jnp.int32), K)
                dst = neighbors.reshape(-1)
                tours, merge_iters = merge_heatmap_device(
                    points,
                    sym.reshape(sym.shape[0], -1),
                    edge_index=jnp.stack([src, dst]),
                )
            else:
                # densify the fixed-degree heats for the host backends
                S = sym.shape[0]
                V = points.shape[0]
                dense = np.zeros((S, V, V))
                nb = np.asarray(neighbors)
                hs = np.asarray(sym, np.float64)
                rows = np.arange(V)[:, None].repeat(nb.shape[1], 1)
                for s in range(S):
                    dense[s][rows, nb] = hs[s]
                tours, merge_iters = self._host_merge(points, dense, backend)
        else:
            if backend == "device":
                tours, merge_iters = merge_heatmap_device(points, heatmaps)
            else:
                sym = np.asarray(heatmaps, np.float64)
                sym = sym + sym.transpose(0, 2, 1)
                tours, merge_iters = self._host_merge(points, sym, backend)
        tours, two_opt_iters = batched_two_opt(
            points, jnp.asarray(tours), self.cfg.two_opt_iterations,
            parity=self.cfg.two_opt_reference_parity,
        )
        costs = tour_cost(points, tours)
        return tours, costs, {
            "merge_iterations": jnp.mean(jnp.asarray(merge_iters, jnp.float32)),
            "2opt_iterations": two_opt_iters.astype(jnp.float32),
        }

    @staticmethod
    def _host_merge(points, dense_sym, backend):
        """CPU merge backends on densified symmetric heatmaps."""
        pts = np.asarray(points, np.float64)
        if backend == "native":
            from difusco_tpu.ops.native import merge_heatmap_native

            tours, _, iters = merge_heatmap_native(pts, dense_sym)
            return tours, iters
        if backend == "numpy":
            from difusco_tpu.ops.merge import merge_heatmap_numpy
            from difusco_tpu.ops.merge import tour_from_adjacency

            tours, iters = [], []
            for h in dense_sym:
                adj, it = merge_heatmap_numpy(pts, h)
                nbr = np.full((pts.shape[0], 2), -1, np.int32)
                deg = np.zeros(pts.shape[0], np.int32)
                for a, b in zip(*np.nonzero(np.triu(adj))):
                    nbr[a, deg[a]] = b
                    nbr[b, deg[b]] = a
                    deg[a] += 1
                    deg[b] += 1
                tours.append(np.asarray(tour_from_adjacency(jnp.asarray(nbr))))
                iters.append(it)
            return np.stack(tours), np.asarray(iters)
        raise ValueError(f"unknown merge backend {backend!r}")

    # -- evaluation ---------------------------------------------------------

    def evaluate_instance(
        self, params, points, gt_tour, key, neighbors=None,
        save_heatmap_dir=None, instance_idx=0, split="test", mesh=None,
    ) -> Dict[str, float]:
        """best-of-(parallel x sequential) for one instance
        (pl_tsp_model.py:175-246). With ``save_heatmap_dir`` the raw heatmap
        and points are dumped as .npy for the offline MCTS pipeline
        (reference run_save_numpy_heatmap, pl_tsp_model.py:258-267; requires
        single sampling like the reference).

        With ``mesh`` the parallel_sampling axis is sharded over it and the
        whole sample->decode->best-of pipeline runs as one sharded jit
        (cross-chip argmin-of-cost + winning-tour gather); requires the
        device merge backend."""
        cfg = self.cfg
        if (mesh is not None and cfg.merge_backend == "device"
                and save_heatmap_dir is None):
            return self._evaluate_instance_sharded(
                params, points, gt_tour, key, mesh, neighbors
            )
        all_costs = []
        metrics = {}
        for s in range(cfg.sequential_sampling):
            heat = self.sample(
                params,
                points,
                jax.random.fold_in(key, s),
                cfg.parallel_sampling,
                neighbors=neighbors,
            )
            if save_heatmap_dir is not None:
                if cfg.parallel_sampling > 1 or cfg.sequential_sampling > 1:
                    raise NotImplementedError(
                        "heatmap saving supports single sampling only"
                    )
                import os

                os.makedirs(save_heatmap_dir, exist_ok=True)
                h0 = np.asarray(heat[0], np.float64)
                if self.sparse:
                    # densify the fixed-degree heatmap for the converters
                    V = points.shape[0]
                    dense_h = np.zeros((V, V))
                    nb = np.asarray(neighbors)
                    rows = np.arange(V)[:, None].repeat(nb.shape[1], 1)
                    dense_h[rows, nb] = h0
                    h0 = dense_h
                np.save(
                    os.path.join(save_heatmap_dir, f"{split}-heatmap-{instance_idx}.npy"),
                    h0,
                )
                np.save(
                    os.path.join(save_heatmap_dir, f"{split}-points-{instance_idx}.npy"),
                    np.asarray(points, np.float64),
                )
            _, costs, m = self.decode(points, heat, neighbors=neighbors)
            all_costs.append(costs)
            metrics = {k: float(v) for k, v in m.items()}
        costs = jnp.concatenate(all_costs)
        gt_cost = float(tour_cost(points, gt_tour))
        best = float(jnp.min(costs))
        return {
            "solved_cost": best,
            "gt_cost": gt_cost,
            "gap": (best - gt_cost) / gt_cost,
            **metrics,
        }

    def _evaluate_instance_sharded(
        self, params, points, gt_tour, key, mesh, neighbors=None
    ) -> Dict[str, float]:
        """Sharded-mesh evaluation path: particles sharded over the mesh,
        decode per shard, cross-chip best-of returning the winning tour."""
        from difusco_tpu.parallel.sampling import make_sharded_evaluator

        cfg = self.cfg
        cache_key = (id(mesh), cfg.parallel_sampling)
        if not hasattr(self, "_sharded_eval"):
            self._sharded_eval = {}
        if cache_key not in self._sharded_eval:
            self._sharded_eval[cache_key] = make_sharded_evaluator(
                self, mesh, cfg.parallel_sampling
            )
        eval_fn = self._sharded_eval[cache_key]
        best_cost = None
        best_tour = None
        metrics = {}
        for s in range(cfg.sequential_sampling):
            tour, cost, _, work = eval_fn(
                params, points, jax.random.fold_in(key, s), neighbors=neighbors
            )
            if best_cost is None or float(cost) < best_cost:
                best_cost = float(cost)
                best_tour = tour
            metrics = {k: float(v) for k, v in work.items()}
        gt_cost = float(tour_cost(points, gt_tour))
        out = {
            "solved_cost": best_cost,
            "gt_cost": gt_cost,
            "gap": (best_cost - gt_cost) / gt_cost,
            **metrics,
        }
        self.last_best_tour = best_tour  # winning tour (V+1,), replicated
        return out
