"""AOT executable cache: serialize compiled XLA executables to disk and
reload them instead of recompiling.

Why: the persistent XLA compilation cache never hits across processes on
the remote-tunnel backend, so every bench/eval process re-pays the full
compile (~270 s/round for the flagship + sparse samplers — VERDICT r3
item 6). ``jax.experimental.serialize_executable`` DOES work on this
backend (measured: serialize+reload of a compiled function round-trips and
executes), so we cache the compiled executable keyed by a caller-provided
name + the abstract input signature + device kind.

Usage:
    fn = aot_cached(lambda: task.sample, "flagship_sampler",
                    example_args=(params, pts, key, S))
    heat = fn(params, pts, key)          # loads or compiles+serializes

A cache entry that fails to deserialize (different backend/topology,
version skew) falls back to a fresh jit compile transparently.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional, Sequence

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data", "aot",
)


_CODE_FP = None

# modules whose source defines the traced programs: a change to any of
# them must invalidate every cached executable (a stale blob would load
# fine and silently run the OLD kernel — measured hazard when the round-5
# step-fused megakernels replaced the r4 sampler graphs)
_FP_MODULES = (
    "diffusion.py", "tasks/tsp.py", "tasks/mis.py", "models/gnn.py",
    "models/embeddings.py", "ops/pallas_gnn.py", "ops/pallas_gnn_sparse.py",
    "ops/pallas_gnn_mega.py", "ops/merge.py", "ops/two_opt.py",
    "ops/mis_decode.py", "ops/mis_local_search.py",
)


def _code_fingerprint() -> str:
    global _CODE_FP
    if _CODE_FP is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for rel in _FP_MODULES:
            p = os.path.join(pkg, *rel.split("/"))
            if os.path.exists(p):
                with open(p, "rb") as f:
                    h.update(f.read())
        _CODE_FP = h.hexdigest()[:8]
    return _CODE_FP


def _signature(args, kwargs) -> str:
    import jax

    leaves, treedef = jax.tree.flatten((args, kwargs))
    parts = [str(treedef), _code_fingerprint()]
    for leaf in leaves:
        x = jax.numpy.asarray(leaf) if not hasattr(leaf, "shape") else leaf
        parts.append(f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(leaf))}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def aot_load_or_compile(
    jitted: Callable,
    name: str,
    args: Sequence[Any],
    kwargs: Optional[dict] = None,
    cache_dir: Optional[str] = None,
):
    """Return a loaded (deserialized) or freshly compiled executable for
    ``jitted`` at the given concrete args; persists new compiles.

    The returned object is the compiled executable: call it with the same
    argument STRUCTURE (donation/layout per the original jit).
    """
    import jax

    kwargs = kwargs or {}
    cache_dir = cache_dir or DEFAULT_DIR
    dev = jax.devices()[0]
    key = _signature(args, kwargs)
    path = os.path.join(
        cache_dir,
        f"{name}_{dev.device_kind.replace(' ', '_')}_"
        f"{jax.__version__}_{key}.aot",
    )

    if os.path.exists(path):
        try:
            from jax.experimental import serialize_executable

            with open(path, "rb") as f:
                payload = pickle.load(f)
            return serialize_executable.deserialize_and_load(
                payload["blob"], payload["in_tree"], payload["out_tree"]
            )
        except Exception as e:  # version/backend skew: recompile
            print(f"aot cache load failed ({type(e).__name__}: {e}); "
                  "recompiling")

    lowered = jitted.lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        from jax.experimental import serialize_executable

        blob, in_tree, out_tree = serialize_executable.serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"blob": blob, "in_tree": in_tree,
                         "out_tree": out_tree}, f)
        os.replace(tmp, path)
    except Exception as e:
        print(f"aot cache save failed ({type(e).__name__}: {e}); "
              "continuing uncached")
    return compiled
