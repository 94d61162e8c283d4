"""difusco_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for graph-based
denoising-diffusion solvers for combinatorial optimization.

Re-designed from scratch against the capabilities of the DIFUSCO reference
(Edward-Sun/DIFUSCO, arXiv:2302.08224): TSP and MIS solvers driven by Gaussian
or categorical (Bernoulli) diffusion over graph edge/node labels, an
anisotropic edge-gated graph convnet denoiser, and a decoding stack of greedy
merge -> 2-opt -> optional MCTS refinement.

Design stance (TPU-first, not a port):
- all schedule constants are precomputed device arrays closed over by jitted
  step functions; the full denoise trajectory is one ``lax.scan``
- sparse graphs use a fixed-degree (V, k) neighbor layout: message passing is
  pure gather + reduce over the k axis (no scatter), which maps onto the TPU
  VPU/MXU without torch_sparse-style COO bookkeeping
- parallel diffusion sampling is the primary sharded axis over a device mesh
- decoders (greedy merge, 2-opt, MIS greedy) run on-device as
  ``lax.while_loop``s; C++ equivalents are provided for CPU-offload parity
"""

__version__ = "0.1.0"

from difusco_tpu import config as config  # noqa: F401
from difusco_tpu import diffusion as diffusion  # noqa: F401
