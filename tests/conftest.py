"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a fake CPU mesh
(``--xla_force_host_platform_device_count=8``), matching the driver's
multichip dryrun mechanism; benches run on the real chip separately.

The environment's axon sitecustomize pins JAX_PLATFORMS=axon at interpreter
start; ``jax.config.update`` below overrides it before any backend is
initialized. Set DIFUSCO_TPU_TESTS_ON_TPU=1 to run tests on the real chip.
"""

import os

if os.environ.get("DIFUSCO_TPU_TESTS_ON_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
