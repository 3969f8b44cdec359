"""Test configuration: CPU backend with 8 virtual devices + f64.

Parity tests (the 1e-10 acceptance bar, BASELINE.md) need f64, which TPUs
lack natively — so the suite runs on the CPU backend with x64 enabled, and
multi-chip sharding tests use xla_force_host_platform_device_count=8
(SURVEY.md §4 "Implication for the TPU build" (d)).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS is ignored by this machine's 'axon' TPU
# plugin — only the config update reliably forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# single-core container: persistent compile cache makes re-runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
