"""Test harness config: force an 8-device virtual CPU mesh + float64.

Must run before jax initializes (pytest imports conftest first). The reference
runs float64 end-to-end on CPU (train_tactile_push_gd.py:13); enabling x64
here lets the gradient-fidelity tests use tight tolerances. Multi-chip
sharding tests use the 8 virtual devices (SURVEY.md §4 implication).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: the axon TPU tunnel overrides the JAX_PLATFORMS env var, so the env
# var alone is not enough — the config update below is what actually pins the
# test suite to the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# XLA CPU compile times are superlinear in graph size; the persistent cache
# makes repeated test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ROOT = "/root/reference"


def reference_scene(rel):
    return os.path.join(REFERENCE_ROOT, rel)
