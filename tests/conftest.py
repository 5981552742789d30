"""Test configuration: run JAX on CPU with 8 virtual devices.

Executes before any test module imports jax.  Tests exercise
float64/complex128 paths (verification tolerances) and multi-device
sharding on a virtual CPU mesh; the environment may pin an accelerator
platform (e.g. a tunneled TPU), so force CPU both via env and via
``jax.config`` (the platform plugin's sitecustomize overrides the env).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the sharded/shard_map programs take tens of
# seconds each to build even on CPU; repeat test runs should not pay
# them again
jax.config.update("jax_compilation_cache_dir", "/tmp/pyfem_jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
