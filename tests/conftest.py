import os

# Persistent compilation cache: the scan'd integrator takes minutes to
# compile; cache across pytest processes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tracer-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware (SURVEY.md §4.4). NOTE: the JAX_PLATFORMS env var is
# ignored by this environment's TPU plugin — jax.config.update is the only
# reliable way to force the CPU backend, and XLA_FLAGS must be set before
# the backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
