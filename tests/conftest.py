"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device tests use ``xla_force_host_platform_device_count`` instead of a
real TPU pod (SURVEY.md §4) — env vars must be set before jax import.
"""

import os

# Force CPU: the sandbox exports JAX_PLATFORMS=axon (the remote TPU
# tunnel), which must not capture unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags += " --xla_force_host_platform_device_count=8"
if "collective_timeout" not in xla_flags:
    # XLA:CPU's in-process collective rendezvous CHECK-aborts after ~40 s;
    # 8 partitions serialized on a 1-core host legitimately take longer
    xla_flags += " --xla_cpu_collective_timeout_seconds=900"
os.environ["XLA_FLAGS"] = xla_flags.strip()

import jax  # noqa: E402

# The sandbox's sitecustomize pins jax_platforms to the remote 'axon' TPU
# via jax.config (which wins over the env var) — override it back, or every
# unit test compiles through the network tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Synchronous dispatch: XLA:CPU's async executor runs SPMD partitions on a
# pool sized by the core count — on a 1-2 core box the 8-partition
# collective rendezvous starves and CHECK-fails (hard abort, not a Python
# error).  Inline execution completes collectives immediately.
jax.config.update("jax_cpu_enable_async_dispatch", False)

# Persist compiled executables across test runs: model compiles dominate
# the suite's wall clock; a warm cache cuts reruns from ~20 min to ~2.
from cnrma_tpu.utils.comp_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(min_compile_secs=5.0)
