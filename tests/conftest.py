"""Test harness config: run on CPU with 8 virtual devices.

Multi-chip sharding (pjit/shard_map collectives) is validated on a virtual
CPU mesh, the standard JAX approach when pod hardware isn't attached.
"""

import os

# The axon boot shim exports JAX_PLATFORMS=axon; force-override (not
# setdefault) so the suite runs on the virtual CPU mesh, not the TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
# single-threaded Eigen keeps CPU matmul reduction order (and therefore
# greedy argmax on near-tie logits) deterministic run to run
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_multi_thread_eigen=false"
)
os.environ.setdefault("OMP_NUM_THREADS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# tests must not write the shared persistent compilation cache: concurrent
# writers (a TPU bench in another process) segfaulted the suite mid-run in
# jax's cache serializer, and tiny CPU compiles gain nothing from it
jax.config.update("jax_enable_compilation_cache", False)
