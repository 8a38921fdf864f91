"""Platform selection helpers.

The axon boot shim imports jax at interpreter startup with JAX_PLATFORMS
pinned to the TPU plugin, so env-var overrides don't work; use
jax.config.update before first backend use instead. Host-side tooling
(conversion, packing) runs orders of magnitude faster on the CPU backend
than eager-dispatching per-op over the TPU relay.
"""

from __future__ import annotations


def force_platform(name: str) -> None:
    """name: 'cpu' | 'tpu' | 'auto'. Must be called before first device use."""
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    if name == "auto":
        return
    import jax

    # keep the cpu backend alongside the TPU plugin: host-side staging
    # (param init, packing) uses jax.local_devices(backend="cpu")
    target = {"tpu": "axon,cpu", "cpu": "cpu"}.get(name, name)
    try:
        jax.config.update("jax_platforms", target)
    except Exception as e:
        print(f"warning: could not switch platform to {name}: {e}")
