"""Persistent XLA compilation cache (the reference JIT-builds CUDA extensions
into ~/.cache/paroquant/torch_extensions keyed by ABI, kernels/cuda/__init__.py:
11-21; the JAX equivalent is one config switch)."""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.path.expanduser("~/.cache/paroquant_tpu/jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("PAROQUANT_CACHE_DIR", _DEFAULT)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        # TPU backends only. On this box the CPU path can replay AOT cache
        # entries compiled with different host machine features (the loader
        # warns "could lead to execution errors such as SIGILL") — observed
        # as mid-suite segfaults; CPU compiles are fast enough uncached.
        # (config/env check, NOT jax.default_backend(): that would
        # initialize the backend before callers finish configuring it)
        plat = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
        if "cpu" in str(plat):
            return
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
