"""Measure fused-Pallas vs XLA-dequant quantized matmul across prefill M.

Resolves VERDICT round-1 weak item 8 / STATUS gap "per-M fused/xla dispatch":
for each token count M, time both paths on a 4096x4096 g128 layer and print
per-call time. Methodology (see memory: axon relay has multi-x wall-clock
drift windows): chained in-jit iterations at two lengths, slope for per-iter
time, and the four (mode, n) variants of one M are timed INTERLEAVED
round-robin with min-of-reps per variant, so a drift window hits all
variants equally instead of poisoning one slope endpoint.

The winner table feeds AUTO_FUSED_MAX_M in ops/qlinear.py (mode="auto").
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from paroquant_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.ops.qlinear import QuantizedLinear, quantized_linear_forward

import os

NS = (8, 40)
REPS = int(os.environ.get("DISPATCH_REPS", "9"))
MS = tuple(
    int(m) for m in os.environ.get("DISPATCH_MS", "1,16,64,128,256,512,1024,2048").split(",")
)


def make_layer(I=4096, O=4096, GS=128):
    from paroquant_tpu.ops.packing import pack_w4_tpu

    G = I // GS
    rng = np.random.default_rng(0)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    return QuantizedLinear(
        qweight=jnp.asarray(pack_w4_tpu(q, GS)),
        scales=jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16),
        zeros=jnp.asarray(rng.integers(0, 16, (G, O)), jnp.bfloat16),
        rot=jnp.asarray(rng.normal(size=(G, GS, GS)) / np.sqrt(GS), jnp.bfloat16),
        bias=None,
    )


def main():
    layer = make_layer()
    I = 4096
    rng = np.random.default_rng(1)
    print(f"{'M':>6} {'fused us':>10} {'xla us':>10}  winner", flush=True)
    for M in MS:
        x0 = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)

        fns = {}
        for mode in ("fused", "xla"):
            for n in NS:
                @jax.jit
                def f(n=n, mode=mode):
                    def body(i, xv):
                        y = quantized_linear_forward(layer, xv, mode=mode)
                        return (y[:, :I] * 0.01).astype(xv.dtype)
                    return jax.lax.fori_loop(0, n, body, x0)
                np.asarray(jax.block_until_ready(f()))  # compile + warm
                fns[(mode, n)] = f

        best = {k: 1e9 for k in fns}
        for _ in range(REPS):  # interleaved: one timing of each per sweep
            for k, f in fns.items():
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                best[k] = min(best[k], time.perf_counter() - t0)

        times = {}
        for mode in ("fused", "xla"):
            times[mode] = (best[(mode, NS[1])] - best[(mode, NS[0])]) / (NS[1] - NS[0])
        w = "fused" if times["fused"] <= times["xla"] else "xla"
        print(f"{M:>6} {times['fused']*1e6:>10.1f} {times['xla']*1e6:>10.1f}  {w}",
              flush=True)


if __name__ == "__main__":
    main()
