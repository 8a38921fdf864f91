"""Stall-robust TPU kernel timing: interleaved min-of-reps at two chain
lengths; slope from the min pair. Relay stalls inflate individual reps but
minima converge to the true device time."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.kernels.rot_matmul import (
    rot_w4_matmul, rot_w4_matmul_mg, w4_matmul,
)
from paroquant_tpu.ops.packing import pack_w4_tpu

N1, N2, REPS = 64, 512, 10


def make_chained(step, x, I, n):
    @jax.jit
    def f():
        def body(i, xv):
            return (step(xv)[:, :I] * 0.01).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return f


def bench_all(cases):
    fns = {}
    for label, step, x, I, nbytes in cases:
        fns[label] = (make_chained(step, x, I, N1), make_chained(step, x, I, N2), nbytes)
    # warmup / compile
    for label, (f1, f2, _) in fns.items():
        np.asarray(jax.block_until_ready(f1()))
        np.asarray(jax.block_until_ready(f2()))
        print(f"compiled {label}", flush=True)
    best = {label: [1e9, 1e9] for label in fns}
    for rep in range(REPS):
        for label, (f1, f2, _) in fns.items():
            for slot, f in ((0, f1), (1, f2)):
                t0 = time.perf_counter()
                np.asarray(jax.block_until_ready(f()))
                best[label][slot] = min(best[label][slot], time.perf_counter() - t0)
    for label, (f1, f2, nbytes) in fns.items():
        t1, t2 = best[label]
        per = (t2 - t1) / (N2 - N1)
        gbps = nbytes / per / 1e9
        print(f"{label:<26}{per*1e6:>9.2f}us {gbps:>8.0f} GB/s ({100*gbps/819:.0f}% SoL)")


def main():
    M, I, O, GS = 1, 4096, 4096, 128
    G = I // GS
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    qweight = jnp.asarray(pack_w4_tpu(rng.integers(0, 16, (I, O), dtype=np.int32), GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)).astype(np.float32), jnp.bfloat16)
    rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.bfloat16)
    w_dense = jnp.asarray(rng.normal(size=(I, O)), jnp.bfloat16)

    w4b = I * O // 2 + G * O * 4
    rotb = w4b + G * GS * GS * 2
    cases = [
        ("xla_bf16_dense",
         lambda xv: jnp.dot(xv, w_dense, preferred_element_type=jnp.float32),
         x, I, I * O * 2),
        ("w4 (no rot)", lambda xv: w4_matmul(xv, qweight, scales, zeros), x, I, w4b),
        ("fused dense_rot", lambda xv: rot_w4_matmul(xv, rot, qweight, scales, zeros),
         x, I, rotb),
        ("mg dense_rot Gb=16",
         lambda xv: rot_w4_matmul_mg(xv, rot, qweight, scales, zeros, groups_per_step=16),
         x, I, rotb),
        ("mg dense_rot Gb=32",
         lambda xv: rot_w4_matmul_mg(xv, rot, qweight, scales, zeros, groups_per_step=32),
         x, I, rotb),
    ]
    bench_all(cases)


if __name__ == "__main__":
    main()
