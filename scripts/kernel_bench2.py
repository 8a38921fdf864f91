"""Slope-based TPU kernel timing: time N-chained in-jit iterations for two N
values and take the slope, with full host fetch — immune to async-dispatch
and relay-latency artifacts.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.kernels.rot_matmul import butterfly_w4_matmul, rot_w4_matmul, w4_matmul
from paroquant_tpu.ops import butterfly as bf
from paroquant_tpu.ops.packing import pack_w4_tpu

N_LO, N_HI = 8, 72


def slope_time(make_chained, label, nbytes, flops=0):
    ts = {}
    for n in (N_LO, N_HI):
        f = make_chained(n)
        np.asarray(jax.block_until_ready(f()))  # compile+warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f()
        np.asarray(jax.block_until_ready(r))
        ts[n] = (time.perf_counter() - t0) / reps
    per = (ts[N_HI] - ts[N_LO]) / (N_HI - N_LO)
    gbps = nbytes / per / 1e9
    tflops = flops / per / 1e12
    print(
        f"{label:<18}{per*1e6:>9.1f}us {gbps:>8.0f} GB/s ({100*gbps/819:.0f}% SoL)"
        f"  {tflops:>6.1f} TF", flush=True,
    )
    return per


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    I = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    O = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    K, GS = 8, 128
    G = I // GS
    print(f"M={M} I={I} O={O}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    w_dense = jnp.asarray(rng.normal(size=(I, O)), jnp.bfloat16)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    qweight = jnp.asarray(pack_w4_tpu(q, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.float32)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)), jnp.float32)
    inv_s = jnp.asarray(rng.uniform(0.5, 2.0, I), jnp.float32)
    theta = rng.normal(0, 0.3, (K, I // 2)).astype(np.float32)
    cos_t, sin_t = (jnp.asarray(a) for a in bf.butterfly_tables(theta, GS))
    rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.float32)

    # Chain iterations through a REAL data dependence (output feeds the next
    # input, rescaled) so XLA cannot hoist the op out of the loop.
    assert O == I, "chained bench requires square shapes"

    def chain(step):
        def make(n):
            @jax.jit
            def f():
                def body(i, xv):
                    y = step(xv)
                    return (y[:, :I] * 0.01).astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x)
            return f
        return make

    w4_bytes = I * O // 2 + 2 * G * O * 4 + M * I * 2 + M * O * 4
    bf16_bytes = I * O * 2 + M * I * 2 + M * O * 2
    flops = 2 * M * I * O

    slope_time(
        chain(lambda xv: jnp.dot(xv, w_dense, preferred_element_type=jnp.float32)),
        "xla_bf16_dense", bf16_bytes, flops,
    )
    slope_time(chain(lambda xv: w4_matmul(xv, qweight, scales, zeros)),
               "w4_matmul", w4_bytes, flops)
    slope_time(
        chain(lambda xv: butterfly_w4_matmul(xv, inv_s, cos_t, sin_t, qweight, scales, zeros)),
        "butterfly_w4", w4_bytes + 2 * K * I * 4, flops,
    )
    slope_time(
        chain(lambda xv: rot_w4_matmul(xv, rot, qweight, scales, zeros)),
        "dense_rot_w4", w4_bytes + G * GS * GS * 4, flops,
    )


if __name__ == "__main__":
    main()
