"""Robust TPU kernel timing + butterfly-kernel A/B diagnosis.

min-of-reps at 3 chain lengths, least-squares slope.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paroquant_tpu.kernels.rot_matmul import (
    _kernel, butterfly_w4_matmul, rot_w4_matmul, w4_matmul,
)
from paroquant_tpu.ops import butterfly as bf
from paroquant_tpu.ops.packing import pack_w4_tpu

NS = (8, 40, 72)
REPS = 5


def slope_time(make_chained, label, nbytes):
    pts = []
    for n in NS:
        f = make_chained(n)
        np.asarray(jax.block_until_ready(f()))
        best = 1e9
        for _ in range(REPS):
            t0 = time.perf_counter()
            r = f()
            np.asarray(jax.block_until_ready(r))
            best = min(best, time.perf_counter() - t0)
        pts.append((n, best))
    ns = np.array([p[0] for p in pts], float)
    ts = np.array([p[1] for p in pts], float)
    per = float(np.polyfit(ns, ts, 1)[0])
    gbps = nbytes / per / 1e9
    print(f"{label:<22}{per*1e6:>9.1f}us {gbps:>8.0f} GB/s ({100*gbps/819:.0f}% SoL)", flush=True)
    return per


def main():
    M, I, O, K, GS = 1, 4096, 4096, 8, 128
    G = I // GS
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    qweight = jnp.asarray(pack_w4_tpu(q, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)), jnp.uint8)
    inv_s = jnp.asarray(rng.uniform(0.5, 2.0, I), jnp.float32)
    theta = rng.normal(0, 0.3, (K, I // 2)).astype(np.float32)
    cos_t, sin_t = (jnp.asarray(a) for a in bf.butterfly_tables(theta, GS))
    rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.bfloat16)
    rot_f32 = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.float32)
    scales_f32 = scales.astype(jnp.float32)
    zeros_f32 = zeros.astype(jnp.float32)
    w_dense = jnp.asarray(rng.normal(size=(I, O)), jnp.bfloat16)

    def chain(step):
        def make(n):
            @jax.jit
            def f():
                def body(i, xv):
                    return (step(xv)[:, :I] * 0.01).astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x)
            return f
        return make

    w4_bytes = I * O // 2 + G * O * 3
    w4_bytes_f32 = I * O // 2 + 2 * G * O * 4
    slope_time(chain(lambda xv: jnp.dot(xv, w_dense, preferred_element_type=jnp.float32)),
               "xla_bf16_dense", I * O * 2)
    slope_time(chain(lambda xv: w4_matmul(xv, qweight, scales, zeros)), "w4_matmul", w4_bytes)
    slope_time(chain(lambda xv: w4_matmul(xv, qweight, scales_f32, zeros_f32)),
               "w4_matmul (f32 s/z)", w4_bytes_f32)
    slope_time(chain(lambda xv: rot_w4_matmul(xv, rot, qweight, scales, zeros)),
               "dense_rot_w4 (bf16)", w4_bytes + G * GS * GS * 2)
    slope_time(chain(lambda xv: rot_w4_matmul(xv, rot_f32, qweight, scales_f32, zeros_f32)),
               "dense_rot_w4 (f32)", w4_bytes_f32 + G * GS * GS * 4)
    slope_time(chain(lambda xv: butterfly_w4_matmul(xv, inv_s, cos_t, sin_t, qweight, scales, zeros)),
               "butterfly_w4 (K=8)", w4_bytes + 2 * K * I * 4)

    # A/B: butterfly with fewer stages to isolate the roll cost
    for k_ab in (1, 2, 4):
        th = theta[:k_ab]
        c2, s2 = (jnp.asarray(a) for a in bf.butterfly_tables(th, GS))
        slope_time(
            chain(lambda xv, c2=c2, s2=s2: butterfly_w4_matmul(
                xv, inv_s, c2, s2, qweight, scales, zeros)),
            f"butterfly_w4 (K={k_ab})", w4_bytes,
        )


if __name__ == "__main__" and "--two-op" not in sys.argv and "--mg" not in sys.argv:
    main()


def bench_two_op():
    """Alternative decode path: rotation as ONE XLA block-diag einsum, then
    the plain w4 kernel — vs the single fused dense-rot kernel."""
    import jax
    from paroquant_tpu.ops.rotation import apply_rotation_matrices

    M, I, O, GS = 1, 4096, 4096, 128
    G = I // GS
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    qweight = jnp.asarray(pack_w4_tpu(q, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)), jnp.uint8)
    rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.bfloat16)

    def chain(step):
        def make(n):
            @jax.jit
            def f():
                def body(i, xv):
                    return (step(xv)[:, :I] * 0.01).astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x)
            return f
        return make

    w4_bytes = I * O // 2 + G * O * 3 + G * GS * GS * 2

    def two_op(xv):
        xg = xv.reshape(M, G, GS)
        xr = jnp.einsum("gij,bgj->bgi", rot, xg,
                        preferred_element_type=jnp.float32).reshape(M, I)
        return w4_matmul(xr.astype(jnp.bfloat16), qweight, scales, zeros)

    slope_time(chain(two_op), "rot_einsum + w4", w4_bytes)
    slope_time(chain(lambda xv: rot_w4_matmul(xv, rot, qweight, scales, zeros)),
               "fused dense_rot", w4_bytes)


if __name__ == "__main__" and "--two-op" in sys.argv:
    bench_two_op()


def bench_mg():
    from paroquant_tpu.kernels.rot_matmul import rot_w4_matmul_mg

    M, I, O, GS = 1, 4096, 4096, 128
    G = I // GS
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    qweight = jnp.asarray(pack_w4_tpu(q, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)).astype(np.float32), jnp.bfloat16)
    rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.bfloat16)

    def chain(step):
        def make(n):
            @jax.jit
            def f():
                def body(i, xv):
                    return (step(xv)[:, :I] * 0.01).astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x)
            return f
        return make

    nbytes = I * O // 2 + G * O * 4 + G * GS * GS * 2
    import jax
    for gb in (16, 32):
        slope_time(
            chain(lambda xv, gb=gb: rot_w4_matmul_mg(
                xv, rot, qweight, scales, zeros, groups_per_step=gb)),
            f"mg dense_rot Gb={gb}", nbytes,
        )
    slope_time(chain(lambda xv: rot_w4_matmul(xv, rot, qweight, scales, zeros)),
               "old fused dense_rot", nbytes)
    slope_time(chain(lambda xv: w4_matmul(xv, qweight, scales, zeros)),
               "w4 (no rot)", I * O // 2 + G * O * 4)


if __name__ == "__main__" and "--mg" in sys.argv:
    bench_mg()
