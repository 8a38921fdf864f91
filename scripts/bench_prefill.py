"""Prefill-shape (M=512) comparison: fused kernel vs XLA dequant path vs bf16."""

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

from paroquant_tpu.kernels.rot_matmul import rot_w4_matmul
from paroquant_tpu.ops.packing import pack_w4_tpu
from paroquant_tpu.ops.qlinear import make_quantized_linear, quantized_linear_forward
from paroquant_tpu.ops.rotation import make_rotation_params

NS = (16, 128)
REPS = 4


def slope_time(make_chained, label, flops):
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
        pts.append(best)
    per = (pts[1] - pts[0]) / (NS[1] - NS[0])
    print(f"{label:<26}{per*1e6:>9.1f}us {flops/per/1e12:>6.1f} TFLOP/s", flush=True)


def main():
    M, I, O, GS, K = 512, 4096, 4096, 128, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    w_dense = jnp.asarray(rng.normal(size=(I, O)), jnp.bfloat16)
    params = make_rotation_params(I, GS, K, 0)
    theta = np.where(np.asarray(params.mask), 0, rng.normal(0, 0.2, params.theta.shape)).astype(np.float32)
    q = rng.integers(0, 16, size=(O, I), dtype=np.int32)
    sc = rng.uniform(0.01, 0.05, (O, I // GS)).astype(np.float32)
    zr = rng.integers(0, 16, (O, I // GS)).astype(np.float32)
    layer = make_quantized_linear(q, sc, zr, np.asarray(params.pairs), theta,
                                  np.ones(I, np.float32), GS)
    layer = jax.device_put(layer, jax.devices()[0])
    flops = 2 * M * I * O

    def chain(step):
        def make(n):
            @jax.jit
            def f():
                def body(i, xv):
                    return (step(xv)[:, :I] * 0.01).astype(x.dtype)
                return jax.lax.fori_loop(0, n, body, x)
            return f
        return make

    slope_time(chain(lambda xv: jnp.dot(xv, w_dense, preferred_element_type=jnp.float32)),
               "xla_bf16_dense", flops)
    slope_time(chain(lambda xv: quantized_linear_forward(layer, xv, mode="xla")),
               "w4 xla path", flops)
    slope_time(chain(lambda xv: rot_w4_matmul(xv, layer.rot, layer.qweight, layer.scales, layer.zeros)),
               "w4 fused kernel", flops)
    slope_time(chain(lambda xv: rot_w4_matmul(xv, layer.rot, layer.qweight, layer.scales, layer.zeros, block_m=256)),
               "w4 fused TM=256", flops)


if __name__ == "__main__":
    main()
