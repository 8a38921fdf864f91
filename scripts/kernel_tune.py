"""Tuning experiments for the dense-rot fused kernel on the real chip."""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from paroquant_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paroquant_tpu.kernels.rot_matmul import rot_w4_matmul
from paroquant_tpu.ops.packing import pack_w4_tpu

NS = (64, 512)
REPS = 4


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
        pts.append(best)
    per = (pts[1] - pts[0]) / (NS[1] - NS[0])
    print(f"{label:<28}{per*1e6:>8.1f}us {nbytes/per/1e9:>7.0f} GB/s", flush=True)
    return per


# --- variant kernel: bf16 rot, f16 scales, u8 zeros, tunable TM, semantics ---

def _kernel_v2(x_ref, rot_ref, qw_ref, s_ref, z_ref, o_ref, *, out_dtype):
    g = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    rot = rot_ref[0]
    xr_f32 = jax.lax.dot_general(
        x, rot.astype(jnp.float32), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xr = xr_f32.astype(jnp.bfloat16)
    xsum = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
    q = qw_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.bfloat16)
    hi = ((q >> 4) & 0xF).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=0)
    acc = jnp.dot(xr, w, preferred_element_type=jnp.float32)
    row = jax.lax.rem(g, s_ref.shape[0])
    s = s_ref[pl.ds(row, 1), :]
    z = z_ref[pl.ds(row, 1), :]
    contrib = (acc - xsum * z) * s

    @pl.when(g == 0)
    def _():
        o_ref[:] = contrib.astype(out_dtype)

    @pl.when(g > 0)
    def _():
        o_ref[:] = o_ref[:] + contrib.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "semantics"))
def rot_w4_matmul_v2(x, rot, qweight, scales_f16, zeros_u8, *, block_m=8,
                     semantics=False):
    M, I = x.shape
    G, S, _ = rot.shape
    O = qweight.shape[1]
    TM = block_m
    m_pad = -M % TM
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad
    SB = 8 if G >= 8 else G
    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        )
    return pl.pallas_call(
        functools.partial(_kernel_v2, out_dtype=jnp.float32),
        grid=(Mp // TM, G),
        in_specs=[
            pl.BlockSpec((TM, S), lambda i, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S), lambda i, g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S // 2, O), lambda i, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, O), lambda i, g: (g // SB, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, O), lambda i, g: (g // SB, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, O), jnp.float32),
        **params,
    )(x, rot, qweight, scales_f16, zeros_u8)[:M]


def main():
    M, I, O, GS = 1, 4096, 4096, 128
    G = I // GS
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(size=(M, I)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    qweight = jnp.asarray(pack_w4_tpu(q, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.float32)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)), jnp.float32)
    rot32 = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.float32)
    rot16 = rot32.astype(jnp.bfloat16)
    s16 = scales.astype(jnp.float16)
    z8 = zeros.astype(jnp.uint8)

    def chain(step):
        def make(n):
            @jax.jit
            def f():
                def body(i, xv):
                    return (step(xv)[:, :I] * 0.01).astype(x16.dtype)
                return jax.lax.fori_loop(0, n, body, x16)
            return f
        return make

    base_bytes = I * O // 2 + 2 * G * O * 4 + G * GS * GS * 4
    v2_bytes = I * O // 2 + G * O * 3 + G * GS * GS * 2

    v2f_bytes = I * O // 2 + 2 * G * O * 4 + G * GS * GS * 2
    slope_time(chain(lambda xv: rot_w4_matmul_v2(xv, rot16, qweight, scales, zeros, block_m=16)),
               "v2 bf16rot TM16", v2f_bytes)
    slope_time(chain(lambda xv: rot_w4_matmul_v2(xv, rot16, qweight, scales, zeros, block_m=8)),
               "v2 bf16rot TM8", v2f_bytes)
    slope_time(chain(lambda xv: rot_w4_matmul_v2(xv, rot16, qweight, scales, zeros, block_m=16, semantics=True)),
               "v2 bf16rot TM16 +sem", v2f_bytes)


if __name__ == "__main__":
    main()
