"""W4A8 GEMV experiment: int8 MXU dot for the W4 decode kernel.

STATUS.md round-3 bytes accounting concluded the Mosaic-legal int32-widen
nibble unpack bounds the W4A16 GEMV at ~50% of weight-read SoL, and named
"an int8 MXU dot path" the remaining route. scripts/kernel_int8_probe.py
verified all three gating ops are legal on this target (int32->int8 cast,
int8xint8->int32 MXU dot, fused u8-unpack -> int8 dot).

This experiment builds the full W4A8 group-loop kernel with the SAME grid,
block specs, and zero-point decomposition as the production _kernel_plain
(kernels/rot_matmul.py:303) and A/Bs it on-device:

  per grid step (i, g):
    sx   = max|x_g| / 127 per row                (per-token-per-group act scale)
    xq   = round(x_g / sx)   int8                 (VPU, [TM, 128] — tiny)
    q8   = nibble-unpack(qw) int8                 (int32 mask/shift -> int8 cast)
    dot  = xq @ q8 -> int32                       (MXU int8 path, 2x bf16 TOPS)
    y_g  = (dot - z_g * rowsum(xq)) * (s_g * sx)  (f32 VPU epilogue)

Numerics: weights are EXACT in the dot (q in [0,15], z in [0,15] both int);
the only new error vs the production W4A16 kernel is int8 rounding of the
bf16 activations (per-group dynamic scale). The script reports max rel
error vs the f32 dequant reference alongside timing.

Protocol: interleaved best-of-reps (kernel_bench4 methodology), production
w4_matmul as the control arm in the same process.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from paroquant_tpu.kernels.rot_matmul import w4_matmul, _sublanes, _row_select  # noqa: E402


def _w4a8_kernel(x_ref, qw_ref, s_ref, z_ref, o_ref, *, out_dtype):
    g = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)  # [TM, GS]
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # [TM, 1]
    sx = jnp.where(amax > 0, amax / 127.0, 1.0)
    xq_i32 = jnp.round(x / sx).astype(jnp.int32)
    xq = xq_i32.astype(jnp.int8)
    xqsum = jnp.sum(xq_i32, axis=1, keepdims=True).astype(jnp.float32)  # [TM, 1]

    q = qw_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.int8)
    hi = ((q >> 4) & 0xF).astype(jnp.int8)
    dot = jax.lax.dot_general(
        xq, jnp.concatenate([lo, hi], axis=0),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # [TM, O]

    s = _row_select(s_ref, g)  # [1, O] f32
    z = _row_select(z_ref, g)
    contrib = (dot - xqsum * z) * (s * sx)

    @pl.when(g == 0)
    def _init():
        o_ref[:] = contrib.astype(out_dtype)

    @pl.when(g > 0)
    def _acc():
        o_ref[:] = o_ref[:] + contrib.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "block_m", "interpret"))
def w4a8_matmul(x, qweight, scales, zeros, *, group_size=128, block_m=None,
                interpret=False):
    M, I = x.shape
    O = qweight.shape[1]
    G = I // group_size
    if block_m is None:
        block_m = 128 if M >= 128 else 16
    TM = block_m
    m_pad = -M % TM
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = M + m_pad
    SBs = _sublanes(scales.dtype, G)
    SBz = _sublanes(zeros.dtype, G)
    out = pl.pallas_call(
        functools.partial(_w4a8_kernel, out_dtype=jnp.float32),
        grid=(Mp // TM, G),
        in_specs=[
            pl.BlockSpec((TM, group_size), lambda i, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((group_size // 2, O), lambda i, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBs, O), lambda i, g: (g // SBs, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBz, O), lambda i, g: (g // SBz, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * I * O,
            bytes_accessed=I * O // 2 + Mp * I * x.dtype.itemsize + Mp * O * 4
            + G * O * (scales.dtype.itemsize + zeros.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qweight, scales, zeros)
    return out[:M].astype(x.dtype)


def _mk_case(rng, M, I, O, gs):
    G = I // gs
    qw = rng.integers(0, 256, (I // 2, O), dtype=np.uint8)
    scales = jnp.asarray(
        rng.random((G, O), dtype=np.float32) * 0.02 + 0.001, jnp.bfloat16)
    zeros = rng.integers(0, 16, (G, O)).astype(np.uint8)
    x = (rng.standard_normal((M, I)) * 0.5).astype(np.float32)
    return (jnp.asarray(x, jnp.bfloat16), jnp.asarray(qw), jnp.asarray(scales),
            jnp.asarray(zeros))


def _dequant_ref(qw, scales, zeros, I, gs):
    lo = (qw.astype(np.int32) & 15)
    hi = ((qw.astype(np.int32) >> 4) & 15)
    # PARO-TPU half-split layout: group g rows [g*gs/2:(g+1)*gs/2) hold
    # channels [g*gs, g*gs+64) in lo and [g*gs+64, (g+1)*gs) in hi
    G = I // gs
    w = np.zeros((I, qw.shape[1]), np.float32)
    for g in range(G):
        r0 = g * gs // 2
        w[g * gs: g * gs + gs // 2] = lo[r0: r0 + gs // 2]
        w[g * gs + gs // 2: (g + 1) * gs] = hi[r0: r0 + gs // 2]
    s = np.asarray(scales, np.float32)
    z = np.asarray(zeros, np.float32)
    for g in range(G):
        w[g * gs:(g + 1) * gs] = (w[g * gs:(g + 1) * gs] - z[g]) * s[g]
    return w


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    on_tpu = jax.devices()[0].platform != "cpu"

    # correctness at small shape (interpret on CPU, real kernel on TPU)
    M, I, O, gs = 4, 256, 512, 128
    x, qw, s, z = _mk_case(rng, M, I, O, gs)
    y8 = np.asarray(w4a8_matmul(x, qw, s, z, group_size=gs,
                                interpret=not on_tpu), np.float32)
    wref = _dequant_ref(np.asarray(qw), s, z, I, gs)
    yref = np.asarray(x, np.float32) @ wref
    rel = np.abs(y8 - yref) / (np.abs(yref).mean() + 1e-9)
    print(f"w4a8 vs f32-dequant: max rel err {rel.max():.4f} "
          f"mean {rel.mean():.5f} (int8 activation rounding)")

    if not on_tpu:
        print("CPU box: timing skipped")
        return

    # Chained-slope timing (kernel_bench4 methodology): N kernel steps inside
    # ONE jit'd fori_loop, slope between two chain lengths — relay dispatch
    # (~1.3ms/call, 50x the kernel) cancels. The first flat-loop version of
    # this script measured 6 GB/s on BOTH arms: pure dispatch, no signal.
    N1, N2, REPS = 64, 512, 8

    def chained(step, x, n):
        @jax.jit
        def f():
            def body(i, xv):
                return (step(xv) * 0.01).astype(x.dtype)
            return jax.lax.fori_loop(0, n, body, x)
        return f

    for M in (1, 8, 32):
        I = O = 4096
        x, qw, s, z = _mk_case(rng, M, I, O, gs)
        arms = {
            "w4a8": lambda xv: w4a8_matmul(xv, qw, s, z, group_size=gs),
            "w4a16": lambda xv: w4_matmul(xv, qw, s, z, group_size=gs),
        }
        fns = {k: (chained(f, x, N1), chained(f, x, N2)) for k, f in arms.items()}
        print(f"M={M}: compiling...", flush=True)
        for f1, f2 in fns.values():
            f1().block_until_ready()
            f2().block_until_ready()
        best = {k: [1e9, 1e9] for k in fns}
        for _ in range(REPS):
            for k, (f1, f2) in fns.items():
                for slot, f in ((0, f1), (1, f2)):
                    t0 = time.perf_counter()
                    f().block_until_ready()
                    best[k][slot] = min(best[k][slot], time.perf_counter() - t0)
        per = {k: (b[1] - b[0]) / (N2 - N1) for k, b in best.items()}
        bytes_w = I * O // 2
        print(
            f"M={M:3d}: w4a8 {per['w4a8']*1e6:7.1f}us "
            f"({bytes_w/per['w4a8']/1e9:5.0f} GB/s eff)"
            f"  vs w4a16 {per['w4a16']*1e6:7.1f}us "
            f"({bytes_w/per['w4a16']/1e9:5.0f} GB/s)"
            f"  speedup {per['w4a16']/per['w4a8']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
