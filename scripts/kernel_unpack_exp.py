"""Unpack-cost experiments for the W4 GEMV kernel (M=1 decode).

The uint8 kernels are VPU-compute-bound on the nibble unpack chain
(~0.5us/grid-step at O=4096 vs ~0.32us of DMA), capping the fused kernel at
~38% of HBM speed-of-light while a plain jnp.sum stream hits ~100%
(scripts -> STATUS round 2). Variants measured here:

1. stream-only kernel: same grid/blocks, minimal reduce — Mosaic streaming
   ceiling for this layout.
2. current w4_matmul (uint8 half-split, int32 mask/shift unpack) — baseline.
3. bitcast-u4 kernel: weights packed with nibbles interleaved across OUTPUT
   column pairs (byte -> (o, o+1)), so an in-kernel bitcast u8->u4 + reshape
   is layout-exact and the u4->bf16 cast does the unpack in hardware. HBM
   still carries uint8 (the axon relay cannot ship uint4 host buffers).
4. mulfloor kernel: unpack in bf16 arithmetic (hi = floor(q/16), lo = q-16*hi,
   both exact in bf16 for q in [0,255]) — avoids the int32 widening.

Run on the real chip: python scripts/kernel_unpack_exp.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paroquant_tpu.kernels.rot_matmul import _dequant_contrib, _sublanes, w4_matmul
from paroquant_tpu.ops.packing import pack_w4_tpu

N1, N2, REPS = 64, 512, 10


# --- 1. stream-only ---------------------------------------------------------


def _kernel_stream(x_ref, qw_ref, o_ref):
    g = pl.program_id(1)
    # touch every byte with the cheapest possible reduce: one sublane row.
    # The x term makes the output depend on x so the chained-timing loop
    # cannot hoist the kernel as loop-invariant.
    # Mosaic has no direct u8->f32 cast; route through int32
    row = qw_ref[0:1, :].astype(jnp.int32).astype(jnp.float32) + x_ref[0:1, 0:1].astype(
        jnp.float32
    )

    @pl.when(g == 0)
    def _():
        o_ref[:] = row

    @pl.when(g > 0)
    def _():
        o_ref[:] = o_ref[:] + row


@functools.partial(jax.jit, static_argnames=("group_size", "groups_per_step"))
def stream_only(x, qweight, *, group_size=128, groups_per_step=1):
    M, I = x.shape
    O = qweight.shape[1]
    G = I // group_size
    Gb = groups_per_step
    return pl.pallas_call(
        _kernel_stream,
        grid=(1, G // Gb),
        in_specs=[
            pl.BlockSpec((16, group_size), lambda i, g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (Gb * group_size // 2, O), lambda i, g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, O), lambda i, g: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
    )(jnp.pad(x, ((0, 16 - M), (0, 0))), qweight)


# --- 3. bitcast-u4 ----------------------------------------------------------


def pack_w4_opair(q: np.ndarray, group_size: int = 128) -> np.ndarray:
    """[I, O] int4 values -> uint8 [I, O//2]: byte (i, j) holds columns
    (2j, 2j+1) as (lo, hi) nibbles, matching bitcast u8->u4 minor order."""
    lo = q[:, 0::2].astype(np.uint8)
    hi = q[:, 1::2].astype(np.uint8)
    return (lo | (hi << 4)).astype(np.uint8)


def _kernel_bitcast(x_ref, qw_ref, s_ref, z_ref, o_ref, *, out_dtype):
    g = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    xr = x.astype(jnp.bfloat16)
    xsum = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
    q8 = qw_ref[:]  # [S, O//2] uint8
    S, Oh = q8.shape
    q4 = jax.lax.bitcast_convert_type(q8, jnp.uint4)  # [S, O//2, 2]
    w = q4.reshape(S, Oh * 2).astype(jnp.bfloat16)
    acc = jnp.dot(xr, w, preferred_element_type=jnp.float32)
    contrib = _dequant_contrib(acc, xsum, s_ref, z_ref, g)

    @pl.when(g == 0)
    def _():
        o_ref[:] = contrib.astype(out_dtype)

    @pl.when(g > 0)
    def _():
        o_ref[:] = o_ref[:] + contrib.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def w4_matmul_bitcast(x, qweight_opair, scales, zeros, *, group_size=128):
    M, I = x.shape
    Oh = qweight_opair.shape[1]
    O = Oh * 2
    G = I // group_size
    TM = 16
    xp = jnp.pad(x, ((0, -M % TM), (0, 0)))
    SBs = _sublanes(scales.dtype, G)
    SBz = _sublanes(zeros.dtype, G)
    out = pl.pallas_call(
        functools.partial(_kernel_bitcast, out_dtype=jnp.float32),
        grid=(xp.shape[0] // TM, G),
        in_specs=[
            pl.BlockSpec((TM, group_size), lambda i, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((group_size, Oh), lambda i, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBs, O), lambda i, g: (g // SBs, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBz, O), lambda i, g: (g // SBz, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], O), jnp.float32),
    )(xp, qweight_opair, scales, zeros)
    return out[:M].astype(x.dtype)


# --- 4. mul/floor unpack ----------------------------------------------------


def _kernel_mulfloor(x_ref, qw_ref, s_ref, z_ref, o_ref, *, out_dtype):
    g = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    xr = x.astype(jnp.bfloat16)
    xsum = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
    f = qw_ref[:].astype(jnp.int32).astype(jnp.bfloat16)  # exact for 0..255
    hi = jnp.floor(f * jnp.bfloat16(0.0625))  # exact: see module docstring
    lo = f - hi * jnp.bfloat16(16.0)
    S2 = f.shape[0]
    # split-dot avoids the [S, O] concat: y = x_lo @ lo + x_hi @ hi
    acc = jnp.dot(xr[:, :S2], lo, preferred_element_type=jnp.float32) + jnp.dot(
        xr[:, S2:], hi, preferred_element_type=jnp.float32
    )
    contrib = _dequant_contrib(acc, xsum, s_ref, z_ref, g)

    @pl.when(g == 0)
    def _():
        o_ref[:] = contrib.astype(out_dtype)

    @pl.when(g > 0)
    def _():
        o_ref[:] = o_ref[:] + contrib.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def w4_matmul_mulfloor(x, qweight, scales, zeros, *, group_size=128):
    M, I = x.shape
    O = qweight.shape[1]
    G = I // group_size
    TM = 16
    xp = jnp.pad(x, ((0, -M % TM), (0, 0)))
    SBs = _sublanes(scales.dtype, G)
    SBz = _sublanes(zeros.dtype, G)
    out = pl.pallas_call(
        functools.partial(_kernel_mulfloor, out_dtype=jnp.float32),
        grid=(xp.shape[0] // TM, G),
        in_specs=[
            pl.BlockSpec((TM, group_size), lambda i, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((group_size // 2, O), lambda i, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBs, O), lambda i, g: (g // SBs, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBz, O), lambda i, g: (g // SBz, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], O), jnp.float32),
    )(xp, qweight, scales, zeros)
    return out[:M].astype(x.dtype)


# --- 5. split-dot with int unpack (no concat) --------------------------------


def _kernel_splitdot(x_ref, qw_ref, s_ref, z_ref, o_ref, *, out_dtype):
    g = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    xr = x.astype(jnp.bfloat16)
    xsum = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
    q = qw_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.bfloat16)
    hi = ((q >> 4) & 0xF).astype(jnp.bfloat16)
    S2 = lo.shape[0]
    acc = jnp.dot(xr[:, :S2], lo, preferred_element_type=jnp.float32) + jnp.dot(
        xr[:, S2:], hi, preferred_element_type=jnp.float32
    )
    contrib = _dequant_contrib(acc, xsum, s_ref, z_ref, g)

    @pl.when(g == 0)
    def _():
        o_ref[:] = contrib.astype(out_dtype)

    @pl.when(g > 0)
    def _():
        o_ref[:] = o_ref[:] + contrib.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def w4_matmul_splitdot_ce(x, qweight, scales, zeros, *, group_size=128):
    """Same kernel as w4_matmul_splitdot but WITH the module kernels'
    pl.CostEstimate — isolates whether the cost hint changes scheduling."""
    M, I = x.shape
    O = qweight.shape[1]
    G = I // group_size
    TM = 16
    xp = jnp.pad(x, ((0, -M % TM), (0, 0)))
    SBs = _sublanes(scales.dtype, G)
    SBz = _sublanes(zeros.dtype, G)
    out = pl.pallas_call(
        functools.partial(_kernel_splitdot, out_dtype=jnp.float32),
        grid=(xp.shape[0] // TM, G),
        in_specs=[
            pl.BlockSpec((TM, group_size), lambda i, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((group_size // 2, O), lambda i, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBs, O), lambda i, g: (g // SBs, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBz, O), lambda i, g: (g // SBz, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * xp.shape[0] * I * O,
            bytes_accessed=I * O // 2 + xp.shape[0] * I * x.dtype.itemsize
            + xp.shape[0] * O * 4
            + G * O * (scales.dtype.itemsize + zeros.dtype.itemsize),
            transcendentals=0,
        ),
    )(xp, qweight, scales, zeros)
    return out[:M].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def w4_matmul_splitdot(x, qweight, scales, zeros, *, group_size=128):
    M, I = x.shape
    O = qweight.shape[1]
    G = I // group_size
    TM = 16
    xp = jnp.pad(x, ((0, -M % TM), (0, 0)))
    SBs = _sublanes(scales.dtype, G)
    SBz = _sublanes(zeros.dtype, G)
    out = pl.pallas_call(
        functools.partial(_kernel_splitdot, out_dtype=jnp.float32),
        grid=(xp.shape[0] // TM, G),
        in_specs=[
            pl.BlockSpec((TM, group_size), lambda i, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((group_size // 2, O), lambda i, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBs, O), lambda i, g: (g // SBs, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBz, O), lambda i, g: (g // SBz, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], O), jnp.float32),
    )(xp, qweight, scales, zeros)
    return out[:M].astype(x.dtype)


# --- 6. 8-bit unpack: u8 bitwise -> i8 bitcast -> bf16 (no int32 widening) ---


def _kernel_i8(x_ref, qw_ref, s_ref, z_ref, o_ref, *, out_dtype):
    g = pl.program_id(1)
    x = x_ref[:].astype(jnp.float32)
    xr = x.astype(jnp.bfloat16)
    xsum = jnp.sum(xr.astype(jnp.float32), axis=1, keepdims=True)
    q = qw_ref[:]  # uint8
    lo = jax.lax.bitcast_convert_type(q & jnp.uint8(0xF), jnp.int8).astype(jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(q >> 4, jnp.int8).astype(jnp.bfloat16)
    S2 = lo.shape[0]
    acc = jnp.dot(xr[:, :S2], lo, preferred_element_type=jnp.float32) + jnp.dot(
        xr[:, S2:], hi, preferred_element_type=jnp.float32
    )
    contrib = _dequant_contrib(acc, xsum, s_ref, z_ref, g)

    @pl.when(g == 0)
    def _():
        o_ref[:] = contrib.astype(out_dtype)

    @pl.when(g > 0)
    def _():
        o_ref[:] = o_ref[:] + contrib.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size",))
def w4_matmul_i8(x, qweight, scales, zeros, *, group_size=128):
    M, I = x.shape
    O = qweight.shape[1]
    G = I // group_size
    TM = 16
    xp = jnp.pad(x, ((0, -M % TM), (0, 0)))
    SBs = _sublanes(scales.dtype, G)
    SBz = _sublanes(zeros.dtype, G)
    out = pl.pallas_call(
        functools.partial(_kernel_i8, out_dtype=jnp.float32),
        grid=(xp.shape[0] // TM, G),
        in_specs=[
            pl.BlockSpec((TM, group_size), lambda i, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((group_size // 2, O), lambda i, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBs, O), lambda i, g: (g // SBs, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBz, O), lambda i, g: (g // SBz, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], O), jnp.float32),
    )(xp, qweight, scales, zeros)
    return out[:M].astype(x.dtype)


# --- harness (kernel_bench4 methodology) ------------------------------------


def make_chained(step, x, I, n):
    @jax.jit
    def f():
        def body(i, xv):
            return (step(xv)[:, :I] * 0.01).astype(x.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    return f


def main():
    M, I, O, GS = 1, 4096, 4096, 128
    G = I // GS
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    qint = rng.integers(0, 16, (I, O), dtype=np.int32)
    qweight = jnp.asarray(pack_w4_tpu(qint, GS))
    q_opair = jnp.asarray(pack_w4_opair(qint, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)).astype(np.float32), jnp.bfloat16)

    # correctness: all variants must agree with the baseline kernel
    base = np.asarray(w4_matmul(x, qweight, scales, zeros))
    for name, fn in (
        ("splitdot", lambda: w4_matmul_splitdot(x, qweight, scales, zeros)),
    ):
        try:
            got = np.asarray(fn())
            err = float(np.max(np.abs(got - base)) / (np.max(np.abs(base)) + 1e-9))
            print(f"{name}: max rel err vs baseline {err:.2e}")
        except Exception as e:
            print(f"{name}: FAILED to run: {type(e).__name__}: {e}")

    from paroquant_tpu.kernels.rot_matmul import rot_w4_matmul

    rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.bfloat16)
    w4b = I * O // 2 + G * O * 4
    rotb = w4b + G * GS * GS * 2
    cases = [
        ("stream Gb=1", lambda xv: stream_only(xv, qweight)[:1, :I], x, I, I * O // 2),
        ("w4 uint8 (baseline)", lambda xv: w4_matmul(xv, qweight, scales, zeros), x, I, w4b),
        ("w4 splitdot", lambda xv: w4_matmul_splitdot(xv, qweight, scales, zeros), x, I, w4b),
        ("w4 splitdot+CE", lambda xv: w4_matmul_splitdot_ce(xv, qweight, scales, zeros),
         x, I, w4b),
        ("w4 bitcast-u4", lambda xv: w4_matmul_bitcast(xv, q_opair, scales, zeros),
         x, I, w4b),
        ("w4 mulfloor", lambda xv: w4_matmul_mulfloor(xv, qweight, scales, zeros),
         x, I, w4b),
        ("w4 i8-bitcast", lambda xv: w4_matmul_i8(xv, qweight, scales, zeros),
         x, I, w4b),
        ("rot dense (prod)", lambda xv: rot_w4_matmul(xv, rot, qweight, scales, zeros),
         x, I, rotb),
    ]
    fns = {}
    for label, step, xv, Iv, nbytes in cases:
        try:
            f1, f2 = make_chained(step, xv, Iv, N1), make_chained(step, xv, Iv, N2)
            np.asarray(jax.block_until_ready(f1()))
            np.asarray(jax.block_until_ready(f2()))
            fns[label] = (f1, f2, nbytes)
            print(f"compiled {label}", flush=True)
        except Exception as e:
            print(f"{label}: compile FAILED: {type(e).__name__}: {e}")
    best = {label: [1e9, 1e9] for label in fns}
    for _ in range(REPS):
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


if __name__ == "__main__":
    main()
