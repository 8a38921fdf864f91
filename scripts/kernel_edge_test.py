"""Experiment: M=1 fused-kernel overhead — HLO pad/slice/convert vs
in-kernel ragged-M handling + scratch accumulator with dtype-native store.

Hypothesis (from kernel_dispatch.py): fused M=1 is 31.5us while M=16 is
15.1us with IDENTICAL weight traffic and the same TM=16 block — the gap is
per-call overhead, largely the pad [1,I]->[16,I], the [:M] slice, and the
f32->bf16 convert, each a separate HLO thunk that cannot fuse into the
Pallas custom call. Variant B removes all three.
"""

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

from paroquant_tpu.kernels.rot_matmul import _row_select, _sublanes, rot_w4_matmul

NS = (8, 40)
REPS = 9


def _kernel_b(x_ref, rot_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref, *, n_g):
    g = pl.program_id(2)
    rot = rot_ref[0]
    x = x_ref[:].astype(rot.dtype)
    xr_f32 = jax.lax.dot_general(
        x, rot, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    xr = xr_f32.astype(jnp.bfloat16)
    q = qw_ref[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.bfloat16)
    hi = (q >> 4).astype(jnp.bfloat16)
    w = jnp.concatenate([lo, hi], axis=0)
    s_row = _row_select(s_ref, g)
    z_row = _row_select(z_ref, g)
    acc = jnp.dot(xr, w, preferred_element_type=jnp.float32)
    xsum = jnp.sum(xr_f32, axis=1, keepdims=True)
    contrib = (acc - xsum * z_row) * s_row

    @pl.when(g == 0)
    def _init():
        acc_ref[:] = contrib

    @pl.when(g > 0)
    def _acc():
        acc_ref[:] = acc_ref[:] + contrib

    @pl.when(g == n_g - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def rot_w4_matmul_b(x, rot, qweight, scales, zeros, *, block_m=16):
    M, I = x.shape
    G, S, _ = rot.shape
    O = qweight.shape[1]
    TM = block_m
    SBs = _sublanes(scales.dtype, G)
    SBz = _sublanes(zeros.dtype, G)
    n_m = (M + TM - 1) // TM
    out = pl.pallas_call(
        functools.partial(_kernel_b, n_g=G),
        grid=(n_m, 1, G),
        in_specs=[
            pl.BlockSpec((TM, S), lambda i, o, g: (i, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S), lambda i, o, g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S // 2, O), lambda i, o, g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBs, O), lambda i, o, g: (g // SBs, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SBz, O), lambda i, o, g: (g // SBz, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, O), lambda i, o, g: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((TM, O), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * I * O + 2 * M * I * S,
            bytes_accessed=I * O // 2 + G * S * S * rot.dtype.itemsize
            + M * I * x.dtype.itemsize + M * O * x.dtype.itemsize
            + G * O * (scales.dtype.itemsize + zeros.dtype.itemsize),
            transcendentals=0,
        ),
    )(x, rot, qweight, scales, zeros)
    return out


def main():
    I = O = 4096
    GS = 128
    G = I // GS
    rng = np.random.default_rng(0)
    from paroquant_tpu.ops.packing import pack_w4_tpu

    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    qw = jnp.asarray(pack_w4_tpu(q, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)), jnp.bfloat16)
    rot = jnp.asarray(rng.normal(size=(G, GS, GS)) / np.sqrt(GS), jnp.bfloat16)

    for M in (1, 16):
        x0 = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
        # correctness first
        ya = np.asarray(rot_w4_matmul(x0, rot, qw, scales, zeros))
        yb = np.asarray(rot_w4_matmul_b(x0, rot, qw, scales, zeros))
        err = np.abs(ya - yb).max() / (np.abs(ya).max() + 1e-9)
        print(f"M={M} rel err a-vs-b: {err:.2e}", flush=True)
        assert err < 1e-2, err

        fns = {}
        for name, fn in (("a", rot_w4_matmul), ("b", rot_w4_matmul_b)):
            for n in NS:
                @jax.jit
                def f(n=n, fn=fn):
                    def body(i, xv):
                        y = fn(xv, rot, qw, scales, zeros)
                        return (y[:, :I] * 0.01).astype(xv.dtype)
                    return jax.lax.fori_loop(0, n, body, x0)
                np.asarray(jax.block_until_ready(f()))
                fns[(name, n)] = f
        best = {k: 1e9 for k in fns}
        for _ in range(REPS):
            for k, f in fns.items():
                t0 = time.perf_counter()
                jax.block_until_ready(f())
                best[k] = min(best[k], time.perf_counter() - t0)
        for name in ("a", "b"):
            t = (best[(name, NS[1])] - best[(name, NS[0])]) / (NS[1] - NS[0])
            print(f"M={M} variant {name}: {t*1e6:.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
