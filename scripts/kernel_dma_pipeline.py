"""Manual double-buffered DMA W4 GEMV vs the auto-pipelined kernel.

Round-2 campaign (STATUS.md): the Pallas block-pipeline streams ~500-530
GB/s (61-65% of the 834 GB/s measured HBM BW), FLAT in block size — the
per-grid-step pipeline, not unpack compute, bounds the W4 GEMV. This
experiment hand-schedules the weight stream with pltpu.make_async_copy
double buffering inside ONE grid step (VERDICT r2 #2): the only per-chunk
cost is the DMA wait + compute, no grid bookkeeping. Dequant happens on
the weight in registers ((q - z) * s in bf16, like the mg kernel /
reference AWQ f16 dequant GEMMs).

Run on TPU:  python scripts/kernel_dma_pipeline.py --size 4096 --gb 4
CPU check:   python scripts/kernel_dma_pipeline.py --device cpu --interpret
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _kernel_dma(x_ref, rot_ref, s_ref, z_ref, qw_hbm, o_ref, *, G, S, Gb):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = x_ref.shape[0]
    O = qw_hbm.shape[1]
    rows = Gb * S // 2  # u8 rows per chunk
    n_chunks = G // Gb

    def body(acc_ref, scratch, sem):
        def get_dma(slot, idx):
            return pltpu.make_async_copy(
                qw_hbm.at[pl.ds(idx * rows, rows)], scratch.at[slot], sem.at[slot]
            )

        get_dma(0, 0).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def loop(ci, _):
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

            get_dma(slot, ci).wait()
            q = scratch[slot].astype(jnp.int32).reshape(Gb, S // 2, O)
            lo = (q & 0xF).astype(jnp.bfloat16)
            hi = (q >> 4).astype(jnp.bfloat16)
            qv = jnp.concatenate([lo, hi], axis=1)  # [Gb, S, O]
            # [Gb, 1, O] slices on the untiled leading dim (sublane-free)
            sg = s_ref[pl.ds(ci * Gb, Gb), :, :]
            zg = z_ref[pl.ds(ci * Gb, Gb), :, :]
            w = ((qv - zg.astype(jnp.bfloat16))
                 * sg.astype(jnp.bfloat16)).reshape(Gb * S, O)

            xg = x_ref[:, pl.ds(ci * Gb * S, Gb * S)].reshape(M, Gb, S)
            rg = rot_ref[pl.ds(ci * Gb, Gb), :, :].astype(jnp.bfloat16)
            xr = jax.lax.dot_general(
                jnp.swapaxes(xg, 0, 1).astype(jnp.bfloat16), rg,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [Gb, M, S]
            xr = jnp.swapaxes(xr, 0, 1).reshape(M, Gb * S).astype(jnp.bfloat16)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                xr, w, preferred_element_type=jnp.float32
            )

        jax.lax.fori_loop(0, n_chunks, loop, None)
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    pl.run_scoped(
        body,
        acc_ref=pltpu.VMEM((M, O), jnp.float32),
        scratch=pltpu.VMEM((2, rows, O), jnp.uint8),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(
    __import__("jax").jit, static_argnames=("Gb", "interpret")
)
def dma_rot_w4_matmul(x, rot, qweight, scales, zeros, *, Gb=4, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, I = x.shape
    G, S, _ = rot.shape
    O = qweight.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel_dma, G=G, S=S, Gb=Gb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # qweight streams manually
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, O), x.dtype),
        interpret=interpret,
    )(x, rot, scales.astype(jnp.bfloat16)[:, None, :],
      zeros.astype(jnp.bfloat16)[:, None, :], qweight)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--gb", type=int, default=4, help="groups per DMA chunk")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--chain", type=int, default=64, help="kernel calls per timing chain")
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    from paroquant_tpu.utils import force_platform

    force_platform(args.device)
    import jax
    import jax.numpy as jnp

    from paroquant_tpu.kernels.rot_matmul import rot_w4_matmul

    I = O = args.size
    S, G = 128, args.size // 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.m, I)), jnp.bfloat16)
    rot = jnp.asarray(rng.standard_normal((G, S, S)) / np.sqrt(S), jnp.bfloat16)
    qw = jnp.asarray(rng.integers(0, 256, (I // 2, O)), jnp.uint8)
    scales = jnp.asarray(rng.uniform(0.001, 0.02, (G, O)), jnp.float32)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)), jnp.float32)

    from paroquant_tpu.kernels.rot_matmul import rot_w4_matmul_mg

    out_dma = dma_rot_w4_matmul(x, rot, qw, scales, zeros, Gb=args.gb,
                                interpret=args.interpret)
    # identical dequant semantics ((q-z)*s on the weight in bf16): tight bound
    out_mg = rot_w4_matmul_mg(x, rot, qw, scales.astype(jnp.bfloat16),
                              zeros.astype(jnp.bfloat16),
                              groups_per_step=args.gb, interpret=args.interpret)
    a, b = np.asarray(out_dma, np.float32), np.asarray(out_mg, np.float32)
    denom = np.abs(b).mean()
    print(f"parity vs mg kernel (same semantics): max |d|/mean|y| "
          f"{np.abs(a - b).max() / denom:.5f}")
    out_ref = rot_w4_matmul(x, rot, qw, scales.astype(jnp.bfloat16),
                            zeros.astype(jnp.bfloat16),
                            interpret=args.interpret)
    c = np.asarray(out_ref, np.float32)
    print(f"vs prod kernel (f32 zp-decomposition): max |d|/mean|y| "
          f"{np.abs(a - c).max() / denom:.5f} (bf16 dequant rounding)")
    if args.interpret:
        return

    # kernel_bench4 methodology: fori-chained calls with a REAL data
    # dependence (output feeds input), per-call time from the slope between
    # two chain lengths (cancels dispatch/relay overhead), min-of-reps.
    N1, N2 = args.chain, args.chain * 4

    def chain(stepfn, n):
        @jax.jit
        def f():
            def body(i, xv):
                return (stepfn(xv) * 0.01).astype(x.dtype)
            return jax.lax.fori_loop(0, n, body, x)
        return f

    step_dma = lambda v: dma_rot_w4_matmul(v, rot, qw, scales, zeros, Gb=args.gb)
    step_prod = lambda v: rot_w4_matmul(
        v, rot, qw, scales.astype(jnp.bfloat16), zeros.astype(jnp.bfloat16))
    fns = {
        "dma": (chain(step_dma, N1), chain(step_dma, N2)),
        "prod": (chain(step_prod, N1), chain(step_prod, N2)),
    }
    for name, (f1, f2) in fns.items():
        np.asarray(jax.block_until_ready(f1()))
        np.asarray(jax.block_until_ready(f2()))
    best = {name: [1e9, 1e9] for name in fns}
    for _ in range(args.reps):  # interleaved: drift hits all arms equally
        for name, (f1, f2) in fns.items():
            for slot, f in ((0, f1), (1, f2)):
                t0 = time.perf_counter()
                np.asarray(jax.block_until_ready(f()))
                best[name][slot] = min(best[name][slot], time.perf_counter() - t0)
    nbytes = I * O // 2 + G * O * 4 + G * S * S * 2 + 2 * args.m * I
    for name, (t1, t2) in best.items():
        per = (t2 - t1) / (N2 - N1)
        gbps = nbytes / per / 1e9
        print(f"{name:>5}: {per*1e6:7.1f} us/call  ~{gbps:6.1f} GB/s "
              f"({100*gbps/819:.0f}% SoL)")


if __name__ == "__main__":
    main()
