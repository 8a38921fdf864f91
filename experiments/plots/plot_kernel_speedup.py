"""Kernel speedup plot: fused rotation+W4 kernel vs unfused baseline.

Counterpart of the reference's plot_kernel_speedup.py (constants 1.36x/2.06x/
3.30x/5.18x at channel dims 4096..32768 on their GPU): measures OUR fused
Pallas kernel against the XLA bf16 dense matmul at the same channel dims on
the attached backend and writes figures/kernel_speedup.png + .json.

Run on the TPU (default backend). M=1 (decode shape), min-of-reps slope
timing (see scripts/kernel_bench4.py for the methodology).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.kernels.rot_matmul import rot_w4_matmul_mg
from paroquant_tpu.ops.packing import pack_w4_tpu

N1, N2, REPS = 32, 160, 6
ROW_SIZES = [4096, 8192, 16384, 32768]
REFERENCE_GPU_SPEEDUPS = {4096: 1.36, 8192: 2.06, 16384: 3.30, 32768: 5.18}


def chained(step, x, I, n):
    @jax.jit
    def f():
        def body(i, xv):
            return (step(xv)[:, :I] * 0.01).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x)
    return f


def min_slope(step, x, I):
    f1, f2 = chained(step, x, I, N1), chained(step, x, I, N2)
    np.asarray(jax.block_until_ready(f1()))
    np.asarray(jax.block_until_ready(f2()))
    b1 = b2 = 1e9
    for _ in range(REPS):
        t0 = time.perf_counter(); np.asarray(jax.block_until_ready(f1()))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(jax.block_until_ready(f2()))
        b2 = min(b2, time.perf_counter() - t0)
    return (b2 - b1) / (N2 - N1)


def main():
    rng = np.random.default_rng(0)
    M, O, GS = 1, 4096, 128
    results = {}
    for I in ROW_SIZES:
        G = I // GS
        x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
        qweight = jnp.asarray(
            pack_w4_tpu(rng.integers(0, 16, (I, O), dtype=np.int32), GS)
        )
        scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.bfloat16)
        zeros = jnp.asarray(rng.integers(0, 16, (G, O)).astype(np.float32), jnp.bfloat16)
        rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.bfloat16)
        w_dense = jnp.asarray(rng.normal(size=(I, O)), jnp.bfloat16)

        t_dense = min_slope(
            lambda xv: jnp.dot(xv, w_dense, preferred_element_type=jnp.float32), x, I
        )
        t_fused = min_slope(
            lambda xv: rot_w4_matmul_mg(xv, rot, qweight, scales, zeros), x, I
        )
        results[I] = {
            "dense_us": t_dense * 1e6,
            "fused_us": t_fused * 1e6,
            "speedup": t_dense / t_fused,
        }
        print(f"I={I}: dense {t_dense*1e6:.1f}us fused {t_fused*1e6:.1f}us "
              f"speedup {t_dense/t_fused:.2f}x", flush=True)

    outdir = Path(__file__).parent / "figures"
    outdir.mkdir(parents=True, exist_ok=True)
    payload = {
        "backend": jax.devices()[0].platform,
        "speedups": {str(k): v["speedup"] for k, v in results.items()},
        "detail": results,
        "reference_gpu_speedups": REFERENCE_GPU_SPEEDUPS,
    }
    (outdir / "kernel_speedup.json").write_text(json.dumps(payload, indent=2))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(3.2, 2.2))
        ax.plot(ROW_SIZES, [results[i]["speedup"] for i in ROW_SIZES],
                marker=".", label="PARO-TPU fused vs bf16 dense")
        ax.plot(ROW_SIZES, [REFERENCE_GPU_SPEEDUPS[i] for i in ROW_SIZES],
                marker="x", linestyle="--", label="reference (GPU)")
        ax.set_ylabel("Speedup")
        ax.set_xlabel("Channel dimension")
        ax.set_xscale("log", base=2)
        ax.set_xticks(ROW_SIZES, [str(r) for r in ROW_SIZES])
        ax.grid(True, alpha=0.3, linestyle="--")
        ax.legend(fontsize=7)
        fig.savefig(outdir / "kernel_speedup.png", bbox_inches="tight", dpi=160)
        print(f"wrote {outdir}/kernel_speedup.png")
    except Exception as e:
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
