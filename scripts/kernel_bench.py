"""Microbenchmark the fused W4 kernels on the real TPU chip.

Compares against the XLA bf16 dense matmul (the BF16 baseline the north star
is defined against) and reports achieved HBM bandwidth / speed-of-light %.

Usage: python scripts/kernel_bench.py [--m 1] [--i 4096] [--o 4096]
"""

from __future__ import annotations

import argparse
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

HBM_GBPS = {"v5e": 819.0, "v5": 819.0}


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--i", type=int, default=4096)
    ap.add_argument("--o", type=int, default=4096)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    M, I, O, K = args.m, args.i, args.o, args.k
    GS = 128
    G = I // GS

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, I)), jnp.bfloat16)
    w_dense = jnp.asarray(rng.normal(size=(I, O)), jnp.bfloat16)
    q = rng.integers(0, 16, size=(I, O), dtype=np.int32)
    qweight = jnp.asarray(pack_w4_tpu(q, GS))
    scales = jnp.asarray(rng.uniform(0.01, 0.05, (G, O)), jnp.float32)
    zeros = jnp.asarray(rng.integers(0, 16, (G, O)), jnp.float32)
    inv_s = jnp.asarray(rng.uniform(0.5, 2.0, I), jnp.float32)
    theta = rng.normal(0, 0.3, (K, I // 2)).astype(np.float32)
    cos_t, sin_t = bf.butterfly_tables(theta, GS)
    cos_t, sin_t = jnp.asarray(cos_t), jnp.asarray(sin_t)
    rot = jnp.asarray(rng.normal(size=(G, GS, GS)), jnp.float32)

    dense = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    results = {}
    results["xla_bf16_dense"] = timeit(dense, x, w_dense, iters=args.iters)
    results["w4_matmul"] = timeit(
        lambda: w4_matmul(x, qweight, scales, zeros), iters=args.iters
    )
    results["butterfly_w4"] = timeit(
        lambda: butterfly_w4_matmul(x, inv_s, cos_t, sin_t, qweight, scales, zeros),
        iters=args.iters,
    )
    results["dense_rot_w4"] = timeit(
        lambda: rot_w4_matmul(x, rot, qweight, scales, zeros), iters=args.iters
    )

    bw = HBM_GBPS["v5e"]
    w4_bytes = I * O // 2 + 2 * G * O * 4 + M * I * 2 + M * O * 4
    bf16_bytes = I * O * 2 + M * I * 2 + M * O * 2
    print(f"\nshapes: M={M} I={I} O={O} K={K}")
    print(f"{'kernel':<18}{'us':>10}{'GB/s':>10}{'SoL %':>8}{'vs bf16':>9}")
    for name, t in results.items():
        nbytes = bf16_bytes if name == "xla_bf16_dense" else w4_bytes
        if name == "dense_rot_w4":
            nbytes += G * GS * GS * 4
        if name == "butterfly_w4":
            nbytes += 2 * K * I * 4
        gbps = nbytes / t / 1e9
        print(
            f"{name:<18}{t*1e6:>10.1f}{gbps:>10.0f}{100*gbps/bw:>7.0f}%"
            f"{results['xla_bf16_dense']/t:>8.2f}x"
        )


if __name__ == "__main__":
    main()
