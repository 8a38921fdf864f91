"""A/B: paged decode attention HBM traffic, bf16 KV vs int8 KV.

Measures the Pallas paged decode kernel at long context (the regime the
int8 cache targets): one query token against S cached tokens. Chained
iterations inside one jit (output feeds the next query — real data
dependence, per scripts/TPU_RUNBOOK.md) so relay dispatch noise cancels;
min over reps.

Run on the real chip:  python scripts/bench_kv_quant.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from paroquant_tpu.kernels.attention import paged_decode_attention
from paroquant_tpu.serve.paged import _dequant_pages, kv_quantize


def chain(n_iters, q, k, v, table, lens, ks=None, vs=None):
    def body(qc, _):
        o = paged_decode_attention(
            qc, k, v, table, lens, scale=0.08, k_scales=ks, v_scales=vs
        )
        return o.astype(qc.dtype), ()

    def run(qc):
        out, _ = jax.lax.scan(body, qc, None, length=n_iters)
        return out

    return jax.jit(run)


def bench(name, fn, q, reps=5):
    fn(q).block_until_ready()  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(q).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    B, Hq, Hkv, D, ps = 1, 32, 8, 128, 128
    S = 16384  # cached tokens (long context decode)
    maxP = S // ps
    rng = np.random.default_rng(0)
    kf = jnp.asarray(rng.normal(size=(maxP, ps, Hkv, D)), jnp.bfloat16)
    vf = jnp.asarray(rng.normal(size=(maxP, ps, Hkv, D)), jnp.bfloat16)
    kq, ks = kv_quantize(kf)
    ks = jnp.swapaxes(ks, -1, -2)
    vq, vs = kv_quantize(vf)
    vs = jnp.swapaxes(vs, -1, -2)
    q = jnp.asarray(rng.normal(size=(B, Hq, D)), jnp.bfloat16)
    table = jnp.asarray(np.arange(maxP)[None].repeat(B, 0), jnp.int32)
    lens = jnp.full((B,), S, jnp.int32)

    N = 64
    t_bf16 = bench("bf16", chain(N, q, kf, vf, table, lens), q) / N
    t_int8 = bench(
        "int8", chain(N, q, kq, vq, table, lens, ks, vs), q
    ) / N

    bytes_bf16 = 2 * S * Hkv * D * 2  # k+v bf16
    bytes_int8 = 2 * S * Hkv * (D * 1 + 4)  # k+v int8 + f32 scale/row
    bw = 834e9  # measured achievable HBM read BW on this chip (STATUS.md)
    print(f"cached tokens S={S}, Hkv={Hkv}, D={D}")
    print(f"bf16 KV: {t_bf16*1e6:8.1f} us/step  "
          f"(SoL {bytes_bf16/bw*1e6:.1f} us, {bytes_bf16/bw/t_bf16*100:.0f}%)")
    print(f"int8 KV: {t_int8*1e6:8.1f} us/step  "
          f"(SoL {bytes_int8/bw*1e6:.1f} us, {bytes_int8/bw/t_int8*100:.0f}%)")
    print(f"speedup: {t_bf16/t_int8:.2f}x (byte ratio {bytes_bf16/bytes_int8:.2f}x)")


if __name__ == "__main__":
    main()
