"""Llama-2-7B-geometry W4 decode benchmark (BASELINE.json config 2).

Builds the quantized model layer-by-layer on the host CPU backend (full BF16
7B would not fit the 16GB chip — W4 is what makes single-chip 7B serving
possible here), ships it to the TPU, and measures scan-decode throughput.
"""

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

from paroquant_tpu.convert.rtn import quantize_linear_rtn
from paroquant_tpu.models import PRESETS, KVCache
from paroquant_tpu.models.decoder import DenseLinear, greedy_decode_scan, prefill


def build_quantized_llama7b(rot_dtype=jnp.bfloat16):
    cfg = PRESETS["llama-2-7b"]
    rng = np.random.default_rng(0)
    H, I, D = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    Hq = cfg.num_attention_heads

    def qlin(fan_in, fan_out):
        w = (rng.standard_normal((fan_in, fan_out), np.float32) / np.sqrt(fan_in)).astype(np.float32)
        return quantize_linear_rtn(
            DenseLinear(jnp.asarray(w), None), n_bits=4, group_size=128,
            num_rotations=8, rot_dtype=rot_dtype,
        )

    params = {
        "embed_tokens": jnp.asarray(
            rng.standard_normal((cfg.vocab_size, H), np.float32) * 0.02, jnp.bfloat16
        ),
        "norm": jnp.ones((H,), jnp.bfloat16),
        # W4 lm_head: the dense bf16 32k-vocab head is 262MB of the per-token
        # read set; quantized it is 67MB
        "lm_head": qlin(H, cfg.vocab_size),
        "layers": [],
    }
    t0 = time.time()
    for li in range(cfg.num_hidden_layers):
        lp = {
            "input_layernorm": jnp.ones((H,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((H,), jnp.bfloat16),
            "q_proj": qlin(H, Hq * D),
            "k_proj": qlin(H, Hq * D),
            "v_proj": qlin(H, Hq * D),
            "o_proj": qlin(Hq * D, H),
            "mlp": {
                "gate_proj": qlin(H, I),
                "up_proj": qlin(H, I),
                "down_proj": qlin(I, H),
            },
        }
        params["layers"].append(lp)
        if li % 8 == 0:
            print(f"  built layer {li} ({time.time()-t0:.0f}s)", flush=True)
    return params, cfg


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-merge", action="store_true")
    ap.add_argument("--batch", type=int, nargs="+", default=[1],
                    help="decode batch sizes to measure (serving decodes "
                         "batched: VERDICT r2 item 3 asks for M=8/32 arms)")
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--quant-mode", nargs="+", default=["fused"],
                    choices=["fused", "w4a8", "xla", "auto"],
                    help="arms to measure (interleaved when >1); w4a8 is the "
                         "int8-MXU activation-quantized serving mode; xla is "
                         "the one-off-dequant MXU GEMM (prefill path) — at "
                         "decode M=8/32 it answers whether the fused kernel "
                         "still wins in the indifference band at 7B")
    args = ap.parse_args()
    merge = not args.no_merge
    cpu = jax.local_devices(backend="cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        params, cfg = build_quantized_llama7b()
        if merge:
            from paroquant_tpu.models.decoder import merge_projections

            params = merge_projections(params, cfg)
    print(f"built W4 7B in {time.time()-t0:.0f}s (merged={merge})", flush=True)

    dev = jax.devices()[0]
    t0 = time.time()
    params = jax.device_put(params, dev)
    jax.block_until_ready(jax.tree.leaves(params["layers"][0])[0])
    print(f"transferred to {dev} in {time.time()-t0:.0f}s", flush=True)

    rng = np.random.default_rng(1)
    n_tokens = args.tokens

    def _tree_bytes(t):
        import jax as _jax
        return sum(
            a.size * a.dtype.itemsize
            for a in _jax.tree.leaves(t)
            if hasattr(a, "dtype")
        )

    weight_gb = _tree_bytes(params) / 1e9
    sol = 819 / weight_gb

    for B in args.batch:
        prompt = jax.device_put(
            jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 16)), jnp.int32), dev
        )

        def make_run(qmode):
            def run():
                cache = KVCache.create(cfg, B, 16 + n_tokens + 8, jnp.bfloat16)
                logits, c = prefill(params, cfg, prompt, cache, quant_mode=qmode)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                np.asarray(tok)
                t0 = time.perf_counter()
                toks, _ = greedy_decode_scan(
                    params, cfg, tok, c, n_tokens, quant_mode=qmode)
                np.asarray(toks)
                return B * n_tokens / (time.perf_counter() - t0)
            return run

        runs = {q: make_run(q) for q in args.quant_mode}
        for i in range(2):
            for q, run in runs.items():
                r = run()
                print(f"B={B} [{q}] warmup {i}: {r:.1f} tok/s", flush=True)
        rates = {q: [] for q in runs}
        for _ in range(5):  # interleaved: relay drift hits all arms equally
            for q, run in runs.items():
                rates[q].append(run())
        for q in runs:
            r = rates[q]
            # per-STEP the weight read set is the same regardless of B, so
            # the aggregate SoL scales linearly with B until compute-bound
            print(f"llama-2-7b W4 decode B={B} [{q}]: {np.mean(r):.1f} tok/s agg "
                  f"(min {min(r):.1f}, max {max(r):.1f}); "
                  f"weight read set {weight_gb:.2f}GB -> B*SoL "
                  f"~{B*sol:.0f} tok/s; achieved "
                  f"{np.mean(r)/(B*sol)*100:.0f}% of SoL", flush=True)


if __name__ == "__main__":
    main()
