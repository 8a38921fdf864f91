"""Batched-decode accounting at 7B geometry (VERDICT r3 item 5).

Round-3 recorded B=32 at 875 tok/s = 14% of B*SoL with no breakdown. This
script decomposes one B=32 decode step (same greedy_decode_scan protocol as
scripts/bench_7b.py) into:

  - quantized matmuls (isolated fused-kernel chains at M=32, per layer shape)
  - attention (A/B: the full scan vs the same scan with attention replaced
    by an identity callable — model_forward takes callables as attn_mode)
  - lm_head + sampler (isolated chains)
  - residual = full step - sum(parts): scan glue, norms, rope, KV update,
    dispatch

All numbers are device-side per-step times from N-step scan chains
(min-of-reps; the relay's dispatch noise amortizes over the chain).
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from paroquant_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np


def identity_attn(q, k, v, q_pos, valid, **kw):
    return q  # [B, T, Hq, D] — attention ablated, shapes preserved


def timed(fn, *args, reps=3):
    """min-of-reps wall seconds of fn(*args) (fn must block)."""
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--preset", default="llama-2-7b",
                    help="llama-2-7b (protocol) or a tiny preset for smoke")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from paroquant_tpu.models import KVCache
    from paroquant_tpu.models.decoder import greedy_decode_scan, prefill

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench_7b import build_quantized_llama7b

    cpu = jax.local_devices(backend="cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        if args.preset == "llama-2-7b":
            params, cfg = build_quantized_llama7b()
        else:
            import dataclasses

            from paroquant_tpu.convert import quantize_model_rtn
            from paroquant_tpu.models import PRESETS, init_params

            cfg = dataclasses.replace(
                PRESETS[args.preset], hidden_size=256, intermediate_size=512,
                num_attention_heads=4, num_key_value_heads=2, head_dim=64)
            dense = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
            params = quantize_model_rtn(dense, cfg, n_bits=4, group_size=128,
                                        quantize_lm_head=True)
        from paroquant_tpu.models.decoder import merge_projections

        params = merge_projections(params, cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    jax.block_until_ready(jax.tree.leaves(params["layers"][0])[0])
    print(f"built+shipped 7B in {time.time()-t0:.0f}s", flush=True)

    B, N = args.batch, args.tokens
    rng = np.random.default_rng(1)
    prompt = jax.device_put(
        jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 16)), jnp.int32), dev)

    def run_scan(attn_mode):
        def once():
            cache = KVCache.create(cfg, B, 16 + N + 8, jnp.bfloat16)
            logits, c = prefill(params, cfg, prompt, cache, quant_mode="fused")
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            np.asarray(tok)
            t0 = time.perf_counter()
            toks, _ = greedy_decode_scan(
                params, cfg, tok, c, N, quant_mode="fused",
                attn_mode=attn_mode)
            np.asarray(toks)
            return (time.perf_counter() - t0) / N

        once()  # compile
        return min(once() for _ in range(3))

    full = run_scan("einsum")
    no_attn = run_scan(identity_attn)

    # isolated component chains (data-dependent, one dispatch per chain)
    from paroquant_tpu.ops.qlinear import (
        merged_linear_forward, quantized_linear_forward,
    )

    def chain(fn, x0, n=64):
        # REAL data dependence (kernel_bench3 methodology): the output (or
        # its leading slice, scaled) feeds the next input — bf16 "+tiny"
        # round-away tricks get hoisted by XLA
        @jax.jit
        def go(x):
            def body(c, _):
                y = fn(c)
                I = c.shape[1]
                if y.shape[1] >= I:
                    nxt = (y[:, :I] * 0.01).astype(c.dtype)
                else:
                    nxt = jnp.concatenate(
                        [(y * 0.01).astype(c.dtype), c[:, y.shape[1]:]], axis=1)
                return nxt, None

            c, _ = jax.lax.scan(body, x, None, length=n)
            return c

        go(x0).block_until_ready()
        return timed(lambda: go(x0).block_until_ready()) / n

    H = cfg.hidden_size
    lp = params["layers"][0]
    x32 = jax.device_put(jnp.zeros((B, H), jnp.bfloat16), dev)
    xo = jax.device_put(jnp.zeros((B, cfg.num_attention_heads * cfg.head_dim), jnp.bfloat16), dev)
    xi = jax.device_put(jnp.zeros((B, cfg.intermediate_size), jnp.bfloat16), dev)

    t_qkv = chain(lambda x: merged_linear_forward(lp["qkv_proj"], x, mode="fused"), x32)
    t_o = chain(lambda x: quantized_linear_forward(lp["o_proj"], x, mode="fused"), xo)
    t_gu = chain(lambda x: merged_linear_forward(lp["mlp"]["gate_up_proj"], x, mode="fused"), x32)
    t_down = chain(lambda x: quantized_linear_forward(lp["mlp"]["down_proj"], x, mode="fused"), xi)
    L = cfg.num_hidden_layers
    matmuls = L * (t_qkv + t_o + t_gu + t_down)
    t_head = chain(lambda x: quantized_linear_forward(params["lm_head"], x, mode="fused"), x32)

    logits32 = jax.device_put(jnp.zeros((B, cfg.vocab_size), jnp.float32), dev)

    @jax.jit
    def argmax_chain(l):
        def body(c, _):
            t = jnp.argmax(c, axis=-1)
            return c + t[:, None].astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, l, None, length=64)
        return c

    argmax_chain(logits32).block_until_ready()
    t_samp = timed(lambda: argmax_chain(logits32).block_until_ready()) / 64

    attn = full - no_attn
    parts = matmuls + t_head + t_samp + attn
    print(json.dumps({
        "metric": "b32_decode_accounting_7b",
        "batch": B,
        "step_ms_full": round(full * 1e3, 2),
        "attention_ms (full - identity-attn A/B)": round(attn * 1e3, 2),
        "quant_matmuls_ms (isolated x32 layers)": round(matmuls * 1e3, 2),
        "lm_head_ms": round(t_head * 1e3, 2),
        "sampler_argmax_ms": round(t_samp * 1e3, 2),
        "residual_ms (glue/norms/rope/kv-update)": round((full - parts) * 1e3, 2),
        "per_layer_us": {
            "qkv": round(t_qkv * 1e6, 1), "o": round(t_o * 1e6, 1),
            "gate_up": round(t_gu * 1e6, 1), "down": round(t_down * 1e6, 1),
        },
        "agg_tok_s": round(B / full, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
