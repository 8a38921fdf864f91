"""Driver benchmark: W4 decode throughput vs BF16 baseline, one JSON line.

Protocol mirrors the reference cli/benchmark.py:30-49 (single-stream greedy
decode, warmup + timed runs) hardened for a relay-attached chip (VERDICT r2
weak #2/#4 — de-noised headline):
- decode chains of 512 tokens in ONE dispatch (greedy_decode_scan): the
  ~30ms relay round-trip is <4% of the chain, not 20% as at 96 tokens
- both arms measured INTERLEAVED (bf16, w4, bf16, ...) over 8 reps,
  scored best-of-reps: relay drift windows hit both arms equally
- device step-time reported alongside wall: chains of 64 and 512 tokens
  share one dispatch overhead, so the slope (t512-t64)/448 estimates the
  per-token DEVICE time net of the relay; vs_baseline_device is the
  relay-free ratio.

Model: Qwen3-0.6B geometry (random weights), RTN-quantized to the PARO
runtime format, decoding through the fused Pallas rotation+dequant kernel.
Baseline: the same model dense BF16 through XLA.

vs_baseline = W4 tokens/s / BF16 tokens/s (north star: >= 0.9).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from paroquant_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_LONG = 512
N_SHORT = 64
REPS = 8


def make_decode_runner(params, config, quant_mode, batch=1):
    """Returns run(n_tokens) -> wall seconds for one greedy-decode chain
    (prefill synced out of the timed region, device->host sync at the end)."""
    import jax.numpy as jnp

    from paroquant_tpu.models import KVCache
    from paroquant_tpu.models.decoder import greedy_decode_scan, prefill

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, config.vocab_size, (batch, 16)), jnp.int32)
    max_len = 16 + N_LONG + 8

    def run(n_tokens):
        cache = KVCache.create(config, batch, max_len, jnp.bfloat16)
        logits, c = prefill(params, config, prompt, cache, quant_mode=quant_mode)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        np.asarray(tok)  # sync prefill out of the timed region
        t0 = time.perf_counter()
        toks, c = greedy_decode_scan(
            params, config, tok, c, n_tokens, quant_mode=quant_mode
        )
        np.asarray(toks)  # full sync through host fetch
        return time.perf_counter() - t0

    return run


def main():
    import jax
    import jax.numpy as jnp

    from paroquant_tpu.convert import quantize_model_rtn
    from paroquant_tpu.models import PRESETS, init_params

    config = PRESETS["qwen3-0.6b"]
    on_tpu = jax.devices()[0].platform != "cpu"
    # build + quantize on the host CPU backend (packing and per-op work is
    # pathological over the TPU relay), then ship both models to the device
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        # quantize_lm_head: at 0.6B the tied 151k-vocab output projection
        # dominates per-token HBM traffic; W4-ing it is where the speedup is
        qparams = quantize_model_rtn(
            params, config, n_bits=4, group_size=128, quantize_lm_head=True
        )
        from paroquant_tpu.models.decoder import merge_projections

        qparams = merge_projections(qparams, config)
    if on_tpu:
        dev = jax.devices()[0]
        params = jax.device_put(params, dev)
        qparams = jax.device_put(qparams, dev)
    qmode = "fused" if on_tpu else "xla"
    n_long, n_short, reps = N_LONG, N_SHORT, REPS
    if not on_tpu:  # CPU smoke: the protocol, not the numbers
        n_long, n_short, reps = 48, 16, 2
    run_bf16 = make_decode_runner(params, config, "xla")
    run_w4 = make_decode_runner(qparams, config, qmode)
    # third arm: W4A8 serving mode (int8-MXU activation-quantized kernels;
    # 1.24x over the W4A16 GEMV isolated — scripts/kernel_w4a8_exp.py).
    # Reported alongside, headline stays the exact weight-only W4 path.
    run_w4a8 = make_decode_runner(qparams, config, "w4a8" if on_tpu else "w4a8_xla")
    arms = [("bf16", run_bf16), ("w4", run_w4), ("w4a8", run_w4a8)]
    for _ in range(2):  # warmup: compile + cache-prime all arms/chain lengths
        for n in (n_short, n_long):
            for _, run in arms:
                run(n)
    t = {(a, n): [] for a, _ in arms for n in (n_short, n_long)}
    for _ in range(reps):  # interleaved reps; best-of is the drift-robust score
        for n in (n_short, n_long):
            for a, run in arms:
                t[(a, n)].append(run(n))

    def best(arm, n):
        return float(np.min(t[(arm, n)]))

    tok_s_bf16 = n_long / best("bf16", n_long)
    tok_s_w4 = n_long / best("w4", n_long)
    tok_s_w4a8 = n_long / best("w4a8", n_long)
    # relay-free per-token device time from the chain-length slope
    dev_ms_bf16 = (best("bf16", n_long) - best("bf16", n_short)) / (n_long - n_short) * 1e3
    dev_ms_w4 = (best("w4", n_long) - best("w4", n_short)) / (n_long - n_short) * 1e3
    dev_ms_w4a8 = (best("w4a8", n_long) - best("w4a8", n_short)) / (n_long - n_short) * 1e3

    print(
        json.dumps(
            {
                "metric": "qwen3_0.6b_w4_decode_throughput",
                "value": round(tok_s_w4, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tok_s_w4 / tok_s_bf16, 4),
                "decode_chain_tokens": n_long,
                "reps": reps,
                "device_ms_per_token_w4": round(dev_ms_w4, 4),
                "device_ms_per_token_bf16": round(dev_ms_bf16, 4),
                "vs_baseline_device": round(
                    max(dev_ms_bf16, 1e-9) / max(dev_ms_w4, 1e-9), 4
                ),
                "tok_s_w4a8": round(tok_s_w4a8, 2),
                "vs_baseline_w4a8": round(tok_s_w4a8 / tok_s_bf16, 4),
                "device_ms_per_token_w4a8": round(dev_ms_w4a8, 4),
                "vs_baseline_device_w4a8": round(
                    max(dev_ms_bf16, 1e-9) / max(dev_ms_w4a8, 1e-9), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
