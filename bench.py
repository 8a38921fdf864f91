"""Driver benchmark: W4 decode throughput vs BF16 baseline, one JSON line.

Protocol mirrors the reference cli/benchmark.py:30-49: single-stream greedy
decode, 2 warmup + 5 timed runs. Model: Qwen3-0.6B geometry (random weights),
RTN-quantized to the PARO runtime format, decoding through the fused Pallas
rotation+dequant kernel. Baseline: the same model dense BF16 through XLA.

The two arms are measured INTERLEAVED (bf16, w4, bf16, w4, ...) and scored
best-of-reps: the TPU relay on this box has multi-x wall-clock drift windows
(see STATUS.md kernel campaign), so sequential mean-of-runs lets a stall
land on one arm and corrupt the ratio. Best-of-reps with interleaving makes
both arms see the same drift; the ratio is the stable quantity.

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


def make_decode_runner(params, config, quant_mode, n_tokens=96, batch=1):
    """Returns run() -> tokens/s for one greedy-decode pass (prefill unsynced
    out of the timed region, full device->host sync at the end)."""
    import jax.numpy as jnp

    from paroquant_tpu.models import KVCache
    from paroquant_tpu.models.decoder import greedy_decode_scan, prefill

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, config.vocab_size, (batch, 16)), jnp.int32)
    max_len = 16 + n_tokens + 8

    def run():
        cache = KVCache.create(config, batch, max_len, jnp.bfloat16)
        logits, c = prefill(params, config, prompt, cache, quant_mode=quant_mode)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        np.asarray(tok)  # sync prefill out of the timed region
        t0 = time.perf_counter()
        toks, c = greedy_decode_scan(
            params, config, tok, c, n_tokens, quant_mode=quant_mode
        )
        np.asarray(toks)  # full sync through host fetch
        return n_tokens * batch / (time.perf_counter() - t0)

    return run


def main():
    import dataclasses

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
    run_bf16 = make_decode_runner(params, config, "xla")
    run_w4 = make_decode_runner(qparams, config, qmode)
    for _ in range(2):  # warmup: compile + cache-prime both arms
        run_bf16()
        run_w4()
    bf16_samples, w4_samples = [], []
    for _ in range(5):  # interleaved reps; best-of is the drift-robust score
        bf16_samples.append(run_bf16())
        w4_samples.append(run_w4())
    tok_s_bf16 = float(np.max(bf16_samples))
    tok_s_w4 = float(np.max(w4_samples))

    print(
        json.dumps(
            {
                "metric": "qwen3_0.6b_w4_decode_throughput",
                "value": round(tok_s_w4, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(tok_s_w4 / tok_s_bf16, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
