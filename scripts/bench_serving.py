"""Serving-engine benchmark: p50/p99 TTFT + aggregate tokens/s under load.

North-star config 3 protocol (BASELINE.json): continuous batching at
max_batch=8 with mixed prompt lengths. Requests are submitted in a Poisson-ish
staggered pattern while the engine decodes, so TTFT includes real queueing +
chunked-prefill interleaving (serve/engine.py).

Defaults use the Qwen3-0.6B geometry with RTN W4 weights (random), the fused
kernels and the Pallas attention paths on TPU. Prints one JSON line.
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


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="qwen3-0.6b")
    ap.add_argument("--layers", type=int, default=None, help="trim depth")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--requests", type=int, default=24)
    ap.add_argument("--max-tokens", type=int, default=48)
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--decode-burst", type=int, default=None,
                    help="decode steps fused per dispatch (default: 8 on TPU)")
    ap.add_argument("--prefix-caching", action="store_true")
    ap.add_argument("--spec-k", type=int, default=0,
                    help=">0: prompt-lookup speculative decoding "
                         "(greedy batches)")
    ap.add_argument("--distinct-prompts", type=int, default=None,
                    help="draw requests from a pool of N distinct prompts "
                         "(chat-like reuse; pairs with --prefix-caching)")
    ap.add_argument("--max-queue", type=int, default=None,
                    help="admission-control queue cap: saturating load is "
                         "shed (EngineOverloaded) instead of queueing "
                         "unboundedly; rejected requests are counted and "
                         "excluded from TTFT percentiles (VERDICT r2 #9)")
    ap.add_argument("--arrival-mean", type=float, default=0.03,
                    help="mean inter-arrival seconds (exponential). The "
                         "0.03 default is a saturating burst; ~0.3+ probes "
                         "steady-state TTFT below capacity")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from paroquant_tpu.convert import quantize_model_rtn
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.models.decoder import merge_projections
    from paroquant_tpu.serve import Engine, SamplingParams

    config = PRESETS[args.preset]
    if args.layers:
        config = dataclasses.replace(config, num_hidden_layers=args.layers)
    on_tpu = jax.devices()[0].platform != "cpu"
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        qparams = quantize_model_rtn(
            params, config, n_bits=4, group_size=128, quantize_lm_head=True
        )
        qparams = merge_projections(qparams, config)
    if on_tpu:
        qparams = jax.device_put(qparams, jax.devices()[0])

    burst = args.decode_burst if args.decode_burst is not None else (8 if on_tpu else 1)
    eng = Engine(
        qparams, config, max_batch=args.max_batch, max_len=args.max_len,
        page_size=64, quant_mode="auto" if on_tpu else "xla",
        prefill_chunk=256, decode_burst=burst,
        prefix_caching=args.prefix_caching, spec_k=args.spec_k,
    )
    rng = np.random.default_rng(0)
    # mixed lengths: short chat turns + long contexts (north-star config 3)
    pool = [l for l in (24, 64, 160, 420) if l + args.max_tokens < args.max_len]
    probs = {1: [1.0], 2: [0.6, 0.4], 3: [0.45, 0.35, 0.2],
             4: [0.4, 0.3, 0.2, 0.1]}[len(pool)]
    lengths = [int(l) for l in rng.choice(pool, args.requests, p=probs)]
    sp = SamplingParams(max_tokens=args.max_tokens, temperature=0.0)
    prompts: list[list[int]] | None = None
    if args.distinct_prompts:
        # long prompts (multiple full pages) so prefix caching has something
        # to share; short ones have zero full pages at page_size=64
        base_lens = sorted(pool, reverse=True)
        base = [
            list(rng.integers(0, config.vocab_size,
                              base_lens[i % len(base_lens)]))
            for i in range(args.distinct_prompts)
        ]
        prompts = [base[i % len(base)] for i in range(args.requests)]
        lengths = [len(p) for p in prompts]

    # warmup: compile prefill buckets + BOTH decode variants (full burst and
    # the single-step tail) — burst+1 tokens forces one burst then one single
    warm_toks = burst + 1 if burst > 1 else 2
    for L in sorted(set(lengths)):
        eng.generate_sync(list(rng.integers(0, config.vocab_size, L)),
                          SamplingParams(max_tokens=warm_toks, temperature=0.0))
    if args.prefix_caching:
        # a repeated prompt compiles the prefix-hit admission path (gather +
        # offset-started chunks) for each bucket
        for L in sorted(set(lengths)):
            w = list(rng.integers(0, config.vocab_size, L))
            for _ in range(2):
                eng.generate_sync(
                    w, SamplingParams(max_tokens=warm_toks, temperature=0.0))

    # admission cap applies to the measured load only — warmup submits
    # above must never shed (max_queue=0 would reject even those)
    eng.max_queue = args.max_queue
    reqs = []
    rejected = 0
    t_start = time.perf_counter()
    next_submit = 0.0
    i = 0
    while i < args.requests or any(
        r.finish_time is None for r in reqs
    ):
        now = time.perf_counter() - t_start
        if i < args.requests and now >= next_submit:
            p = (prompts[i] if prompts is not None
                 else list(rng.integers(0, config.vocab_size, lengths[i])))
            try:
                reqs.append(eng.submit(p, sp))
            except Exception as e:  # EngineOverloaded: shed, don't queue
                if type(e).__name__ != "EngineOverloaded":
                    raise
                rejected += 1
            i += 1
            next_submit = now + float(rng.exponential(args.arrival_mean))
        if not eng.step():
            time.sleep(0.001)
        if time.perf_counter() - t_start > 600:
            raise TimeoutError("bench did not finish")
    wall = time.perf_counter() - t_start

    if not reqs:
        print(json.dumps({"metric": "serving_ttft_and_throughput",
                          "requests": 0, "rejected": rejected,
                          "note": "all requests shed by max_queue"}))
        return
    ttfts = np.array([r.ttft for r in reqs])
    # TTFT decomposition from recorded engine timestamps (VERDICT r3 #7):
    # queue = enqueue -> prefill admission (scheduling/admission policy);
    # service = admission -> first token (device + dispatch + relay). A
    # degraded relay inflates SERVICE; queueing conclusions (admission
    # control bounding the backlog) read from the QUEUE columns.
    queues = np.array([r.queue_time for r in reqs if r.queue_time is not None])
    servs = np.array([r.prefill_service_time for r in reqs
                      if r.prefill_service_time is not None])
    total_tokens = eng.metrics["tokens_generated"]
    out = {
        "metric": "serving_ttft_and_throughput",
        "preset": args.preset,
        "requests": args.requests,
        "ttft_p50_ms": round(float(np.percentile(ttfts, 50)) * 1e3, 1),
        "ttft_p99_ms": round(float(np.percentile(ttfts, 99)) * 1e3, 1),
        "queue_p50_ms": round(float(np.percentile(queues, 50)) * 1e3, 1),
        "queue_p99_ms": round(float(np.percentile(queues, 99)) * 1e3, 1),
        "prefill_service_p50_ms": round(float(np.percentile(servs, 50)) * 1e3, 1),
        "prefill_service_p99_ms": round(float(np.percentile(servs, 99)) * 1e3, 1),
        "tokens_per_s": round(total_tokens / wall, 1),
        "wall_s": round(wall, 1),
        "decode_steps": eng.metrics["steps"],
        "decode_burst": burst,
        "prefix_hit_tokens": eng.metrics["prefix_hit_tokens"],
        "spec_accept_rate": round(
            eng.metrics["spec_accepted"] / max(eng.metrics["spec_drafted"], 1), 3
        ) if args.spec_k else None,
        "max_queue": args.max_queue,
        "rejected": rejected,
    }
    out.update(eng.step_time_stats())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
