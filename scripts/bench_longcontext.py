"""Long-context serving drive (round-4 VERDICT item 4).

Three arms on the real chip, each printing one JSON line:

  --arm ttft16k   Engine chunked-prefill TTFT on a 16k-token prompt
                  (flash prefill + sliding-window skip on TPU; chunk 2048)
  --arm gen32k    one request generating to a 32k total context through the
                  paged pool (decode burst amortizes the relay round-trip);
                  proves pool growth + finish_reason="length" at scale
  --arm ppl16k    a 16k-token PPL window at Qwen3-8B geometry (W4 random
                  weights; flash prefill — einsum would need a 4GB score
                  tensor per head block)

The reference's protocol reaches 32k contexts only through vLLM's paged
attention (reasoning evals, inference.py:63-72, generation_size=32768);
these arms drive OUR paged pool / flash kernels at the same scale.
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


def build_w4(preset: str, layers: int | None = None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from paroquant_tpu.convert import quantize_model_rtn
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.models.decoder import merge_projections

    cfg = PRESETS[preset]
    if layers:
        cfg = dataclasses.replace(cfg, num_hidden_layers=layers)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        q = quantize_model_rtn(params, cfg, n_bits=4, group_size=128)
        q = merge_projections(q, cfg)
    dev = jax.devices()[0]
    q = jax.device_put(q, dev)
    jax.block_until_ready(jax.tree.leaves(q["layers"][0])[0])
    return q, cfg


def arm_ttft16k(args):
    import jax.numpy as jnp

    from paroquant_tpu.serve import Engine, SamplingParams

    q, cfg = build_w4("qwen3-0.6b")
    eng = Engine(
        q, cfg, max_batch=2, max_len=args.prompt_len + 256,
        page_size=128, quant_mode="auto", prefill_chunk=args.chunk,
        decode_burst=8,
    )
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, cfg.vocab_size, args.prompt_len))
    sp = SamplingParams(max_tokens=16, temperature=0.0)
    def run_once(p):
        t0 = time.perf_counter()
        req = eng.submit(p, sp)
        first = None
        toks = []
        while len(toks) < 16:
            eng.step()
            while not req.out_queue.empty():
                kind, t = req.out_queue.get_nowait()
                if kind == "token":
                    if first is None:
                        first = time.perf_counter() - t0
                    toks.append(t)
                elif kind == "done":
                    break
            if time.perf_counter() - t0 > 900:
                raise TimeoutError
        return first

    # cold includes the 16k-bucket prefill compile; warm is the serving number
    cold = run_once(prompt)
    rng2 = np.random.default_rng(1)
    warm = run_once(list(rng2.integers(0, cfg.vocab_size, args.prompt_len)))
    n_chunks = (args.prompt_len + args.chunk - 1) // args.chunk
    print(json.dumps({
        "metric": "long_context_ttft",
        "prompt_tokens": args.prompt_len,
        "prefill_chunk": args.chunk,
        "ttft_cold_s": round(cold, 2),
        "ttft_warm_s": round(warm, 2),
        "chunks": n_chunks,
        "warm_ms_per_chunk": round(warm * 1e3 / n_chunks, 1),
    }), flush=True)


def arm_gen32k(args):
    from paroquant_tpu.serve import Engine, SamplingParams

    q, cfg = build_w4("qwen3-0.6b")
    total = args.gen_total  # prompt + generation target (default 32768)
    eng = Engine(
        q, cfg, max_batch=1, max_len=total + 64, page_size=128,
        quant_mode="auto", decode_burst=32,
    )
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, cfg.vocab_size, 32))
    n_gen = total - len(prompt)
    sp = SamplingParams(max_tokens=n_gen, temperature=0.8, seed=7)
    req = eng.submit(prompt, sp)
    t0 = time.perf_counter()
    n = 0
    finish = None
    marks = {}
    while True:
        eng.step()
        drained = False
        while not req.out_queue.empty():
            kind, t = req.out_queue.get_nowait()
            drained = True
            if kind == "token":
                n += 1
                for m in (1024, 8192, 16384, 24576, n_gen):
                    if n == m:
                        marks[m] = round(n / (time.perf_counter() - t0), 1)
            elif kind == "done":
                finish = "done"
        if finish:
            break
        if not drained and time.perf_counter() - t0 > args.timeout:
            break
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "long_context_generation",
        "target_total_context": total,
        "generated": n,
        "finish": finish,
        "wall_s": round(wall, 1),
        "tok_s_overall": round(n / wall, 1),
        "tok_s_at_mark": marks,
        "pages_used": len(eng.slots[0].pages) if eng.slots[0].request else "freed",
        **eng.step_time_stats(),
    }), flush=True)


def arm_ppl16k(args):
    import jax
    import jax.numpy as jnp

    from paroquant_tpu.cli.evaluate import perplexity

    q, cfg = build_w4("qwen3-8b", layers=args.layers)
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, args.window).astype(np.int32)
    t0 = time.perf_counter()
    ppl = perplexity(q, cfg, toks, args.window, "auto", batch=1)
    wall = time.perf_counter() - t0
    dev = jax.devices()[0]
    stats = dev.memory_stats() or {}
    print(json.dumps({
        "metric": "long_window_ppl_8b_geometry",
        "window_tokens": args.window,
        "layers": args.layers or "full",
        "ppl_random_weights": round(ppl, 1),
        "wall_s": round(wall, 1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
    }), flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", required=True,
                    choices=["ttft16k", "gen32k", "ppl16k"])
    ap.add_argument("--prompt-len", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--gen-total", type=int, default=32768)
    ap.add_argument("--window", type=int, default=16384)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=3000)
    args = ap.parse_args()
    {"ttft16k": arm_ttft16k, "gen32k": arm_gen32k, "ppl16k": arm_ppl16k}[args.arm](args)


if __name__ == "__main__":
    main()
