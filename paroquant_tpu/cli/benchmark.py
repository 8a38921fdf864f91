"""Decode-throughput benchmark CLI (reference cli/benchmark.py:8-49:
single-stream greedy, warmup + N timed runs, avg tokens/time/tok-s).
Also fixes the reference's flag drift: --prefill-len/--decode-len are
accepted (experiments/throughput/bench.sh passes them but the reference
CLI never did — SURVEY.md §2.4)."""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--prefill-len", type=int, default=256)
    ap.add_argument("--decode-len", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--quant-mode", default=None, choices=["xla", "fused", "auto", "w4a8"])
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--decode-burst", type=int, default=None,
                    help="sample+decode steps fused per dispatch (default: 8 on TPU)")
    ap.add_argument("--spec-k", type=int, default=0,
                    help=">0: prompt-lookup speculative greedy decoding with "
                         "k-token drafts (exact greedy output)")
    args = ap.parse_args(argv)

    from ..utils import force_platform

    force_platform(args.device)

    from ..serve.generator import Generator, detect_backend
    from ..serve.sampling import SamplingParams

    on_tpu = detect_backend() == "tpu"
    burst = args.decode_burst if args.decode_burst is not None else (8 if on_tpu else 1)
    gen = Generator.from_pretrained(
        args.model,
        max_len=args.prefill_len + args.decode_len + 8,
        quant_mode=args.quant_mode,
        decode_burst=burst,
        lookup_spec_k=args.spec_k,
    )
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, gen.config.vocab_size, args.prefill_len))
    sp = SamplingParams(max_tokens=args.decode_len, temperature=0.0, stop_token_ids=())

    print(f"backend={detect_backend()} quant_mode={gen.quant_mode}")
    for i in range(args.warmup):
        gen.generate(prompt, sp)
    stats = [gen.generate(prompt, sp).stats for _ in range(args.runs)]
    tps = [s.tokens_per_second for s in stats]
    ttft = [s.ttft for s in stats]
    print(
        f"prefill={args.prefill_len} decode={args.decode_len} runs={args.runs}\n"
        f"ttft: {np.mean(ttft)*1e3:.1f} ms  decode: {np.mean(tps):.2f} tok/s "
        f"(min {min(tps):.2f}, max {max(tps):.2f})"
    )
    if args.spec_k:
        m = gen.spec_metrics
        rate = m["accepted"] / max(m["drafted"], 1)
        print(
            f"speculation: {m['windows']} windows, "
            f"{m['accepted']}/{m['drafted']} drafts accepted ({rate:.1%}), "
            f"{(m['accepted'] + m['windows']) / max(m['windows'], 1):.2f} tok/window"
        )


if __name__ == "__main__":
    main()
