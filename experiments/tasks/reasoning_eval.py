"""Reasoning eval harness over the OpenAI-compatible serve endpoint.

The reference's reasoning evals run lighteval+vLLM with a custom pipeline
(experiments/tasks/reasoning/lighteval_custom/): generation_size=32768,
temperature 0.6, top_p 0.95, seeds 42/0/1, extractive-match metric
(\\boxed{...} or last number). This harness reproduces that protocol against
our serving stack: point it at a running `python -m paroquant_tpu.cli.serve`
endpoint and a task JSONL with rows {"problem": str, "answer": str}.

Smoke mode (--synthetic) exercises the full loop with trivial arithmetic
prompts so the harness runs on a zero-egress box.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
import urllib.request
from pathlib import Path

BOXED = re.compile(r"\\boxed\{([^{}]+)\}")
LAST_NUMBER = re.compile(r"(-?\d+(?:\.\d+)?)(?!.*-?\d)")


def extract_answer(text: str) -> str | None:
    """Extractive match (reference reasoning.py metric): prefer \\boxed{},
    fall back to the last number in the completion."""
    m = BOXED.search(text)
    if m:
        return m.group(1).strip()
    m = LAST_NUMBER.search(text)
    return m.group(1) if m else None


def norm_answer(a: str) -> str:
    a = a.strip().rstrip(".")
    try:
        f = float(a)
        return str(int(f)) if f == int(f) else str(f)
    except ValueError:
        return a


def query_endpoint(base_url, prompt, *, max_tokens, temperature, top_p, seed,
                   timeout=3600.0):
    body = json.dumps({
        "messages": [{"role": "user", "content": prompt}],
        "max_tokens": max_tokens,
        "temperature": temperature,
        "top_p": top_p,
        "seed": seed,
    }).encode()
    req = urllib.request.Request(
        f"{base_url}/v1/chat/completions", data=body,
        headers={"Content-Type": "application/json"},
    )
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        out = json.load(r)
    choice = out["choices"][0]
    return {
        "text": choice["message"]["content"],
        "completion_tokens": out.get("usage", {}).get("completion_tokens", 0),
        "finish_reason": choice.get("finish_reason"),
        "wall_s": time.time() - t0,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--endpoint", default="http://127.0.0.1:8000")
    ap.add_argument("--data", default=None, help="jsonl rows {problem, answer}")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    # reference protocol: 32k tokens, temp 0.6, top_p 0.95, seeds 42/0/1
    ap.add_argument("--max-tokens", type=int, default=32768)
    ap.add_argument("--temperature", type=float, default=0.6)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--seeds", type=int, nargs="+", default=[42, 0, 1])
    ap.add_argument("--concurrency", type=int, default=1,
                    help="in-flight requests (the engine batches them; the "
                         "protocol's seed/example grid is order-independent)")
    args = ap.parse_args(argv)

    if args.synthetic or args.data is None:
        examples = [
            {"problem": f"What is {a} + {b}? Answer with the number only.",
             "answer": str(a + b)}
            for a, b in [(2, 3), (10, 7), (41, 1)]
        ][: args.limit or 3]
        task = "synthetic-arithmetic"
    else:
        examples = [json.loads(l) for l in open(args.data)]
        if args.limit:
            examples = examples[: args.limit]
        task = Path(args.data).stem

    t0 = time.time()

    def run_one(seed, ex):
        try:
            return seed, ex, query_endpoint(
                args.endpoint, ex["problem"], max_tokens=args.max_tokens,
                temperature=args.temperature, top_p=args.top_p, seed=seed,
            )
        except Exception as e:  # endpoint down/slow: fail loudly per item
            print(f"request failed: {e}", file=sys.stderr)
            return seed, ex, None

    grid = [(s, ex) for s in args.seeds for ex in examples]
    if args.concurrency > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(args.concurrency) as pool:
            results = list(pool.map(lambda se: run_one(*se), grid))
    else:
        results = [run_one(s, ex) for s, ex in grid]
    wall = time.time() - t0

    per_seed_correct = {s: 0 for s in args.seeds}
    finish_reasons: dict[str, int] = {}
    gen_tokens, req_tok_s = 0, []
    for seed, ex, r in results:
        if r is None:
            finish_reasons["error"] = finish_reasons.get("error", 0) + 1
            continue
        got = extract_answer(r["text"])
        per_seed_correct[seed] += (
            got is not None and norm_answer(got) == norm_answer(ex["answer"])
        )
        finish_reasons[r["finish_reason"]] = (
            finish_reasons.get(r["finish_reason"], 0) + 1
        )
        gen_tokens += r["completion_tokens"]
        if r["wall_s"] > 0:
            req_tok_s.append(r["completion_tokens"] / r["wall_s"])
    per_seed_acc = {s: c / len(examples) for s, c in per_seed_correct.items()}
    accs = list(per_seed_acc.values())
    req_tok_s.sort()
    print(json.dumps({
        "task": task, "n": len(examples), "seeds": args.seeds,
        "max_tokens": args.max_tokens, "concurrency": args.concurrency,
        "acc_per_seed": {str(k): v for k, v in per_seed_acc.items()},
        "acc_mean": sum(accs) / len(accs),
        "finish_reasons": finish_reasons,
        "gen_tokens": gen_tokens,
        "agg_tok_s": round(gen_tokens / wall, 1) if wall > 0 else None,
        "per_req_tok_s_p50": (
            round(req_tok_s[len(req_tok_s) // 2], 1) if req_tok_s else None
        ),
        "seconds": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
