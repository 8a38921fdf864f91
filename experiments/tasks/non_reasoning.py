"""Non-reasoning (multiple-choice loglikelihood) eval harness.

The reference runs lm_eval on arc_challenge/arc_easy/boolq/hellaswag
(experiments/tasks/non_reasoning.sh). This is the same protocol implemented
in-framework: per example, score each answer choice by the sum of
log-probabilities of its continuation tokens given the context, pick the
argmax (acc) and the length-normalized argmax (acc_norm, lm_eval's metric
for arc/hellaswag).

Data: --data <task.jsonl> with rows {"query": str, "choices": [str, ...],
"gold": int} (the lm_eval docs' canonical MC form; export real tasks to this
with any lm_eval dump). --synthetic runs the protocol on generated data so
the harness is exercisable on a zero-egress box.

The same protocol is also servable: POST /v1/completions with
{"echo": true, "logprobs": 1, "max_tokens": 0} returns per-token prompt
logprobs (serve/api.py), so stock lm_eval's OpenAI-completions backend can
score against a running `paroquant_tpu.cli.serve` instance.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def loglikelihood_batch(params, config, tokenizer, contexts, continuations,
                        quant_mode, seqlen=2048):
    """Sum of continuation-token logprobs for each (context, continuation)."""
    import jax
    import jax.numpy as jnp

    from paroquant_tpu.models import model_forward

    out = []
    for ctx, cont in zip(contexts, continuations):
        ctx_ids = tokenizer.encode(ctx)
        cont_ids = tokenizer.encode(cont)
        ids = (ctx_ids + cont_ids)[-seqlen:]
        n_cont = min(len(cont_ids), len(ids) - 1)
        toks = jnp.asarray(np.asarray(ids, np.int32)[None, :])
        logits, _ = model_forward(params, config, toks, quant_mode=quant_mode)
        logp = np.asarray(
            jnp.take_along_axis(
                jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1),
                toks[0, 1:, None].astype(jnp.int32), axis=-1,
            )[:, 0]
        )
        out.append(float(logp[-n_cont:].sum()))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--data", default=None, help="task jsonl (query/choices/gold)")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--quant-mode", default="xla", choices=["xla", "fused"])
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--seqlen", type=int, default=2048)
    args = ap.parse_args(argv)

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from paroquant_tpu.convert import load_checkpoint
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.serve.generator import load_tokenizer

    if args.model.startswith("preset:"):
        config = PRESETS[args.model.split(":", 1)[1]]
        params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        tokenizer = None
    else:
        params, config = load_checkpoint(args.model)
        tokenizer = load_tokenizer(args.model)

    if args.synthetic or args.data is None:
        rng = np.random.default_rng(0)

        class _Tok:
            def encode(self, s):
                h = abs(hash(s))
                n = 4 + h % 12
                return [(h >> (i * 7)) % config.vocab_size for i in range(n)]

        tokenizer = tokenizer or _Tok()
        examples = [
            {
                "query": f"synthetic question {i}?",
                "choices": [f"choice {i}-{c}" for c in range(4)],
                "gold": int(rng.integers(0, 4)),
            }
            for i in range(args.limit or 16)
        ]
        task = "synthetic"
    else:
        examples = [json.loads(l) for l in open(args.data)]
        if args.limit:
            examples = examples[: args.limit]
        task = Path(args.data).stem
        if tokenizer is None:
            raise SystemExit("real data requires a tokenizer next to --model")

    t0 = time.time()
    correct = correct_norm = 0
    for ex in examples:
        ctxs = [ex["query"]] * len(ex["choices"])
        conts = [" " + c for c in ex["choices"]]
        lls = loglikelihood_batch(
            params, config, tokenizer, ctxs, conts, args.quant_mode, args.seqlen
        )
        lens = [max(len(tokenizer.encode(" " + c)), 1) for c in ex["choices"]]
        pred = int(np.argmax(lls))
        pred_norm = int(np.argmax([l / n for l, n in zip(lls, lens)]))
        correct += pred == ex["gold"]
        correct_norm += pred_norm == ex["gold"]
    n = len(examples)
    print(json.dumps({
        "task": task, "n": n,
        "acc": correct / n, "acc_norm": correct_norm / n,
        "seconds": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
