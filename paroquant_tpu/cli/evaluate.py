"""Perplexity evaluation CLI (reference cli/evaluate.py:14-23,46-74).

Protocol parity: non-overlapping windows of --seqlen tokens, mean token
cross-entropy, PPL = exp(mean CE). Datasets: WikiText-2 test / C4 validation
when available locally (HF datasets cache — this box has zero egress), a raw
token .npy file via --token-file, or --synthetic for infrastructure checks.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_eval_tokens(name: str, tokenizer, n_tokens: int, seed: int = 0) -> np.ndarray:
    if name == "wikitext2":
        from datasets import load_dataset

        data = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
        text = "\n\n".join(data["text"])
        return np.asarray(tokenizer(text).input_ids[:n_tokens], np.int32)
    if name == "c4":
        from datasets import load_dataset

        data = load_dataset(
            "allenai/c4", data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
            split="validation",
        )
        rng = np.random.default_rng(seed)
        ids: list[int] = []
        idx = rng.permutation(len(data))
        for i in idx:
            ids.extend(tokenizer(data[int(i)]["text"]).input_ids)
            if len(ids) >= n_tokens:
                break
        return np.asarray(ids[:n_tokens], np.int32)
    raise ValueError(name)


def perplexity(params, config, tokens: np.ndarray, seqlen: int, quant_mode: str,
               batch: int = 1) -> float:
    """exp(mean CE) over non-overlapping seqlen windows (evaluate.py:61-74)."""
    import jax
    import jax.numpy as jnp

    from ..models.decoder import model_forward

    n_win = len(tokens) // seqlen
    assert n_win > 0, "not enough tokens for one window"

    @jax.jit
    def window_ce(tok):
        logits, _ = model_forward(params, config, tok, None, quant_mode=quant_mode)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tok[:, 1:]
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(ce), ce.size

    total, count = 0.0, 0
    for w in range(0, n_win, batch):
        nb = min(batch, n_win - w)
        win = tokens[w * seqlen : (w + nb) * seqlen].reshape(nb, seqlen)
        s, c = window_ce(jnp.asarray(win, jnp.int32))
        total += float(s)
        count += int(c)
    return float(np.exp(total / count))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--datasets", nargs="+", default=["wikitext2", "c4"])
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--num-tokens", type=int, default=2048 * 128)
    ap.add_argument("--token-file", default=None, help=".npy int token ids")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--quant-mode", default=None, choices=["xla", "fused", "auto"])
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    args = ap.parse_args(argv)

    from ..utils import force_platform

    force_platform(args.device)

    from ..convert import load_checkpoint
    from ..serve.generator import detect_backend, load_tokenizer

    params, config = load_checkpoint(args.model)
    qmode = args.quant_mode or ("auto" if detect_backend() == "tpu" else "xla")

    if args.synthetic:
        rng = np.random.default_rng(0)
        toks = rng.integers(0, config.vocab_size, args.num_tokens).astype(np.int32)
        ppl = perplexity(params, config, toks, args.seqlen, qmode)
        print(f"synthetic ppl: {ppl:.4f}")
        return
    if args.token_file:
        toks = np.load(args.token_file).astype(np.int32)
        ppl = perplexity(params, config, toks, args.seqlen, qmode)
        print(f"{args.token_file} ppl: {ppl:.4f}")
        return

    tokenizer = load_tokenizer(args.model)
    if tokenizer is None:
        print("no tokenizer in model dir; use --token-file or --synthetic", file=sys.stderr)
        sys.exit(2)
    for name in args.datasets:
        toks = load_eval_tokens(name, tokenizer, args.num_tokens)
        ppl = perplexity(params, config, toks, args.seqlen, qmode)
        print(f"{name} ppl: {ppl:.4f}")


if __name__ == "__main__":
    main()
