"""GPTQ W4 baseline driver: dense checkpoint + calibration data -> Hessian-
compensated quantized PARO-TPU checkpoint (identity rotation).

The second-order in-framework anchor between RTN (no calibration,
rtn_baseline.py) and the full ParoQuant rotation optimizer (cli/optimize.py).
The reference's baseline family wraps external repos
(/root/reference/experiments/baselines/*); on a zero-egress box we anchor
against protocol-compatible in-framework implementations instead.

Usage:
  python experiments/baselines/gptq_baseline.py \
      --model preset:tiny --datasets synthetic --n-samples 16 --seqlen 128 \
      --output /tmp/gptq_ckpt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="dense checkpoint dir or preset:<name>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--datasets", default="wikitext2", help="comma-separated")
    ap.add_argument("--n-samples", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--n-bits", type=int, default=4)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--percdamp", type=float, default=0.01)
    ap.add_argument("--hadamard", action="store_true",
                    help="compose the Hadamard group mixer with GPTQ "
                         "(the QuaRot recipe)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from paroquant_tpu.convert import load_checkpoint, save_paro_checkpoint
    from paroquant_tpu.convert.gptq import gptq_quantize_model
    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.optim.data import get_mixed_calib_dataset

    tokenizer = None
    if args.model.startswith("preset:"):
        config = PRESETS[args.model.split(":", 1)[1]]
        params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    else:
        params, config = load_checkpoint(args.model, dtype=jnp.float32)
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            tokenizer = None

    tokens = get_mixed_calib_dataset(
        args.datasets.split(","), tokenizer, args.n_samples, args.seqlen,
        seed=args.seed, vocab_size=config.vocab_size,
    )
    qparams, exports = gptq_quantize_model(
        params, config, tokens,
        n_bits=args.n_bits, group_size=args.group_size,
        percdamp=args.percdamp, batch_size=args.batch_size,
        hadamard=args.hadamard,
        log_fn=lambda m: print(m, flush=True),
    )
    save_paro_checkpoint(args.output, params, config, exports)
    kind = "QuaRot (Hadamard+GPTQ)" if args.hadamard else "GPTQ"
    print(f"{kind} W4 checkpoint written to {args.output}")


if __name__ == "__main__":
    main()
