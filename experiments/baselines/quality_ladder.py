"""Quality ladder: dense -> RTN -> Hadamard -> GPTQ -> QuaRot -> ParoQuant.

Runs every in-framework quantizer on the SAME model + calibration data and
reports logits-MSE vs the dense model on held-out tokens — the in-repo proof
that the learned-rotation optimizer beats the no-training baselines, and
where each anchor sits (the reference proves this with external-repo
baselines + real-data PPL, experiments/README.md; on a zero-egress box the
ladder is the protocol-compatible equivalent).

Usage (tiny smoke, CPU):
  JAX_PLATFORMS=cpu python experiments/baselines/quality_ladder.py
  python experiments/baselines/quality_ladder.py --model <dense_ckpt> \
      --datasets wikitext2 --n-samples 64 --seqlen 512
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="preset:tiny")
    ap.add_argument("--datasets", default="synthetic")
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=64)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3, help="per optimizer stage")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from paroquant_tpu.convert import (
        gptq_quantize_model,
        load_checkpoint,
        quantize_model_rtn,
    )
    from paroquant_tpu.models import PRESETS, init_params, model_forward
    from paroquant_tpu.optim import CalibConfig, calibrate_model
    from paroquant_tpu.optim.data import get_calib_dataset

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

    gs = args.group_size
    if config.hidden_size % gs:
        gs = 64 if config.hidden_size % 64 == 0 else gs
    calib = get_calib_dataset(
        args.datasets.split(",")[0], tokenizer, args.n_samples, args.seqlen,
        seed=args.seed, vocab_size=config.vocab_size,
    )
    held = get_calib_dataset(
        args.datasets.split(",")[0], tokenizer, max(2, args.n_samples // 4),
        args.seqlen, seed=args.seed + 1, vocab_size=config.vocab_size,
    )
    held_j = jnp.asarray(held)

    ref, _ = model_forward(params, config, held_j)

    def mse(qparams):
        out, _ = model_forward(qparams, config, held_j)
        return float(jnp.mean((out - ref) ** 2))

    results = {}
    results["rtn"] = mse(
        quantize_model_rtn(params, config, group_size=gs, rot_dtype=jnp.float32)
    )
    results["hadamard"] = mse(
        quantize_model_rtn(
            params, config, group_size=gs, rot_dtype=jnp.float32, hadamard=True
        )
    )
    # rot_dtype=f32 keeps every arm dtype-matched with the RTN/Hadamard arms
    # (the gptq driver defaults to bf16 rotations — ADVICE r2 fairness fix)
    gq, _ = gptq_quantize_model(
        params, config, calib, group_size=gs, rot_dtype=jnp.float32
    )
    results["gptq"] = mse(gq)
    qr, _ = gptq_quantize_model(
        params, config, calib, group_size=gs, hadamard=True, rot_dtype=jnp.float32
    )
    results["quarot"] = mse(qr)

    # learned rotations+scales (trimmed canonical recipe)
    ccfg = CalibConfig(
        group_size=gs, num_rotations=8, seed=args.seed,
        stages=(
            ({"channel_scales": 5e-2, "angles": 5e-2}, args.epochs),
            ({"weight": 1e-5, "quantizer": 1e-6}, args.epochs),
        ),
    )
    B = min(4, args.n_samples)
    tb = calib[: (len(calib) // B) * B].reshape(-1, B, args.seqlen)
    pq, _ = calibrate_model(params, config, tb, ccfg)
    results["paroquant"] = mse(pq)

    print(f"{'arm':>10}  logits-MSE vs dense (held-out)")
    for k, v in results.items():
        print(f"{k:>10}  {v:.6g}")
    print(json.dumps({"metric": "quality_ladder_logits_mse", **results}))


if __name__ == "__main__":
    main()
