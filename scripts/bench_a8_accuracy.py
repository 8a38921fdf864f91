"""Model-level accuracy cost of the W4A8 activation rounding (VERDICT r3 #2).

Measures, on an outlier-injected random 0.6B-geometry model (the quality
ladder's synthetic stand-in for trained-LLM channel dynamics):

  - logits-MSE vs the dense model for the exact W4A16 path ("xla") and the
    a8 activation-rounded path ("w4a8_xla" — every token quantized like the
    serving decode kernel)
  - top-1 agreement of each vs dense, and of w4a8 vs W4A16 directly (the
    marginal flip rate the int8-MXU serving mode adds)

The only numerical difference between the two quant paths is the
per-(token, 128-group) int8 rounding of rotated activations; the per-matmul
bound is ~0.7% mean rel (ops/qlinear.py), this script reports what survives
28 layers. Prints one JSON line. CPU-runnable (a8 sim is backend-exact).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="qwen3-0.6b")
    ap.add_argument("--outlier-scale", type=float, default=8.0)
    ap.add_argument("--n-seq", type=int, default=4)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu", "auto"])
    args = ap.parse_args()

    from paroquant_tpu.utils import force_platform

    force_platform(args.device)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "experiments" / "baselines"))
    from quality_ladder import inject_outlier_channels

    from paroquant_tpu.convert import quantize_model_rtn
    from paroquant_tpu.models import PRESETS, init_params, model_forward

    config = PRESETS[args.preset]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    params = inject_outlier_channels(params, config, args.outlier_scale)
    qparams = quantize_model_rtn(params, config, n_bits=4, group_size=128)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(
        rng.integers(0, config.vocab_size, (args.n_seq, args.seqlen)), jnp.int32
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("mode",))
    def logits_of(p, mode):
        out, _ = model_forward(p, config, toks, None, quant_mode=mode)
        return out.astype(jnp.float32)

    dense = np.asarray(logits_of(params, "xla"))
    w4 = np.asarray(logits_of(qparams, "xla"))
    a8 = np.asarray(logits_of(qparams, "w4a8_xla"))

    def mse(a, b):
        return float(np.mean((a - b) ** 2))

    def top1(a, b):
        return float(np.mean(np.argmax(a, -1) == np.argmax(b, -1)))

    print(json.dumps({
        "metric": "w4a8_model_accuracy",
        "preset": args.preset,
        "outlier_scale": args.outlier_scale,
        "tokens": args.n_seq * args.seqlen,
        "mse_w4a16_vs_dense": round(mse(w4, dense), 5),
        "mse_w4a8_vs_dense": round(mse(a8, dense), 5),
        "mse_ratio_a8_over_a16": round(mse(a8, dense) / max(mse(w4, dense), 1e-12), 4),
        "top1_w4a16_vs_dense": round(top1(w4, dense), 4),
        "top1_w4a8_vs_dense": round(top1(a8, dense), 4),
        "top1_w4a8_vs_w4a16": round(top1(a8, w4), 4),
        "mse_w4a8_vs_w4a16": round(mse(a8, w4), 5),
    }), flush=True)


if __name__ == "__main__":
    main()
