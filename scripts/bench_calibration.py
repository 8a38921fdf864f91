"""Calibration throughput at production layer scale (VERDICT r1 weak #9).

Times the layer-wise calibration pipeline (teacher capture -> pseudo-quant
optimization -> hard quantize -> student re-capture) on Qwen3-8B-geometry
layers (hidden 4096, inter 12288) with the canonical two-stage recipe
trimmed to --epochs per stage, then extrapolates to the full 36-layer model
at the reference's 2048x2048-token protocol. Prints one JSON line.

Run on TPU:  python scripts/bench_calibration.py
CPU sanity:  python scripts/bench_calibration.py --device cpu --tokens 4096
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
    ap.add_argument("--preset", default="qwen3-8b")
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--tokens", type=int, default=65536,
                    help="total calibration tokens (batches derived)")
    ap.add_argument("--epochs", type=int, default=1, help="epochs per stage")
    ap.add_argument("--act-dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--resident-gb", type=float, default=8.0)
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from paroquant_tpu.models import PRESETS, init_params
    from paroquant_tpu.optim import CalibConfig, calibrate_model

    config = dataclasses.replace(PRESETS[args.preset], num_hidden_layers=args.layers)
    full_layers = PRESETS[args.preset].num_hidden_layers
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if jax.devices()[0].platform != "cpu":
        params = jax.device_put(params, jax.devices()[0])

    n_batches = max(2, args.tokens // (args.batch * args.seqlen))
    rng = np.random.default_rng(0)
    token_batches = rng.integers(
        0, config.vocab_size, (n_batches, args.batch, args.seqlen)
    ).astype(np.int32)

    ccfg = CalibConfig(
        n_bits=4, group_size=128, num_rotations=8,
        stages=(
            ({"channel_scales": 5e-2, "angles": 5e-2}, args.epochs),
            ({"weight": 1e-5, "quantizer": 1e-6}, args.epochs),
        ),
        act_dtype=jnp.bfloat16 if args.act_dtype == "bfloat16" else np.float32,
        resident_act_bytes=int(args.resident_gb * 2**30),
    )
    per_layer_times: list[float] = []
    t_prev = time.perf_counter()

    def progress(li, n, info):
        nonlocal t_prev
        now = time.perf_counter()
        per_layer_times.append(now - t_prev)
        t_prev = now

    t0 = time.perf_counter()
    qparams, results = calibrate_model(
        params, config, token_batches, ccfg, progress_fn=progress
    )
    wall = time.perf_counter() - t0

    # steady-state = the LAST layer (first layer pays all stage compiles)
    steady = per_layer_times[-1] if per_layer_times else wall
    ref_epochs = 5  # canonical recipe epochs per stage (4bit.sh)
    ref_tokens = 2048 * 2048
    scale = (ref_epochs / args.epochs) * (ref_tokens / (n_batches * args.batch * args.seqlen))
    est_full_h = full_layers * steady * scale / 3600
    out = {
        "metric": "calibration_layer_seconds_8b_geometry",
        "value": round(steady, 1),
        "unit": "s/layer",
        "tokens": int(n_batches * args.batch * args.seqlen),
        "epochs_per_stage": args.epochs,
        "first_layer_s": round(per_layer_times[0], 1) if per_layer_times else None,
        "wall_s": round(wall, 1),
        "est_full_recipe_hours_36L_4M_tokens": round(est_full_h, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
