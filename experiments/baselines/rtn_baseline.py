"""RTN W4 baseline driver: dense checkpoint -> round-to-nearest quantized
PARO-TPU checkpoint, no calibration (the reference's baseline family runs
external repos, experiments/baselines/*; RTN is the in-framework anchor)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="dense checkpoint dir or preset:<name>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-bits", type=int, default=4)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--quantize-lm-head", action="store_true")
    ap.add_argument("--hadamard", action="store_true",
                    help="rotate each group by the Hadamard-equivalent "
                         "butterfly before quantizing (QuaRot/SpinQuant-style)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side conversion
    import jax.numpy as jnp

    from paroquant_tpu.convert.checkpoint import save_paro_checkpoint
    from paroquant_tpu.convert.rtn import rtn_export_model
    from paroquant_tpu.convert import load_checkpoint
    from paroquant_tpu.models import PRESETS, init_params

    if args.model.startswith("preset:"):
        config = PRESETS[args.model.split(":", 1)[1]]
        params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    else:
        params, config = load_checkpoint(args.model, dtype=jnp.float32)
    exports = rtn_export_model(
        params, config, n_bits=args.n_bits, group_size=args.group_size,
        hadamard=args.hadamard,
    )
    save_paro_checkpoint(args.output, params, config, exports)
    kind = "Hadamard-RTN" if args.hadamard else "RTN"
    print(f"{kind} W4 checkpoint written to {args.output}")


if __name__ == "__main__":
    main()
