"""Per-linear optimization convergence across rotation variants (reference
plot_rotation_optimization_convergence.py: pairwise rotations vs Hadamard /
full rotation vs scales-only, loss vs steps on one layer's linears).

TPU-native counterpart: optimize ONE outlier-heavy linear against its FP
output under each variant — scales-only (the no_rotation ablation / AWQ-like
baseline), seeded random independent pairs at K in {1, 2, 8} (the reference
protocol), and the butterfly pairing — logging the distillation loss every
step through optimize_linears' log_fn. Runs on CPU in under a minute with
--demo shapes; point --out wherever. Writes
figures/optimization_convergence.png and prints the final losses.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def run_variant(w, xs, y_fp, rot, groups, epochs, label, losses):
    import jax.numpy as jnp

    from paroquant_tpu.optim import make_pseudo_linear, optimize_linears, pseudo_linear_forward

    lin = make_pseudo_linear(w, rot, n_bits=4, group_size=128)

    def apply_fn(linears, x):
        return pseudo_linear_forward(linears["lin"], x)

    batches = [(jnp.asarray(xs[i]), jnp.asarray(y_fp[i])) for i in range(len(xs))]
    trace: list[float] = []

    def log_fn(metrics, step):
        if "loss" in metrics:
            trace.append(metrics["loss"])

    optimize_linears(
        apply_fn, {"lin": lin}, batches[:-1], batches[-1:], groups,
        n_epochs=epochs, log_fn=log_fn,
    )
    losses[label] = trace
    print(f"{label:>24}: start {trace[0]:.5f} -> final {trace[-1]:.5f}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-features", type=int, default=256)
    ap.add_argument("--out-features", type=int, default=128)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny shapes; host-only

    from paroquant_tpu.ops.butterfly import make_butterfly_params
    from paroquant_tpu.ops.rotation import make_rotation_params

    rng = np.random.default_rng(args.seed)
    I, O = args.in_features, args.out_features
    w = rng.normal(0, 1, (O, I)).astype(np.float32)
    outliers = rng.choice(I, size=max(I // 32, 1), replace=False)
    w[:, outliers] *= 8.0
    xs = rng.normal(size=(args.batches, 16, I)).astype(np.float32)
    y_fp = np.einsum("bth,oh->bto", xs, w)

    groups = {"channel_scales": 5e-2, "angles": 5e-2}
    losses: dict[str, list[float]] = {}
    # scales-only: identity pairs, angles group absent from the trainables
    run_variant(w, xs, y_fp, make_rotation_params(I, 128, 1, args.seed, 0.5),
                {"channel_scales": 5e-2}, args.epochs, "scales only (K=0)", losses)
    for k in (1, 2, 8):
        run_variant(w, xs, y_fp, make_rotation_params(I, 128, k, args.seed, 0.5),
                    groups, args.epochs, f"random pairs K={k}", losses)
    run_variant(w, xs, y_fp, make_butterfly_params(I, 128, 8),
                groups, args.epochs, "butterfly K=8", losses)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, trace in losses.items():
        ax.plot(trace, label=label, linewidth=1.4)
    ax.set_yscale("log")
    ax.set_xlabel("optimizer step")
    ax.set_ylabel("distillation MSE")
    ax.set_title(f"rotation-variant convergence ({O}x{I}, 4-bit g128)")
    ax.legend(fontsize=8)
    fig.tight_layout()
    out = Path(args.out or Path(__file__).parent / "figures" / "optimization_convergence.png")
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
