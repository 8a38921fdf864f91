"""Learned channel-pair visualization (reference plot_channel_pairs.py:
which channel pairs the optimizer rotates and how hard, from an optimize
result).

Input: one `{layer}.{name}.npz` from cli.optimize's output dir (--result),
or --demo to calibrate a tiny outlier linear in-process first. Draws, for
the first group, an arc diagram of the K rotation stages' pairs with line
weight = |angle| plus a per-stage |angle| heatmap. Writes
figures/channel_pairs.png.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def demo_export():
    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny shapes; host-only
    import jax.numpy as jnp

    from paroquant_tpu.optim import (
        export_quantized, make_pseudo_linear, optimize_linears,
        pseudo_linear_forward,
    )
    from paroquant_tpu.ops.rotation import make_rotation_params

    rng = np.random.default_rng(0)
    I, O = 256, 128
    w = rng.normal(0, 1, (O, I)).astype(np.float32)
    w[:, rng.choice(I, 8, replace=False)] *= 8.0
    xs = rng.normal(size=(6, 16, I)).astype(np.float32)
    y = np.einsum("bth,oh->bto", xs, w)
    lin = make_pseudo_linear(w, make_rotation_params(I, 128, 8, 0, 0.5),
                             n_bits=4, group_size=128)

    def apply_fn(linears, x):
        return pseudo_linear_forward(linears["lin"], x)

    batches = [(jnp.asarray(xs[i]), jnp.asarray(y[i])) for i in range(6)]
    linears, _ = optimize_linears(
        apply_fn, {"lin": lin}, batches[:-1], batches[-1:],
        {"channel_scales": 5e-2, "angles": 5e-2}, n_epochs=8,
    )
    return export_quantized(linears["lin"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--result", default=None, help="one {layer}.{name}.npz")
    ap.add_argument("--group", type=int, default=0, help="128-channel group to draw")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if args.result:
        exp = dict(np.load(args.result, allow_pickle=True))
    else:
        exp = demo_export()
    pairs = np.asarray(exp["pairs"])  # [K, H] int: slot -> channel
    theta = np.asarray(exp["theta"], np.float32)  # [K, H/2]
    gs = int(exp["group_size"]) if "group_size" in exp else 128
    K, H = pairs.shape
    g0 = args.group * gs
    sl = slice(args.group * (gs // 2), (args.group + 1) * (gs // 2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(10, 6), gridspec_kw={"height_ratios": [2, 1]}
    )
    amax = np.abs(theta[:, sl]).max() + 1e-9
    for r in range(K):
        for s in range(gs // 2):
            i = int(pairs[r, g0 + 2 * s]) - g0
            j = int(pairs[r, g0 + 2 * s + 1]) - g0
            a = abs(float(theta[r, args.group * (gs // 2) + s]))
            if a < 1e-6:
                continue  # dummy identity pair
            xm, wdt = (i + j) / 2, abs(j - i)
            arc = np.linspace(0, np.pi, 32)
            ax1.plot(xm + (wdt / 2) * np.cos(arc), r + 0.45 * np.sin(arc),
                     color=plt.cm.viridis(a / amax), alpha=0.8,
                     linewidth=0.4 + 1.6 * a / amax)
    ax1.set_xlim(-1, gs)
    ax1.set_ylim(-0.3, K)
    ax1.set_xlabel(f"channel (group {args.group})")
    ax1.set_ylabel("rotation stage")
    ax1.set_title("learned channel pairs (arc weight = |angle|)")

    im = ax2.imshow(np.abs(theta[:, sl]), aspect="auto", cmap="viridis")
    ax2.set_xlabel("pair slot")
    ax2.set_ylabel("stage")
    ax2.set_title("|angle| per pair slot")
    fig.colorbar(im, ax=ax2, fraction=0.02)
    fig.tight_layout()
    out = Path(args.out or Path(__file__).parent / "figures" / "channel_pairs.png")
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150)
    n_live = int((np.abs(theta[:, sl]) > 1e-6).sum())
    print(f"group {args.group}: {n_live}/{K * gs // 2} live pairs; wrote {out}")


if __name__ == "__main__":
    main()
