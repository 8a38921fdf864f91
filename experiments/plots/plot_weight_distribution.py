"""Weight distribution before/after rotation (reference
plot_weight_distribution.py): shows how the learned (or random) pairwise
rotations even out per-group outliers, shrinking the quantization range.

Input: an optimizer results dir (--results, npz files from cli.optimize) or
--demo for a synthetic outlier weight. Writes figures/weight_distribution.png
and prints the per-group max|w| reduction (the quantity the rotation
optimizes, reference paper §3).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default=None, help="cli.optimize output dir")
    ap.add_argument("--layer", default=None, help="layer file stem to plot")
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--group-size", type=int, default=128)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from paroquant_tpu.ops import rotation as rot_ops

    gs = args.group_size
    if args.results:
        files = sorted(Path(args.results).glob("*.npz"))
        if args.layer:
            files = [f for f in files if args.layer in f.stem]
        if not files:
            raise SystemExit(f"no npz results under {args.results}")
        d = np.load(files[0])
        # export layout (optim/calibrate.py flatten_export)
        w_rot = None
        theta = d[[k for k in d.files if k.endswith("theta")][0]]
        pairs = d[[k for k in d.files if k.endswith("pairs")][0]].astype(np.int32)
        q = d[[k for k in d.files if k.endswith("q") or k == "q"][0]]
        scales = d[[k for k in d.files if k.endswith("scales")][0]]
        zeros = d[[k for k in d.files if k.endswith("zeros")][0]]
        # reconstruct the rotated weight from the quantized grid
        w_rot = (q.astype(np.float32) - zeros[..., None].repeat(gs, -1).reshape(q.shape)) \
            * scales[..., None].repeat(gs, -1).reshape(q.shape)
        form = rot_ops.PermutationForm(
            *(jnp.asarray(a) for a in rot_ops.pairs_to_permutation(pairs, gs))
        )
        w = np.asarray(rot_ops.apply_rotation_stages(
            jnp.asarray(w_rot), jnp.asarray(theta, jnp.float32), form, inverse=True
        ))
        label = files[0].stem
    else:
        rng = np.random.default_rng(0)
        O, I = 256, 512
        w = rng.standard_normal((O, I)).astype(np.float32) * 0.05
        # inject per-channel outliers (the pathology rotations fix)
        outlier_ch = rng.integers(0, I, 8)
        w[:, outlier_ch] *= 25
        params = rot_ops.make_rotation_params(I, gs, 8, seed=0)
        theta = np.where(
            np.asarray(params.mask), 0.0,
            rng.normal(0, 0.35, params.theta.shape),
        ).astype(np.float32)
        form = rot_ops.to_permutation_form(params, gs)
        w_rot = np.asarray(rot_ops.apply_rotation_stages(
            jnp.asarray(w), jnp.asarray(theta), form
        ))
        label = "demo"

    def group_ranges(x):
        return np.abs(x.reshape(-1, gs)).max(axis=1)

    r_before, r_after = group_ranges(w), group_ranges(w_rot)
    print(f"[{label}] mean per-group max|w|: before {r_before.mean():.4f} "
          f"after {r_after.mean():.4f} "
          f"(x{r_before.mean()/max(r_after.mean(),1e-12):.2f} reduction)")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(5.4, 2.0), sharey=True)
        for ax, data, title in (
            (axes[0], w.ravel(), "before rotation"),
            (axes[1], w_rot.ravel(), "after rotation"),
        ):
            ax.hist(data, bins=120, log=True, color="#356")
            ax.set_title(title, fontsize=8)
            ax.tick_params(labelsize=7)
        outdir = Path(__file__).parent / "figures"
        outdir.mkdir(parents=True, exist_ok=True)
        fig.savefig(outdir / "weight_distribution.png", bbox_inches="tight", dpi=160)
        print(f"wrote {outdir}/weight_distribution.png")
    except Exception as e:
        print(f"plot skipped: {e}")


if __name__ == "__main__":
    main()
