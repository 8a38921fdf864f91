"""Quality ladder: dense -> RTN -> Hadamard -> GPTQ -> QuaRot -> ParoQuant.

Runs every in-framework quantizer on the SAME model + calibration data and
reports, per arm, held-out perplexity (the reference's evaluate.py protocol:
non-overlapping windows, exp(mean CE)), logits-MSE vs the dense model, and
greedy top-1 agreement with the dense model — the in-repo proof of where
each anchor sits and that the learned-rotation optimizer beats the
no-training baselines. (The reference proves this with external-repo
baselines + real-data PPL, experiments/README.md; on a zero-egress box this
ladder is the protocol-compatible equivalent.)

Weights are random-init on this box (no HF cache). Because ParoQuant's
premise is outlier-channel suppression (README.md:3-12) and Gaussian random
weights have no outliers, --outlier-scale S injects them: a random ~1% of
each linear's input channels is scaled by S, reproducing the heavy per-
channel dynamic range that makes group quantization hard. S=1 disables.

Usage (tiny smoke, CPU):
  JAX_PLATFORMS=cpu python experiments/baselines/quality_ladder.py
Protocol-scale (v5e, ~0.6B geometry, canonical 5+5 epochs):
  python experiments/baselines/quality_ladder.py --model preset:qwen3-0.6b \
      --n-samples 512 --seqlen 1024 --epochs 5 --outlier-scale 8 \
      --act-dtype bfloat16 --resident-gb 8 --device tpu
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def inject_outlier_channels(params, config, scale: float, frac: float = 0.01,
                            seed: int = 17):
    """Scale a random ~frac of input channels of every decoder linear by
    `scale` (in place on host copies): the synthetic stand-in for the
    outlier channels of trained LLMs that ParoQuant targets."""
    import jax.numpy as jnp
    import numpy as np

    from paroquant_tpu.models.decoder import DenseLinear

    rng = np.random.default_rng(seed)
    names = ("q_proj", "k_proj", "v_proj", "o_proj")
    mlp_names = ("gate_proj", "up_proj", "down_proj")
    layers = []
    for lp in params["layers"]:
        nlp = dict(lp)

        def _scale(lin):
            w = np.asarray(lin.w)  # [I, O]
            n = max(1, int(w.shape[0] * frac))
            ch = rng.choice(w.shape[0], n, replace=False)
            w = w.copy()
            w[ch] *= scale
            return DenseLinear(jnp.asarray(w), lin.b)

        for n in names:
            if isinstance(nlp.get(n), DenseLinear):
                nlp[n] = _scale(nlp[n])
        mlp = dict(nlp["mlp"])
        for n in mlp_names:
            if isinstance(mlp.get(n), DenseLinear):
                mlp[n] = _scale(mlp[n])
        if "experts" in mlp:  # MoE layer: experts are [E, I, O] stacks.
            # Outlier channels in trained MoEs are activation-driven, so the
            # same input channels are hot across all experts of a layer —
            # scale one shared channel set per projection (axis 1).
            experts = dict(mlp["experts"])
            for n in mlp_names:
                w = np.asarray(experts[n])
                nch = max(1, int(w.shape[1] * frac))
                ch = rng.choice(w.shape[1], nch, replace=False)
                w = w.copy()
                w[:, ch, :] *= scale
                experts[n] = jnp.asarray(w)
            mlp["experts"] = experts
            if "shared_expert" in mlp:
                sh = dict(mlp["shared_expert"])
                for n in mlp_names:
                    if isinstance(sh.get(n), DenseLinear):
                        sh[n] = _scale(sh[n])
                mlp["shared_expert"] = sh
        nlp["mlp"] = mlp
        layers.append(nlp)
    out = dict(params)
    out["layers"] = layers
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="preset:tiny")
    ap.add_argument("--datasets", default="synthetic")
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--seqlen", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4, help="calibration batch size")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3, help="per optimizer stage")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outlier-scale", type=float, default=1.0,
                    help=">1: inject outlier input channels into the random "
                         "init (see module docstring)")
    ap.add_argument(
        "--arms",
        default="rtn,hadamard,gptq,quarot,paroquant,paroquant_gptq,"
                "paroquant_w4a8")
    ap.add_argument("--act-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--resident-gb", type=float, default=4.0,
                    help="device budget for calibration activations; under "
                         "it they stay device-resident (zero D2H)")
    ap.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    ap.add_argument("--out", default=None, help="also append the JSON line here")
    args = ap.parse_args(argv)

    from paroquant_tpu.utils import force_platform

    force_platform(args.device)

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
    cpu = jax.local_devices(backend="cpu")[0]
    if args.model.startswith("preset:"):
        config = PRESETS[args.model.split(":", 1)[1]]
        with jax.default_device(cpu):
            params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.float32)
    else:
        params, config = load_checkpoint(args.model, dtype=jnp.float32)
        try:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(args.model)
        except Exception:
            tokenizer = None
    if args.outlier_scale != 1.0:
        with jax.default_device(cpu):
            params = inject_outlier_channels(params, config, args.outlier_scale)
    if jax.devices()[0].platform != "cpu":
        params = jax.device_put(params, jax.devices()[0])

    gs = args.group_size
    if config.hidden_size % gs:
        gs = 64 if config.hidden_size % 64 == 0 else gs
    calib = get_calib_dataset(
        args.datasets.split(",")[0], tokenizer, args.n_samples, args.seqlen,
        seed=args.seed, vocab_size=config.vocab_size,
    )
    held = get_calib_dataset(
        args.datasets.split(",")[0], tokenizer, max(2, args.n_samples // 8),
        args.seqlen, seed=args.seed + 1, vocab_size=config.vocab_size,
    )

    # held-out evaluation: CE/PPL (reference evaluate.py protocol), plus
    # agreement metrics vs the dense model (random-weight models all sit at
    # ~uniform PPL, so preservation of the dense function is the signal).
    # The dense reference logits are RECOMPUTED per batch inside the metric
    # jit — storing them would be n_batches x [B, T, V] f32 (20GB at 151k
    # vocab), and staging them host-side is relay-D2H-bound; a fresh dense
    # forward is milliseconds on the MXU.
    eval_bs = max(1, min(4, len(held)))
    n_eval = (len(held) // eval_bs) * eval_bs
    held_b = [
        jnp.asarray(held[i : i + eval_bs]) for i in range(0, n_eval, eval_bs)
    ]

    import functools

    @functools.partial(jax.jit, static_argnames=("qmode",))
    def _metrics(qp, dense_p, hb, qmode="xla"):
        out, _ = model_forward(qp, config, hb, quant_mode=qmode)
        ref, _ = model_forward(dense_p, config, hb)
        logp = jax.nn.log_softmax(out[:, :-1].astype(jnp.float32), -1)
        tgt = hb[:, 1:]
        ce = -jnp.take_along_axis(logp, tgt[..., None], -1).sum()
        mse = jnp.sum((out - ref) ** 2)
        agree = (jnp.argmax(out, -1) == jnp.argmax(ref, -1)).sum()
        return ce, mse, agree

    def evaluate(qparams, qmode="xla"):
        ces, mses, agree, n_tok = 0.0, 0.0, 0, 0
        for hb in held_b:
            ce, mse, ag = _metrics(qparams, params, hb, qmode=qmode)
            ces += float(ce)
            mses += float(mse)
            agree += int(ag)
            n_tok += int(hb.shape[0]) * (int(hb.shape[1]) - 1)
        n_pos = sum(int(np.prod(h.shape)) for h in held_b)
        n_elem = n_pos * config.vocab_size
        return {
            "ppl": float(np.exp(ces / n_tok)),
            "logits_mse": mses / n_elem,
            "top1_agree": agree / n_pos,
        }

    arms = args.arms.split(",")
    results: dict[str, dict] = {}
    dense_ce = evaluate(params)
    results["dense"] = {**dense_ce, "seconds": 0.0}
    print(f"{'dense':>10}  " + "  ".join(f"{k}={v:.6g}" for k, v in dense_ce.items()),
          flush=True)

    def run_arm(name, fn, eval_qmode="xla"):
        if name not in arms:
            return
        t0 = time.perf_counter()
        qp = fn()
        dt = time.perf_counter() - t0
        m = evaluate(qp, qmode=eval_qmode)
        del qp
        results[name] = {**m, "seconds": round(dt, 1)}
        print(f"{name:>10}  " + "  ".join(f"{k}={v:.6g}" for k, v in m.items())
              + f"  [{dt:.1f}s]", flush=True)

    run_arm("rtn", lambda: quantize_model_rtn(
        params, config, group_size=gs, rot_dtype=jnp.float32))
    run_arm("hadamard", lambda: quantize_model_rtn(
        params, config, group_size=gs, rot_dtype=jnp.float32, hadamard=True))
    # rot_dtype=f32 keeps every arm dtype-matched (ADVICE r2 fairness fix)
    run_arm("gptq", lambda: gptq_quantize_model(
        params, config, calib, group_size=gs, rot_dtype=jnp.float32,
        batch_size=args.batch)[0])
    run_arm("quarot", lambda: gptq_quantize_model(
        params, config, calib, group_size=gs, hadamard=True,
        rot_dtype=jnp.float32, batch_size=args.batch)[0])

    def run_paro(gptq_init=False, tag="paroquant"):
        ccfg = CalibConfig(
            group_size=gs, num_rotations=8, seed=args.seed,
            stages=(
                ({"channel_scales": 5e-2, "angles": 5e-2}, args.epochs),
                ({"weight": 1e-5, "quantizer": 1e-6}, args.epochs),
            ),
            act_dtype=jnp.bfloat16 if args.act_dtype == "bfloat16" else np.float32,
            resident_act_bytes=int(args.resident_gb * 2**30),
            rot_dtype=jnp.float32,
            gptq_init=gptq_init,
        )
        B = min(args.batch, args.n_samples)
        tb = calib[: (len(calib) // B) * B].reshape(-1, B, args.seqlen)
        t_layer: list[float] = []
        t_prev = time.perf_counter()

        def prog(li, n, info):
            nonlocal t_prev
            now = time.perf_counter()
            t_layer.append(now - t_prev)
            t_prev = now
            print(f"  paroquant layer {li + 1}/{n}: {info['seconds']:.1f}s", flush=True)

        pq, _ = calibrate_model(params, config, tb, ccfg, progress_fn=prog)
        results.setdefault(f"_{tag}_layer_seconds",
                           [round(t, 1) for t in t_layer])
        return pq

    # the w4a8 arm reuses the paroquant checkpoint (a8 is an EVAL-time
    # rounding of activations, not a different calibration), so stash it
    # when both arms are requested instead of re-running 28 layers
    stash: dict = {}

    def paro_stashing():
        pq = run_paro()
        if "paroquant_w4a8" in arms:
            stash["paroquant"] = pq
        return pq

    run_arm("paroquant", paro_stashing)

    # W4A8 serving operating point at protocol scale (VERDICT r4 item 8):
    # the SAME learned-rotation checkpoint evaluated with the a8 activation
    # rounding on every token ("w4a8_xla" — the cli/evaluate.py --quant-mode
    # w4a8 convention; the fused TPU kernel rounds identically). Quality
    # delta vs the paroquant row isolates what int8 activations cost at the
    # geometry the +8.2% 7B decode win ships at. Runs IMMEDIATELY after
    # paroquant (it's a pure re-eval) so the stashed checkpoint is freed
    # before the gptq arm's full recalibration claims memory.
    def paro_for_a8():
        if "paroquant" in stash:
            return stash.pop("paroquant")
        return run_paro(tag="paroquant_w4a8")

    run_arm("paroquant_w4a8", paro_for_a8, eval_qmode="w4a8_xla")

    # GPTQ-compensated weight init for stage 2 (VERDICT r2 #8): same recipe,
    # Hessian-aware requantization of the pseudo weights between stages
    run_arm("paroquant_gptq", lambda: run_paro(gptq_init=True,
                                               tag="paroquant_gptq"))

    line = json.dumps({
        "metric": "quality_ladder",
        "model": args.model, "datasets": args.datasets,
        "tokens": int(args.n_samples) * int(args.seqlen),
        "seqlen": args.seqlen, "epochs": args.epochs,
        "outlier_scale": args.outlier_scale, "group_size": gs,
        **{k: v for k, v in results.items()},
    })
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
