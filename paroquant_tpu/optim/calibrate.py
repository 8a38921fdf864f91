"""Layer-wise calibration driver: the JAX re-design of cli/optimize.py.

Pipeline (reference call stack SURVEY.md §3.1):
  1. embed the calibration token batches once (capture_layer_inputs_and_args,
     util.py:217-279 — trivial here because the decoder is functional: a
     layer's inputs are (x, positions), no kwargs catching needed)
  2. per decoder layer:
     a. run the FP layer -> teacher outputs
     b. swap each eligible linear for a PseudoQuantLinear with fresh rotation
        params (butterfly by default — TPU-native; seeded random independent
        pairs in reference-parity mode)
     c. run the optimization stages (default: stage 1 channel_scales+angles
        @5e-2, stage 2 weight@1e-5 + quantizer@1e-6 — the canonical recipe
        from experiments/optimize/4bit.sh)
     d. hard-quantize -> runtime QuantizedLinear; re-run the layer quantized
        so the *student's* outputs feed the next layer (optimize.py:524-537)
  3. emit quantized model params + per-layer result dicts (the .pt-equivalent
     PARO intermediates, resumable at layer granularity)

Activation batches live on host (numpy) and stream to device per step —
the JAX analogue of CachedTensorShards CPU paging (util.py:292-361).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.decoder import layer_forward, layer_rope_theta, rope_tables
from ..ops import rotation as rot_ops
from ..ops.butterfly import make_butterfly_params
from ..ops.qlinear import make_quantized_linear
from .pseudo import PseudoQuantLinear, export_quantized, make_pseudo_linear
from .train import optimize_linears

logger = logging.getLogger("paroquant_tpu.optim")

LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj")
MLP_NAMES = ("gate_proj", "up_proj", "down_proj")
# gated delta-net (qwen3_next hybrid) projections. The reference calibrates
# these through the HF module forward and skips the decay/gate projection
# (experiments/optimize/4bit_moe.sh --skipped-modules "linear_attn.in_proj_a"
# "linear_attn.in_proj_b"); our fused in_proj_ba is that projection.
LINEAR_ATTN_NAMES = ("in_proj_qkvz", "in_proj_ba", "out_proj")


@dataclasses.dataclass
class CalibConfig:
    n_bits: int = 4
    group_size: int = 128
    num_rotations: int = 8
    num_pairs_factor: float = 0.5
    # "random" = the reference's seeded independent pairs (train.py:56-91),
    # bit-validated against the reference generator in
    # tests/test_reference_parity.py — the canonical protocol default.
    # "butterfly" = our structured TPU-friendly variant (opt-in, ablation).
    pair_mode: str = "random"  # "random" | "butterfly"
    seed: int = 0
    # stages: list of (param-group -> lr, epochs); canonical recipe from
    # experiments/optimize/4bit.sh
    stages: tuple = (
        ({"channel_scales": 5e-2, "angles": 5e-2}, 5),
        ({"weight": 1e-5, "quantizer": 1e-6}, 5),
    )
    loss: str = "mse"
    grad_accum: int = 1
    early_stop: int | None = None
    val_fraction: float = 0.1
    rot_dtype: Any = jnp.float32
    # device-residency budget for the per-layer activation set (inputs +
    # teacher targets). Under budget, all batches live on device for the
    # whole stage (fast path); over it, batches stay host-side and stream
    # to device per optimizer step — the CachedTensorShards analogue
    # (util.py:292-361) that lets 8B-scale 4M-token calibration run in a
    # 16GB-HBM chip.
    resident_act_bytes: int = 4 << 30
    # storage dtype for host-staged activations. float32 preserves the f32
    # teacher outputs exactly; bfloat16 halves host RAM + transfer bytes
    # (protocol-equivalent: the reference stages fp16 model activations)
    act_dtype: Any = np.float32
    # module names (as emitted by _layer_linear_names) left dense, mirroring
    # the reference --skipped-modules default for hybrids
    skip: tuple = ("linear_attn.in_proj_ba",)
    # GPTQ-initialize the final (weight+quantizer) stage: before it starts,
    # run Hessian-compensated GPTQ in the LEARNED rotated coordinates and
    # reset the pseudo weight + quantizer params to the compensated point —
    # second-order init instead of round-to-nearest (VERDICT r2 #8).
    # Standard attention+GLU layers only (hybrid/gemma3n/MoE linears keep
    # the plain init).
    gptq_init: bool = False


def _rotation_for(cfg: CalibConfig, in_features: int, layer_seed: int) -> rot_ops.RotationParams:
    if cfg.pair_mode == "butterfly":
        return make_butterfly_params(in_features, cfg.group_size, cfg.num_rotations)
    return rot_ops.make_rotation_params(
        in_features, cfg.group_size, cfg.num_rotations, layer_seed, cfg.num_pairs_factor
    )


def _layer_linear_names(
    layer_params: dict[str, Any], skip: tuple = ()
) -> list[str]:
    names = [n for n in LINEAR_NAMES if n in layer_params]
    la = layer_params.get("linear_attn", {})
    names += [f"linear_attn.{n}" for n in LINEAR_ATTN_NAMES if n in la]
    mlp = layer_params.get("mlp", {})
    names += [f"mlp.{n}" for n in MLP_NAMES if n in mlp]
    if "experts" in mlp:
        names.append("mlp.experts")
    # shared expert: quantized like any GLU — the reference skips only its
    # sigmoid gate (4bit_moe.sh --skipped-modules mlp.shared_expert_gate)
    names += [
        f"mlp.shared_expert.{n}" for n in MLP_NAMES
        if n in mlp.get("shared_expert", {})
    ]
    return [n for n in names if n not in skip]


def flatten_export(exp: dict[str, Any]) -> dict[str, Any]:
    """Flatten (possibly nested) export dicts for npz storage."""
    out = {}
    for k, v in exp.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                out[f"{k}.{k2}"] = v2
        elif v is not None:
            out[k] = v
    return out


def unflatten_export(flat: dict[str, Any]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in flat.items():
        if hasattr(v, "ndim") and v.ndim == 0:
            v = v.item()
        if "." in k:
            k1, k2 = k.split(".", 1)
            out.setdefault(k1, {})[k2] = v
        else:
            out[k] = v
    if not isinstance(out.get("bias"), np.ndarray):
        out["bias"] = None
    return out


class _HostPagedBatches:
    """Lazy (input, target) batch sequence: activations stay host-resident
    and each iteration transfers one batch to device (fresh transfer per
    epoch). Engaged when a layer's activation set exceeds
    CalibConfig.resident_act_bytes — the CachedTensorShards path
    (util.py:292-361) for calibration sets bigger than device memory."""

    def __init__(self, make_batch, indices):
        self._make = make_batch
        self._idx = indices

    def __len__(self):
        return len(self._idx)

    def __iter__(self):
        for i in self._idx:
            yield self._make(i)


def _get_linear(layer_params, name):
    node = layer_params
    for part in name.split("."):
        node = node[part]
    return node


def _set_linear(layer_params, name, value):
    """Functional set along a dotted path (copies every dict on the way)."""
    parts = name.split(".")
    lp = dict(layer_params)
    node = lp
    for part in parts[:-1]:
        node[part] = dict(node[part])
        node = node[part]
    node[parts[-1]] = value
    return lp


def gptq_init_linear(lin: "PseudoQuantLinear", hessian: jax.Array,
                     percdamp: float = 0.01) -> "PseudoQuantLinear":
    """Re-initialize a pseudo linear's weight + quantizer at the GPTQ-
    compensated point IN THE LEARNED ROTATED COORDINATES.

    The runtime computes y = (Mb x) @ Wq with Mb = R·diag(1/cs) per group,
    so the rotated-space input Hessian is H_r = Mb H Mb^T; GPTQ of
    W_r = R(cs·W) against H_r gives the compensated integer grid, and the
    new continuous weight is its inverse transform. The quantizer params
    start exactly on that grid (zero initial rounding error), then the
    final stage fine-tunes both."""
    from ..convert.gptq import _gptq_core, _hessian_chol, _rotate_weight_and_hessian
    from ..ops import quant
    from .pseudo import rotated_scaled_weight

    gs = lin.group_size
    theta = rot_ops.effective_theta(lin.rotation_params)
    R = rot_ops.build_rotation_matrices(theta, lin.form, gs, dtype=jnp.float32)
    inv_s = (1.0 / lin.channel_scales).reshape(-1, gs)
    M = R * inv_s[:, None, :]
    _, h_rot = _rotate_weight_and_hessian(jnp.zeros((1, lin.weight.shape[1])), hessian, M)
    w_rot = rotated_scaled_weight(lin)
    U, dead = _hessian_chol(h_rot, percdamp)
    q, s_q, z = _gptq_core(w_rot, U, dead, n_bits=lin.n_bits, group_size=gs)
    w_deq = quant.dequantize_int(q, s_q, z, gs)
    w_new = rot_ops.apply_rotation_stages(
        w_deq, theta, lin.form, inverse=True
    ) / lin.channel_scales[None, :]
    return lin.replace(
        weight=w_new,
        q_scale=s_q.reshape(-1, 1).astype(jnp.float32),
        # pseudo_quantize uses round_zp = clip(-round(zp_float)): zp_float=-z
        q_zero_point=(-z.astype(jnp.float32)).reshape(-1, 1),
    )


def quantized_from_export(exp: dict[str, Any], rot_dtype=jnp.float32):
    if exp.get("moe"):
        from .pseudo_moe import quantized_moe_from_export

        return quantized_moe_from_export(exp, rot_dtype)
    return make_quantized_linear(
        exp["q"], exp["scales"], exp["zeros"], exp["pairs"], exp["theta"],
        exp["inv_channel_scales"], exp["group_size"], bias=exp["bias"],
        rot_dtype=rot_dtype, n_bits=exp["n_bits"],
    )


def calibrate_model(
    params: dict[str, Any],
    config: ModelConfig,
    token_batches: np.ndarray,  # [N, B, T] int32 calibration batches
    cfg: CalibConfig = CalibConfig(),
    *,
    output_dir: str | Path | None = None,
    resume: bool = True,
    progress_fn: Callable[[int, int, dict], None] | None = None,
    mesh: Any | None = None,
) -> tuple[dict[str, Any], list[dict[str, Any]]]:
    """Calibrate + quantize a dense model. Returns (quantized params, results).

    If output_dir is given, per-layer results persist as
    `{layer_idx}.{name}.npz` (the .pt-equivalent of optimize.py:546-552) and
    finished layers are skipped on resume (optimize.py:324-335).

    mesh: optional jax.sharding.Mesh with a "data" axis — activations shard
    batch-wise across it and every teacher/train/student step runs under
    GSPMD data parallelism (grad psum inserted by XLA). Model params and
    trainable rotation state replicate. This removes the reference's
    "single GPU only" calibration constraint (cli/optimize.py:115-116).
    """
    out = dict(params)
    layers = list(params["layers"])
    N, B, T = token_batches.shape
    _adt = np.dtype(cfg.act_dtype)

    # Staging mode. When the per-layer activation set (inputs + teacher
    # targets) fits the device budget, activations stay DEVICE-RESIDENT
    # end-to-end: zero device->host transfers in the layer loop. This is
    # both the TPU-native design (activations never leave HBM) and a hard
    # requirement on relay-attached chips, where D2H bandwidth can be
    # orders of magnitude below H2D (measured 0.02 GB/s vs 1.1 GB/s).
    # Over budget, batches stage host-side (numpy) and stream to device per
    # step — the CachedTensorShards analogue (util.py:292-361).
    H = config.hidden_size
    _x_mult = 2 * getattr(config, "altup_num_inputs", 1) if config.is_gemma3n else 2
    est_set_bytes = N * B * T * H * _adt.itemsize * _x_mult
    on_device = est_set_bytes <= cfg.resident_act_bytes
    _jadt = jnp.dtype(cfg.act_dtype)

    def _host(a):
        """Device activation -> staging (device jnp or host numpy array)."""
        if on_device:
            return a.astype(_jadt)
        return np.asarray(a).astype(_adt, copy=False)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if B % mesh.shape["data"]:
            raise ValueError(
                f"batch size {B} must divide by the data axis ({mesh.shape['data']})"
            )
        _rep = NamedSharding(mesh, PartitionSpec())
        params = jax.device_put(params, _rep)
        layers = list(params["layers"])

    def _dev_batch(a, axis=0):
        """Host activation batch -> device, batch-sharded under a mesh.
        axis: position of the batch dim (1 for gemma3n's [A, B, T, H])."""
        if mesh is not None:
            spec = PartitionSpec(*([None] * axis + ["data"]))
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
        return jnp.asarray(a)

    def _dev_rep(tree):
        """Replicate small state (pseudo linears, quantized layers) on the mesh."""
        if mesh is not None:
            return jax.device_put(tree, _rep)
        return tree

    # layer-0 inputs: embeddings (move_embed + Catcher, util.py:83-103,217-279)
    embed = params["embed_tokens"]
    scale = float(np.sqrt(config.hidden_size)) if config.gemma_norm else 1.0
    _is_g3n = config.is_gemma3n

    if _is_g3n:
        # gemma-4-class: the layer input is the AltUp stack [A, B, T, H] and
        # every layer additionally consumes its per-layer input slice
        # (reference equivalent: move_embed of the per-layer-embedding
        # modules + kwarg retention through the Catcher, util.py:17,83-103).
        # Shared-KV tail layers consume the (k, v) of their source layer,
        # captured from the progressively-QUANTIZED student pass so the
        # optimization target matches what inference will actually see.
        from ..models.decoder import apply_linear as _apply_lin
        from ..models.gemma3n import _magnitude_match, per_layer_inputs as _g3n_pli

        @jax.jit
        def embed_expand(prms, toks):
            x0 = jnp.take(prms["embed_tokens"], toks, axis=0).astype(jnp.float32) * scale
            pli = _g3n_pli(prms, config, toks, x0)
            stack = [x0]
            for proj in prms["altup_projections"]:
                stack.append(_magnitude_match(_apply_lin(proj, x0), x0))
            return jnp.stack(stack), pli

        hs, plis = [], []
        for tb in token_batches:
            h_i, p_i = embed_expand(params, _dev_batch(np.asarray(tb, np.int32)))
            hs.append(_host(h_i))
            plis.append(_host(p_i))
        xs = hs  # N x [A, B, T, H]
        pli_all = plis  # N x [B, T, L, P]
        shared_store: dict[int, list] = {}
        srcs_needed = {
            config.kv_share_source(j) for j in range(config.num_hidden_layers)
        } - {None}
    else:

        @jax.jit
        def embed_fn(emb, toks):
            # emb is an ARGUMENT: a closure-captured embedding table would
            # bake ~600MB of constants into the HLO (remote relay compilers
            # reject the upload outright)
            return jnp.take(emb, toks, axis=0).astype(jnp.float32) * scale

        xs = [
            _host(embed_fn(embed, _dev_batch(np.asarray(tb, np.int32))))
            for tb in token_batches
        ]

    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
    n_val = max(int(N * cfg.val_fraction), 1) if N > 1 else 0

    results: list[dict[str, Any]] = []
    outdir = Path(output_dir) if output_dir is not None else None
    if outdir is not None:
        outdir.mkdir(parents=True, exist_ok=True)

    for li, lp in enumerate(layers):
        t_start = time.time()
        names = _layer_linear_names(lp, cfg.skip)
        _src = config.kv_share_source(li)
        if _src is not None:
            # shared-KV tail: k/v projections are never applied at inference,
            # so optimizing/quantizing them would be dead work
            names = [n for n in names if n not in ("k_proj", "v_proj")]
        # per-layer RoPE base + rotary width: Gemma-3 local layers use
        # rope_local_base_freq, partial-rotary models cover rotary_dim < head_dim
        # (must match model_forward or the teacher activations are wrong)
        _theta = layer_rope_theta(config, li)
        _is_linear = config.layer_is_linear(li)

        def _batch_in(i):
            """Device input pytree for batch i of the current layer."""
            if not _is_g3n:
                return _dev_batch(xs[i])
            shared = None
            if _src is not None:
                shared = tuple(_dev_batch(a) for a in shared_store[_src][i])
            # altup stack is [A, B, T, H]: batch dim is axis 1
            return (_dev_batch(xs[i], axis=1), _dev_batch(pli_all[i][:, :, li]), shared)

        def apply_with(lp_, x):
            """One decoder layer, dense-or-substituted params (mirrors
            model_forward's per-layer dispatch, no cache / full-length)."""
            if _is_g3n:
                from ..models.gemma3n import gemma3n_layer

                h, pli_l, shared = x
                cos, sin = rope_tables(positions, config.head_dim, _theta)
                out, _, _ = gemma3n_layer(
                    lp_, h, pli_l, config, li, cos, sin, positions, None,
                    jnp.zeros((), jnp.int32), shared, "xla",
                )
                return out
            if _is_linear:
                from ..models.decoder import mlp_forward, moe_forward, rms_norm
                from ..models.linear_attn import delta_net_forward

                h = rms_norm(x, lp_["input_layernorm"], config.rms_norm_eps,
                             config.zero_centered_norm)
                attn_out, _, _ = delta_net_forward(
                    lp_["linear_attn"], h, config, None, None, "xla"
                )
                xx = x + attn_out
                h2 = rms_norm(xx, lp_["post_attention_layernorm"],
                              config.rms_norm_eps, config.zero_centered_norm)
                if config.layer_is_sparse(li):
                    mlp_out = moe_forward(lp_["mlp"], h2, config, "xla")
                else:
                    mlp_out = mlp_forward(lp_["mlp"], h2, "xla", config.hidden_act)
                return xx + mlp_out
            cos, sin = rope_tables(positions, config.rotary_dim, _theta)
            y, _ = layer_forward(
                lp_, x, config, li, cos, sin, positions, None,
                jnp.zeros((), jnp.int32), "xla",
            )
            return y

        # apply_with takes the layer params as an ARGUMENT: closure-captured
        # params would bake into the HLO as constants and force a fresh
        # compilation per layer; as args, every same-shape layer shares one
        # executable (first-layer compile only)
        dense_apply_j = jax.jit(apply_with)
        teacher = [_host(dense_apply_j(lp, _batch_in(i))) for i in range(N)]

        layer_result: dict[str, Any] = {}
        saved = {}
        if outdir is not None and resume:
            for name in names:
                f = outdir / f"{li}.{name}.npz"
                if f.exists():
                    saved[name] = dict(np.load(f, allow_pickle=True))
        if len(saved) == len(names) and names:
            # resume: rebuild quantized layer from saved results
            new_lp = lp
            for name in names:
                exp = unflatten_export(saved[name])
                new_lp = _set_linear(
                    new_lp, name, _dev_rep(quantized_from_export(exp, cfg.rot_dtype))
                )
                layer_result[name] = exp
            layers[li] = new_lp
        else:
            # build pseudo linears
            linears: dict[str, Any] = {}
            for name in names:
                if name == "mlp.experts":
                    from .pseudo_moe import make_pseudo_moe

                    experts = lp["mlp"]["experts"]
                    H = experts["gate_proj"].shape[1]
                    I_moe = experts["gate_proj"].shape[2]
                    linears[name] = make_pseudo_moe(
                        experts,
                        _rotation_for(cfg, H, cfg.seed + li),
                        _rotation_for(cfg, I_moe, cfg.seed + li + 1000),
                        n_bits=cfg.n_bits, group_size=cfg.group_size,
                    )
                    continue
                dense = _get_linear(lp, name)
                w = np.asarray(dense.w, np.float32).T  # [O, I]
                rot = _rotation_for(cfg, w.shape[1], cfg.seed + li)
                linears[name] = make_pseudo_linear(
                    w, rot,
                    bias=None if dense.b is None else np.asarray(dense.b, np.float32),
                    n_bits=cfg.n_bits, group_size=cfg.group_size,
                )

            def pseudo_layer_apply(linear_dict, x, lp_ctx):
                new_lp = lp_ctx
                for name, lin in linear_dict.items():
                    new_lp = _set_linear(new_lp, name, lin)
                return apply_with(new_lp, x)

            def _make_batch(i):
                return (_batch_in(i), _dev_batch(teacher[i], axis=1 if _is_g3n else 0))

            train_idx = list(range(N - n_val)) if n_val else list(range(N))
            val_idx = list(range(N - n_val, N)) if n_val else [0]
            per_bytes = teacher[0].nbytes + xs[0].nbytes
            if _is_g3n:
                per_bytes += pli_all[0][:, :, li].nbytes
                if _src is not None:
                    per_bytes += sum(a.nbytes for a in shared_store[_src][0])
            if on_device or N * per_bytes <= cfg.resident_act_bytes:
                cached = [_make_batch(i) for i in range(N)]
                train_b = [cached[i] for i in train_idx]
                val_b = [cached[i] for i in val_idx]
            else:
                # activation set exceeds the device budget: stream host->device
                # one batch per optimizer step (fresh transfer each epoch)
                train_b = _HostPagedBatches(_make_batch, train_idx)
                val_b = _HostPagedBatches(_make_batch, val_idx)

            def _gptq_init_all(lins):
                """Hessian-compensated init of the weight+quantizer stage:
                collect per-tap Hessians through the CURRENT student layer
                (pseudo weights baked dense), then gptq_init_linear each
                standard linear in its learned rotated coordinates."""
                from ..models.decoder import DenseLinear
                from .pseudo import PseudoQuantLinear, pseudo_quantized_weight

                tap_of = {
                    "q_proj": "qkv", "k_proj": "qkv", "v_proj": "qkv",
                    "o_proj": "o", "mlp.gate_proj": "mlp",
                    "mlp.up_proj": "mlp", "mlp.down_proj": "down",
                }
                todo = [n for n, l in lins.items()
                        if isinstance(l, PseudoQuantLinear) and n in tap_of]
                if not todo:
                    return lins
                eff = lp
                for n2, l2 in lins.items():
                    if isinstance(l2, PseudoQuantLinear):
                        eff = _set_linear(
                            eff, n2,
                            DenseLinear(pseudo_quantized_weight(l2).T, l2.bias),
                        )

                @jax.jit
                def taps_j(lp_, x):
                    cos, sin = rope_tables(positions, config.rotary_dim, _theta)
                    _, _, taps = layer_forward(
                        lp_, x, config, li, cos, sin, positions, None,
                        jnp.zeros((), jnp.int32), "xla", return_taps=True,
                    )
                    hi = jax.lax.Precision.HIGHEST
                    return {
                        k: jnp.dot(
                            t.reshape(-1, t.shape[-1]).astype(jnp.float32).T,
                            t.reshape(-1, t.shape[-1]).astype(jnp.float32),
                            preferred_element_type=jnp.float32, precision=hi,
                        )
                        for k, t in taps.items()
                    }

                hs = None
                for i2 in range(N):
                    h_i = taps_j(eff, _batch_in(i2))
                    hs = h_i if hs is None else jax.tree.map(jnp.add, hs, h_i)
                out3 = dict(lins)
                for n2 in todo:
                    h2 = hs.get(tap_of[n2])
                    if h2 is not None:
                        out3[n2] = gptq_init_linear(lins[n2], h2)
                return out3

            linears = _dev_rep(linears)
            step = 0
            for si, (stage_groups, epochs) in enumerate(cfg.stages):
                if (
                    cfg.gptq_init and si == len(cfg.stages) - 1
                    and not _is_g3n and not _is_linear
                    and ("weight" in stage_groups or "quantizer" in stage_groups)
                ):
                    linears = _dev_rep(_gptq_init_all(linears))
                linears, step = optimize_linears(
                    pseudo_layer_apply, linears, train_b, val_b, dict(stage_groups),
                    n_epochs=epochs, loss=cfg.loss, grad_accum=cfg.grad_accum,
                    early_stop=cfg.early_stop, start_step=step, apply_ctx=lp,
                )

            # export + swap in runtime quantized linears
            new_lp = lp
            for name, lin in linears.items():
                if name == "mlp.experts":
                    from .pseudo_moe import export_quantized_moe

                    exp = export_quantized_moe(lin)
                else:
                    exp = export_quantized(lin)
                layer_result[name] = exp
                if outdir is not None:
                    np.savez(outdir / f"{li}.{name}.npz", **flatten_export(exp))
                new_lp = _set_linear(
                    new_lp, name, _dev_rep(quantized_from_export(exp, cfg.rot_dtype))
                )
            layers[li] = new_lp

        # free teacher targets + cached train batches before the student
        # re-capture (device staging peak: old xs + student outs only)
        teacher = None
        train_b = val_b = cached = None  # noqa: F841

        # student outputs feed the next layer (optimize.py:524-537)
        qlp = layers[li]

        if _is_g3n and li in srcs_needed:
            # source layer for the shared-KV tail: emit (k, v) alongside the
            # hidden stack so tail layers train against the quantized source
            from ..models.gemma3n import gemma3n_layer as _g3n_layer

            @jax.jit
            def student_kv_j(x):
                h, pli_l, shared = x
                cos, sin = rope_tables(positions, config.head_dim, _theta)
                out, _, own_kv = _g3n_layer(
                    qlp, h, pli_l, config, li, cos, sin, positions, None,
                    jnp.zeros((), jnp.int32), shared, "xla",
                )
                return out, own_kv

            outs, kvs = [], []
            for i in range(N):
                o, kv = student_kv_j(_batch_in(i))
                outs.append(_host(o))
                kvs.append(tuple(_host(a) for a in kv))
            xs = outs
            shared_store[li] = kvs
        else:
            student_j = jax.jit(apply_with)
            xs = [_host(student_j(qlp, _batch_in(i))) for i in range(N)]
        results.append(layer_result)
        if progress_fn:
            progress_fn(li, len(layers), {"seconds": time.time() - t_start})
        logger.info("layer %d/%d calibrated in %.1fs", li + 1, len(layers), time.time() - t_start)

    out["layers"] = layers
    return out, results
