"""Checkpoint I/O: PARO-TPU format, HF dense loading, AWQ reference import.

Three formats (reference SURVEY.md §5.4):
1. **PARO-TPU** (ours, safetensors): per quantized linear, HF-style keys
     <prefix>.qweight            uint8 [I//2, O]   (PARO-TPU half-split packing)
     <prefix>.scales             f32   [G, O]
     <prefix>.zeros              uint8 [G, O]
     <prefix>.theta              f16   [K, I//2]
     <prefix>.pairs              i16   [K, I]
     <prefix>.channel_scales     f16   [1, I]      (inverse optimizer scales,
                                                    matching reference convert.py:264-266)
   plus dense tensors in bf16, and `quantization_config` in config.json with
   quant_method="paroquant" (format: "paro-tpu").
2. **HF dense** safetensors (bf16/f16/f32) -> DenseLinear params.
3. **AWQ-format reference checkpoints** (z-lab/*-PARO): qweight int32
   [I, O//8] with the (0,2,4,6,1,3,5,7) nibble reorder, qzeros int32
   [G, O//8], scales f16 [G, O], theta/pairs/channel_scales — imported by
   undoing the AWQ packing (reference backends/mlx/load.py:21-54 does the
   same for MLX).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file

from ..models.config import ModelConfig, from_hf_dict
from ..models.decoder import DenseLinear
from ..ops.packing import pack_wq_tpu, unpack_awq
from ..ops.qlinear import make_quantized_linear

QUANT_SUFFIXES = ("qweight", "scales", "zeros", "theta", "pairs", "channel_scales")


# ---------------------------------------------------------------------------
# key naming
# ---------------------------------------------------------------------------

_ATTN = {"q_proj", "k_proj", "v_proj", "o_proj"}
_MLP = {"gate_proj", "up_proj", "down_proj"}


_LINEAR_ATTN = {"in_proj_qkvz", "in_proj_ba", "out_proj"}
# shared expert (Qwen3-Next/Qwen2-MoE): quantized like any GLU; only its
# sigmoid gate stays dense (4bit_moe.sh --skipped-modules shared_expert_gate)
_SHARED_EXPERT = tuple(sorted(f"mlp.shared_expert.{m}" for m in _MLP))


def hf_prefix(layer_idx: int, name: str) -> str:
    """Our layer-param name -> HF tensor prefix."""
    if name.startswith("mlp.") or name.startswith("linear_attn."):
        return f"model.layers.{layer_idx}.{name}"
    if name in _ATTN:
        return f"model.layers.{layer_idx}.self_attn.{name}"
    raise ValueError(name)


def _holder_for(lp: dict, name: str):
    """Walk a dotted module path inside a layer dict -> (container, leaf),
    or (None, None) when any segment is absent."""
    parts = name.split(".")
    holder = lp
    for p in parts[:-1]:
        if not isinstance(holder, dict) or p not in holder:
            return None, None
        holder = holder[p]
    if not isinstance(holder, dict) or parts[-1] not in holder:
        return None, None
    return holder, parts[-1]


# ---------------------------------------------------------------------------
# save
# ---------------------------------------------------------------------------


def _save_gemma3n_shared(tensors, params) -> None:
    """gemma-4-class per-layer-embedding module tensors (dense; the
    reference's optimizer leaves these modules unquantized)."""
    tensors["model.embed_tokens_per_layer.weight"] = _to_f16(
        params["embed_tokens_per_layer"]
    )
    tensors["model.per_layer_model_projection.weight"] = _to_f16(
        np.asarray(params["per_layer_model_projection"].w).T
    )
    tensors["model.per_layer_projection_norm.weight"] = _to_f16(
        params["per_layer_projection_norm"]
    )
    for key in ("altup_projections", "altup_unembed_projections"):
        for i, lin in enumerate(params[key]):
            tensors[f"model.{key}.{i}.weight"] = _to_f16(np.asarray(lin.w).T)


def _save_gemma3n_layer(tensors, li: int, lp) -> None:
    base = f"model.layers.{li}"
    ap = lp["altup"]
    tensors[f"{base}.altup.correct_output_scale"] = np.asarray(
        ap["correct_output_scale"], np.float32
    )
    for n in ("correction_coefs", "prediction_coefs", "modality_router"):
        tensors[f"{base}.altup.{n}.weight"] = _to_f16(np.asarray(ap[n].w).T)
    tensors[f"{base}.altup.router_norm.weight"] = _to_f16(ap["router_norm"])
    lau = lp["laurel"]
    for n in ("linear_left", "linear_right"):
        tensors[f"{base}.laurel.{n}.weight"] = _to_f16(np.asarray(lau[n].w).T)
    tensors[f"{base}.laurel.post_laurel_norm.weight"] = _to_f16(
        lau["post_laurel_norm"]
    )
    for n in ("per_layer_input_gate", "per_layer_projection"):
        tensors[f"{base}.{n}.weight"] = _to_f16(np.asarray(lp[n].w).T)
    tensors[f"{base}.post_per_layer_input_norm.weight"] = _to_f16(
        lp["post_per_layer_input_norm"]
    )


def save_paro_checkpoint(
    path: str | Path,
    params: dict[str, Any],
    config: ModelConfig,
    layer_exports: list[dict[str, dict[str, Any]]],
    hf_config: dict[str, Any] | None = None,
) -> None:
    """Write a PARO-TPU checkpoint. `layer_exports[i][name]` are the export
    dicts from optim.pseudo.export_quantized (or the AWQ importer)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tensors: dict[str, np.ndarray] = {}

    # dense / shared tensors
    tensors["model.embed_tokens.weight"] = _to_f16(params["embed_tokens"])
    tensors["model.norm.weight"] = _to_f16(params["norm"])
    if "lm_head" in params:
        tensors["lm_head.weight"] = _to_f16(np.asarray(params["lm_head"].w).T)

    if config.is_gemma3n:
        _save_gemma3n_shared(tensors, params)

    n_bits, group_size, krot = 4, 128, 8
    for li, lp in enumerate(params["layers"]):
        exp_layer = layer_exports[li] if li < len(layer_exports) else {}
        if config.is_gemma3n:
            _save_gemma3n_layer(tensors, li, lp)
        for name in ("input_layernorm", "post_attention_layernorm",
                     "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            if name in lp:
                tensors[f"model.layers.{li}.{name}.weight"] = _to_f16(lp[name])
        for name in ("q_norm", "k_norm"):
            if name in lp:
                tensors[f"model.layers.{li}.self_attn.{name}.weight"] = _to_f16(lp[name])
        mlp = lp.get("mlp", {})
        if "router" in mlp:
            tensors[f"model.layers.{li}.mlp.gate.weight"] = _to_f16(
                np.asarray(mlp["router"].w).T
            )
        if "mlp.experts" in exp_layer:
            exp = exp_layer["mlp.experts"]
            n_bits = int(exp["n_bits"])
            group_size = int(exp["group_size"])
            krot = int(exp["gate_up_theta"].shape[0])
            eb = f"model.layers.{li}.mlp.experts"
            for pn in ("gate", "up", "down"):
                sub = exp[pn]
                q = np.asarray(sub["q"])  # [E, O, In]
                E = q.shape[0]
                tensors[f"{eb}.{pn}_qweight"] = np.stack(
                    [pack_wq_tpu(q[e].T, n_bits, group_size) for e in range(E)]
                )
                tensors[f"{eb}.{pn}_scales"] = np.ascontiguousarray(
                    np.swapaxes(np.asarray(sub["scales"], np.float32), 1, 2)
                )
                tensors[f"{eb}.{pn}_zeros"] = np.ascontiguousarray(
                    np.swapaxes(np.asarray(sub["zeros"], np.uint8), 1, 2)
                )
            for side in ("gate_up", "down"):
                tensors[f"{eb}.{side}_theta"] = np.asarray(exp[f"{side}_theta"], np.float16)
                tensors[f"{eb}.{side}_pairs"] = np.asarray(exp[f"{side}_pairs"], np.int16)
                tensors[f"{eb}.{side}_channel_scales"] = np.asarray(
                    exp[f"{side}_inv_channel_scales"], np.float16
                ).reshape(1, -1)
        elif "experts" in mlp and not hasattr(mlp["experts"], "gate_qweight"):
            ex = mlp["experts"]
            E = np.asarray(ex["gate_proj"]).shape[0]
            for e in range(E):
                for pn in ("gate_proj", "up_proj", "down_proj"):
                    tensors[
                        f"model.layers.{li}.mlp.experts.{e}.{pn}.weight"
                    ] = _to_f16(np.asarray(ex[pn][e]).T)
        if "linear_attn" in lp:  # gated delta-net (hybrid) extras
            la = lp["linear_attn"]
            lab = f"model.layers.{li}.linear_attn"
            tensors[f"{lab}.conv1d.weight"] = np.asarray(la["conv_w"], np.float32)
            tensors[f"{lab}.dt_bias"] = np.asarray(la["dt_bias"], np.float32)
            tensors[f"{lab}.A_log"] = np.asarray(la["A_log"], np.float32)
            tensors[f"{lab}.norm.weight"] = _to_f16(la["norm"])
        if "shared_expert_gate" in mlp:
            tensors[f"model.layers.{li}.mlp.shared_expert_gate.weight"] = _to_f16(
                np.asarray(mlp["shared_expert_gate"].w).T
            )
        for name in (
            list(_ATTN)
            + [f"linear_attn.{n}" for n in _LINEAR_ATTN]
            + [f"mlp.{m}" for m in _MLP]
            + list(_SHARED_EXPERT)
        ):
            holder, base = _holder_for(lp, name)
            if holder is None:
                continue
            prefix = hf_prefix(li, name)
            if name in exp_layer:
                exp = exp_layer[name]
                n_bits = int(exp["n_bits"])
                group_size = int(exp["group_size"])
                krot = int(exp["theta"].shape[0])
                tensors[f"{prefix}.qweight"] = pack_wq_tpu(
                    np.asarray(exp["q"]).T, n_bits, group_size
                )
                tensors[f"{prefix}.scales"] = np.asarray(exp["scales"], np.float32).T
                tensors[f"{prefix}.zeros"] = np.asarray(exp["zeros"], np.uint8).T
                tensors[f"{prefix}.theta"] = np.asarray(exp["theta"], np.float16)
                tensors[f"{prefix}.pairs"] = np.asarray(exp["pairs"], np.int16)
                tensors[f"{prefix}.channel_scales"] = np.asarray(
                    exp["inv_channel_scales"], np.float16
                ).reshape(1, -1)
                if exp.get("bias") is not None:
                    tensors[f"{prefix}.bias"] = _to_f16(exp["bias"])
            else:
                lin = holder[base]
                tensors[f"{prefix}.weight"] = _to_f16(np.asarray(lin.w).T)
                if lin.b is not None:
                    tensors[f"{prefix}.bias"] = _to_f16(lin.b)

    # safetensors serializes the raw buffer; non-C-contiguous arrays (e.g. .T
    # views) would be written in the wrong order
    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, str(path / "model.safetensors"))
    cfg = dict(hf_config) if hf_config else _config_to_hf(config)
    cfg["quantization_config"] = {
        "quant_method": "paroquant",
        "format": "paro-tpu",
        "bits": n_bits,
        "group_size": group_size,
        "krot": krot,
    }
    (path / "config.json").write_text(json.dumps(cfg, indent=2) + "\n")


def save_awq_checkpoint(
    path: str | Path,
    params: dict[str, Any],
    config: ModelConfig,
    layer_exports: list[dict[str, dict[str, Any]]],
    hf_config: dict[str, Any] | None = None,
) -> None:
    """Write the reference's AWQ-packed layout (cli/convert.py:268-273):
    qweight int32 [I, O//8] nibble-reordered, qzeros int32 [G, O//8],
    scales f16 [G, O], theta/pairs/channel_scales — loadable by the
    reference's transformers/vLLM/MLX backends and by our importer."""
    from ..ops.packing import pack_awq

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    tensors: dict[str, np.ndarray] = {}
    tensors["model.embed_tokens.weight"] = _to_f16(params["embed_tokens"])
    tensors["model.norm.weight"] = _to_f16(params["norm"])
    if "lm_head" in params:
        tensors["lm_head.weight"] = _to_f16(np.asarray(params["lm_head"].w).T)

    if config.is_gemma3n:
        _save_gemma3n_shared(tensors, params)

    n_bits, group_size, krot = 4, 128, 8
    for li, lp in enumerate(params["layers"]):
        exp_layer = layer_exports[li] if li < len(layer_exports) else {}
        if config.is_gemma3n:
            _save_gemma3n_layer(tensors, li, lp)
        for name in ("input_layernorm", "post_attention_layernorm",
                     "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            if name in lp:
                tensors[f"model.layers.{li}.{name}.weight"] = _to_f16(lp[name])
        for name in ("q_norm", "k_norm"):
            if name in lp:
                tensors[f"model.layers.{li}.self_attn.{name}.weight"] = _to_f16(lp[name])
        mlp = lp.get("mlp", {})
        if "router" in mlp:
            tensors[f"model.layers.{li}.mlp.gate.weight"] = _to_f16(
                np.asarray(mlp["router"].w).T
            )
        if "mlp.experts" in exp_layer:
            # reference per-expert AWQ MoE layout (cli/convert.py:382-405):
            # experts.{e}.{proj}.{qweight,qzeros,scales} + shared rotation
            # buffers {gate_up,down}_weight_{theta,pairs,channel_scales}
            exp = exp_layer["mlp.experts"]
            n_bits = int(exp["n_bits"])
            group_size = int(exp["group_size"])
            krot = int(exp["gate_up_theta"].shape[0])
            eb = f"model.layers.{li}.mlp.experts"
            for pn, proj in (("gate", "gate_proj"), ("up", "up_proj"),
                             ("down", "down_proj")):
                sub = exp[pn]
                q = np.asarray(sub["q"])  # [E, O, In]
                sc = np.asarray(sub["scales"], np.float32)  # [E, O, G]
                zr = np.asarray(sub["zeros"])  # [E, O, G]
                for e in range(q.shape[0]):
                    tensors[f"{eb}.{e}.{proj}.qweight"] = pack_awq(q[e].T, n_bits)
                    tensors[f"{eb}.{e}.{proj}.qzeros"] = pack_awq(zr[e].T, n_bits)
                    tensors[f"{eb}.{e}.{proj}.scales"] = np.ascontiguousarray(
                        sc[e].T
                    ).astype(np.float16)
            for side in ("gate_up", "down"):
                tensors[f"{eb}.{side}_weight_theta"] = np.asarray(
                    exp[f"{side}_theta"], np.float16
                )
                tensors[f"{eb}.{side}_weight_pairs"] = np.asarray(
                    exp[f"{side}_pairs"], np.int16
                )
                tensors[f"{eb}.{side}_weight_channel_scales"] = np.asarray(
                    exp[f"{side}_inv_channel_scales"], np.float16
                ).reshape(1, -1)
        elif "experts" in mlp:
            ex = mlp["experts"]
            if hasattr(ex, "gate_qweight"):
                raise NotImplementedError(
                    "AWQ export of already-quantized stacked experts requires "
                    "the calibration export dicts (run convert from optimizer "
                    "results); re-exporting runtime QuantizedMoEExperts to AWQ "
                    "is not supported"
                )
            E = np.asarray(ex["gate_proj"]).shape[0]
            for e in range(E):
                for pn in ("gate_proj", "up_proj", "down_proj"):
                    tensors[
                        f"model.layers.{li}.mlp.experts.{e}.{pn}.weight"
                    ] = _to_f16(np.asarray(ex[pn][e]).T)
        if "shared_expert_gate" in mlp:
            tensors[f"model.layers.{li}.mlp.shared_expert_gate.weight"] = _to_f16(
                np.asarray(mlp["shared_expert_gate"].w).T
            )
        for name in (
            list(_ATTN) + [f"mlp.{m}" for m in _MLP] + list(_SHARED_EXPERT)
        ):
            holder, base = _holder_for(lp, name)
            if holder is None:
                continue
            prefix = hf_prefix(li, name)
            if name in exp_layer:
                exp = exp_layer[name]
                n_bits = int(exp["n_bits"])
                group_size = int(exp["group_size"])
                krot = int(exp["theta"].shape[0])
                q = np.asarray(exp["q"])  # [O, I]
                tensors[f"{prefix}.qweight"] = pack_awq(q.T, n_bits)
                tensors[f"{prefix}.qzeros"] = pack_awq(
                    np.asarray(exp["zeros"]).T, n_bits
                )
                tensors[f"{prefix}.scales"] = np.ascontiguousarray(
                    np.asarray(exp["scales"], np.float32).T
                ).astype(np.float16)
                tensors[f"{prefix}.theta"] = np.asarray(exp["theta"], np.float16)
                tensors[f"{prefix}.pairs"] = np.asarray(exp["pairs"], np.int16)
                tensors[f"{prefix}.channel_scales"] = np.asarray(
                    exp["inv_channel_scales"], np.float16
                ).reshape(1, -1)
                if exp.get("bias") is not None:
                    tensors[f"{prefix}.bias"] = _to_f16(exp["bias"])
            else:
                lin = holder[base]
                tensors[f"{prefix}.weight"] = _to_f16(np.asarray(lin.w).T)
                if lin.b is not None:
                    tensors[f"{prefix}.bias"] = _to_f16(lin.b)

    tensors = {k: np.ascontiguousarray(v) for k, v in tensors.items()}
    save_file(tensors, str(path / "model.safetensors"))
    cfg = dict(hf_config) if hf_config else _config_to_hf(config)
    cfg["quantization_config"] = {
        "quant_method": "paroquant",
        "bits": n_bits,
        "group_size": group_size,
        "krot": krot,
    }
    (path / "config.json").write_text(json.dumps(cfg, indent=2) + "\n")


def _to_f16(a) -> np.ndarray:
    return np.asarray(a, np.float32).astype(np.float16)


def _config_to_hf(config: ModelConfig) -> dict[str, Any]:
    out: dict[str, Any] = {}
    if config.layer_types is not None:  # hybrid (gated delta-net) family
        out.update(
            layer_types=list(config.layer_types),
            partial_rotary_factor=config.partial_rotary_factor,
            linear_num_value_heads=config.linear_num_value_heads,
            linear_num_key_heads=config.linear_num_key_heads,
            linear_key_head_dim=config.linear_key_head_dim,
            linear_value_head_dim=config.linear_value_head_dim,
            linear_conv_kernel_dim=config.linear_conv_kernel_dim,
        )
    if config.is_moe:
        out.update(
            num_experts=config.num_experts,
            num_experts_per_tok=config.num_experts_per_tok,
            moe_intermediate_size=config.moe_intermediate_size,
            norm_topk_prob=config.norm_topk_prob,
            decoder_sparse_step=config.decoder_sparse_step,
        )
    if config.is_gemma3n:
        out.update(
            altup_num_inputs=config.altup_num_inputs,
            altup_active_idx=config.altup_active_idx,
            altup_correct_scale=config.altup_correct_scale,
            laurel_rank=config.laurel_rank,
            hidden_size_per_layer_input=config.hidden_size_per_layer_input,
            vocab_size_per_layer_input=config.vocab_size_per_layer_input,
            num_kv_shared_layers=config.num_kv_shared_layers,
            sliding_window=config.sliding_window,
            rope_local_base_freq=config.rope_local_theta,
            final_logit_softcapping=config.logit_softcap,
            hidden_activation=config.hidden_act,
        )
        if config.activation_sparsity is not None:
            out["activation_sparsity_pattern"] = list(config.activation_sparsity)
        if config.intermediate_sizes is not None:
            out["intermediate_size"] = list(config.intermediate_sizes)
    # family-specific keys (out) win — e.g. gemma3n's per-layer
    # intermediate_size list must not be clobbered by the scalar
    return {
        "model_type": config.model_type,
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.num_hidden_layers,
        "num_attention_heads": config.num_attention_heads,
        "num_key_value_heads": config.num_key_value_heads,
        "head_dim": config.head_dim,
        "rms_norm_eps": config.rms_norm_eps,
        "rope_theta": config.rope_theta,
        "max_position_embeddings": config.max_position_embeddings,
        "tie_word_embeddings": config.tie_word_embeddings,
    } | out


# ---------------------------------------------------------------------------
# load
# ---------------------------------------------------------------------------


def _open_all(model_dir: Path) -> dict[str, np.ndarray]:
    tensors: dict[str, np.ndarray] = {}
    files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)
    return tensors


def _strip_prefix(tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Normalize 'model.language_model.layers' style prefixes (reference
    vllm plugin name normalization, plugin.py:123-151)."""
    out = {}
    for k, v in tensors.items():
        k = k.replace("language_model.", "")
        out[k] = v
    return out


def load_checkpoint(
    model_dir: str | Path, rot_dtype=jnp.bfloat16, dtype=jnp.bfloat16
) -> tuple[dict[str, Any], ModelConfig]:
    """Load a model directory: PARO-TPU, AWQ-format PARO, or plain HF dense."""
    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        hf_cfg = json.load(f)
    config = from_hf_dict(hf_cfg)
    tensors = _strip_prefix(_open_all(model_dir))

    qc = config.quantization or {}
    is_quant = qc.get("quant_method") in ("paroquant", "awq")
    fmt = qc.get("format", "awq" if qc.get("quant_method") else None)
    group_size = int(qc.get("group_size", 128))
    n_bits = int(qc.get("bits", 4))

    params: dict[str, Any] = {
        "embed_tokens": jnp.asarray(tensors["model.embed_tokens.weight"], dtype),
        "norm": jnp.asarray(tensors["model.norm.weight"], dtype),
        "layers": [],
    }
    if "lm_head.weight" in tensors:
        params["lm_head"] = DenseLinear(
            jnp.asarray(tensors["lm_head.weight"].T.copy(), dtype), None
        )

    vt = "model.vision_tower.vision_model"
    if config.is_vlm and f"{vt}.post_layernorm.weight" in tensors:
        def vdense(prefix):
            w = jnp.asarray(tensors[f"{prefix}.weight"].T.copy(), dtype)
            bk = f"{prefix}.bias"
            return DenseLinear(
                w, jnp.asarray(tensors[bk], jnp.float32) if bk in tensors else None
            )

        pe = tensors[f"{vt}.embeddings.patch_embedding.weight"]  # [D, C, p, p]
        vision: dict[str, Any] = {
            "patch_embed_w": jnp.asarray(
                pe.reshape(pe.shape[0], -1).T.copy(), dtype
            ),
            "patch_embed_b": jnp.asarray(
                tensors[f"{vt}.embeddings.patch_embedding.bias"], jnp.float32
            ),
            "pos_embed": jnp.asarray(
                tensors[f"{vt}.embeddings.position_embedding.weight"], dtype
            ),
            "post_ln_w": jnp.asarray(tensors[f"{vt}.post_layernorm.weight"], dtype),
            "post_ln_b": jnp.asarray(tensors[f"{vt}.post_layernorm.bias"], dtype),
            "layers": [],
        }
        li_v = 0
        while f"{vt}.encoder.layers.{li_v}.layer_norm1.weight" in tensors:
            vb = f"{vt}.encoder.layers.{li_v}"
            vision["layers"].append({
                "ln1_w": jnp.asarray(tensors[f"{vb}.layer_norm1.weight"], dtype),
                "ln1_b": jnp.asarray(tensors[f"{vb}.layer_norm1.bias"], dtype),
                "ln2_w": jnp.asarray(tensors[f"{vb}.layer_norm2.weight"], dtype),
                "ln2_b": jnp.asarray(tensors[f"{vb}.layer_norm2.bias"], dtype),
                "q_proj": vdense(f"{vb}.self_attn.q_proj"),
                "k_proj": vdense(f"{vb}.self_attn.k_proj"),
                "v_proj": vdense(f"{vb}.self_attn.v_proj"),
                "out_proj": vdense(f"{vb}.self_attn.out_proj"),
                "fc1": vdense(f"{vb}.mlp.fc1"),
                "fc2": vdense(f"{vb}.mlp.fc2"),
            })
            li_v += 1
        params["vision"] = vision
        mp = "model.multi_modal_projector"
        params["projector"] = {
            "mm_input_projection": jnp.asarray(
                tensors[f"{mp}.mm_input_projection_weight"], dtype
            ),
            "mm_soft_emb_norm": jnp.asarray(
                tensors[f"{mp}.mm_soft_emb_norm.weight"], dtype
            ),
        }

    def dense_linear(prefix):
        w = jnp.asarray(tensors[f"{prefix}.weight"].T.copy(), dtype)
        b = (
            jnp.asarray(tensors[f"{prefix}.bias"], jnp.float32)
            if f"{prefix}.bias" in tensors
            else None
        )
        return DenseLinear(w, b)

    def quant_linear(prefix):
        bias = (
            np.asarray(tensors[f"{prefix}.bias"], np.float32)
            if f"{prefix}.bias" in tensors
            else None
        )
        theta = np.asarray(tensors[f"{prefix}.theta"], np.float32)
        pairs = np.asarray(tensors[f"{prefix}.pairs"], np.int32)
        inv_cs = np.asarray(tensors[f"{prefix}.channel_scales"], np.float32).reshape(-1)
        if fmt == "paro-tpu":
            packed = tensors[f"{prefix}.qweight"]  # [I//2, O] ours
            scales = np.asarray(tensors[f"{prefix}.scales"], np.float32)  # [G, O]
            zeros = np.asarray(tensors[f"{prefix}.zeros"], np.float32)  # [G, O]
            from ..ops.packing import unpack_w4_tpu

            q = np.asarray(unpack_w4_tpu(jnp.asarray(packed), group_size))  # [I, O]
        else:  # AWQ layout from reference checkpoints
            q = unpack_awq(tensors[f"{prefix}.qweight"], n_bits)  # [I, O]
            zeros = unpack_awq(tensors[f"{prefix}.qzeros"], n_bits).astype(np.float32)
            scales = np.asarray(tensors[f"{prefix}.scales"], np.float32)  # [G, O]
        return make_quantized_linear(
            q.T.copy(), scales.T.copy(), zeros.T.copy(), pairs, theta, inv_cs,
            group_size, bias=bias, rot_dtype=rot_dtype, n_bits=n_bits,
        )

    def pick_linear(prefix):
        if is_quant and f"{prefix}.qweight" in tensors:
            return quant_linear(prefix)
        return dense_linear(prefix)

    if config.is_gemma3n:
        # gemma-4-class extras (HF Gemma3nTextModel; the reference moves
        # exactly these modules in optim/util.py:83-103)
        params["embed_tokens_per_layer"] = jnp.asarray(
            tensors["model.embed_tokens_per_layer.weight"], dtype
        )
        params["per_layer_model_projection"] = dense_linear(
            "model.per_layer_model_projection"
        )
        params["per_layer_projection_norm"] = jnp.asarray(
            tensors["model.per_layer_projection_norm.weight"], dtype
        )
        for key in ("altup_projections", "altup_unembed_projections"):
            params[key] = [
                dense_linear(f"model.{key}.{i}")
                for i in range(config.altup_num_inputs - 1)
            ]

    for li in range(config.num_hidden_layers):
        lbase = f"model.layers.{li}"
        lp: dict[str, Any] = {
            "input_layernorm": jnp.asarray(tensors[f"{lbase}.input_layernorm.weight"], dtype),
            "post_attention_layernorm": jnp.asarray(
                tensors[f"{lbase}.post_attention_layernorm.weight"], dtype
            ),
        }
        for name in ("pre_feedforward_layernorm", "post_feedforward_layernorm"):
            k = f"{lbase}.{name}.weight"
            if k in tensors:
                lp[name] = jnp.asarray(tensors[k], dtype)
        for name in ("q_norm", "k_norm"):
            k = f"{lbase}.self_attn.{name}.weight"
            if k in tensors:
                lp[name] = jnp.asarray(tensors[k], dtype)
        if config.layer_is_linear(li):
            la = f"{lbase}.linear_attn"
            lp["linear_attn"] = {
                "in_proj_qkvz": pick_linear(f"{la}.in_proj_qkvz"),
                "in_proj_ba": pick_linear(f"{la}.in_proj_ba"),
                "out_proj": pick_linear(f"{la}.out_proj"),
                "conv_w": jnp.asarray(
                    np.asarray(tensors[f"{la}.conv1d.weight"], np.float32).reshape(
                        config.linear_conv_dim, config.linear_conv_kernel_dim
                    )
                ),
                "dt_bias": jnp.asarray(tensors[f"{la}.dt_bias"], jnp.float32),
                "A_log": jnp.asarray(tensors[f"{la}.A_log"], jnp.float32),
                "norm": jnp.asarray(tensors[f"{la}.norm.weight"], dtype),
            }
        else:
            for name in _ATTN:
                lp[name] = pick_linear(f"{lbase}.self_attn.{name}")
        if config.is_gemma3n:
            lp["altup"] = {
                "correct_output_scale": jnp.asarray(
                    tensors[f"{lbase}.altup.correct_output_scale"], jnp.float32
                ),
                "correction_coefs": dense_linear(f"{lbase}.altup.correction_coefs"),
                "prediction_coefs": dense_linear(f"{lbase}.altup.prediction_coefs"),
                "modality_router": dense_linear(f"{lbase}.altup.modality_router"),
                "router_norm": jnp.asarray(
                    tensors[f"{lbase}.altup.router_norm.weight"], dtype
                ),
            }
            lp["laurel"] = {
                "linear_left": dense_linear(f"{lbase}.laurel.linear_left"),
                "linear_right": dense_linear(f"{lbase}.laurel.linear_right"),
                "post_laurel_norm": jnp.asarray(
                    tensors[f"{lbase}.laurel.post_laurel_norm.weight"], dtype
                ),
            }
            lp["per_layer_input_gate"] = dense_linear(f"{lbase}.per_layer_input_gate")
            lp["per_layer_projection"] = dense_linear(f"{lbase}.per_layer_projection")
            lp["post_per_layer_input_norm"] = jnp.asarray(
                tensors[f"{lbase}.post_per_layer_input_norm.weight"], dtype
            )
        mlp: dict[str, Any] = {}
        if f"{lbase}.block_sparse_moe.gate.weight" in tensors:
            # HF Mixtral layout: block_sparse_moe.gate + experts.E.{w1,w3,w2}
            # (gate/up/down) -> our canonical stacked-expert form
            mlp["router"] = DenseLinear(
                jnp.asarray(
                    tensors[f"{lbase}.block_sparse_moe.gate.weight"].T.copy(), dtype
                ),
                None,
            )
            experts_mx: dict[str, list] = {"gate_proj": [], "up_proj": [], "down_proj": []}
            e = 0
            while f"{lbase}.block_sparse_moe.experts.{e}.w1.weight" in tensors:
                eb = f"{lbase}.block_sparse_moe.experts.{e}"
                experts_mx["gate_proj"].append(tensors[f"{eb}.w1.weight"].T.copy())
                experts_mx["up_proj"].append(tensors[f"{eb}.w3.weight"].T.copy())
                experts_mx["down_proj"].append(tensors[f"{eb}.w2.weight"].T.copy())
                e += 1
            mlp["experts"] = {
                pn: jnp.asarray(np.stack(ws), dtype) for pn, ws in experts_mx.items()
            }
        elif f"{lbase}.mlp.gate.weight" in tensors:  # MoE router
            mlp["router"] = DenseLinear(
                jnp.asarray(tensors[f"{lbase}.mlp.gate.weight"].T.copy(), dtype), None
            )
            eb = f"{lbase}.mlp.experts"
            awq_moe = f"{eb}.0.gate_proj.qweight" in tensors
            if f"{eb}.gate_qweight" in tensors or awq_moe:  # quantized experts
                from ..ops.moe import QuantizedMoEExperts
                from ..ops import rotation as _rot

                # paro-tpu names the shared rotation buffers {side}_theta;
                # the reference AWQ layout names them {side}_weight_theta
                rot_key = "{side}_weight_{leaf}" if awq_moe else "{side}_{leaf}"

                def _rotm(side):
                    def t(leaf):
                        return tensors[f"{eb}.{rot_key.format(side=side, leaf=leaf)}"]

                    pairs = np.asarray(t("pairs"), np.int32)
                    theta = np.asarray(t("theta"), np.float32)
                    inv_cs = np.asarray(t("channel_scales"), np.float32).reshape(-1)
                    form_np = _rot.pairs_to_permutation(pairs, group_size)
                    form = _rot.PermutationForm(*(jnp.asarray(a) for a in form_np))
                    R = _rot.build_rotation_matrices(
                        jnp.asarray(theta), form, group_size, dtype=jnp.float32
                    )
                    inv = jnp.asarray(inv_cs).reshape(-1, group_size)
                    return (R * inv[:, None, :]).astype(rot_dtype)

                def _stack(pn):
                    # scales/zeros in bf16 narrow storage — must match
                    # optim.pseudo_moe.quantized_moe_from_export exactly so
                    # the loaded model is bit-identical to the in-memory one
                    if not awq_moe:
                        return (
                            jnp.asarray(tensors[f"{eb}.{pn}_qweight"]),
                            jnp.asarray(tensors[f"{eb}.{pn}_scales"], jnp.float32)
                            .astype(jnp.bfloat16),
                            jnp.asarray(tensors[f"{eb}.{pn}_zeros"], jnp.float32)
                            .astype(jnp.bfloat16),
                        )
                    # per-expert AWQ buffers -> stacked PARO-TPU packing
                    proj = {"gate": "gate_proj", "up": "up_proj", "down": "down_proj"}[pn]
                    qs, scs, zrs = [], [], []
                    e = 0
                    while f"{eb}.{e}.{proj}.qweight" in tensors:
                        q = unpack_awq(tensors[f"{eb}.{e}.{proj}.qweight"], n_bits)
                        zr = unpack_awq(
                            tensors[f"{eb}.{e}.{proj}.qzeros"], n_bits
                        ).astype(np.float32)  # [G, O]
                        sc = np.asarray(
                            tensors[f"{eb}.{e}.{proj}.scales"], np.float32
                        )  # [G, O]
                        qs.append(np.asarray(pack_wq_tpu(q, n_bits, group_size)))
                        scs.append(sc)
                        zrs.append(zr)
                        e += 1
                    return (
                        jnp.asarray(np.stack(qs)),
                        jnp.asarray(np.stack(scs), jnp.float32).astype(jnp.bfloat16),
                        jnp.asarray(np.stack(zrs), jnp.float32).astype(jnp.bfloat16),
                    )

                gq, gsc, gz = _stack("gate")
                uq, usc, uz = _stack("up")
                dq, dsc, dz = _stack("down")
                mlp["experts"] = QuantizedMoEExperts(
                    gate_qweight=gq, gate_scales=gsc, gate_zeros=gz,
                    up_qweight=uq, up_scales=usc, up_zeros=uz,
                    down_qweight=dq, down_scales=dsc, down_zeros=dz,
                    gate_up_rot=_rotm("gate_up"), down_rot=_rotm("down"),
                )
            else:
                experts: dict[str, list] = {"gate_proj": [], "up_proj": [], "down_proj": []}
                e = 0
                while f"{lbase}.mlp.experts.{e}.gate_proj.weight" in tensors:
                    for pn in experts:
                        experts[pn].append(
                            tensors[f"{lbase}.mlp.experts.{e}.{pn}.weight"].T.copy()
                        )
                    e += 1
                mlp["experts"] = {
                    pn: jnp.asarray(np.stack(ws), dtype) for pn, ws in experts.items()
                }
            # Qwen3-Next/Qwen2-MoE-style shared expert: always-on GLU beside
            # the routed experts, sigmoid-gated (decoder.moe_forward); the
            # reference quantizes it and skips only the gate
            # (experiments/optimize/4bit_moe.sh --skipped-modules)
            sb = f"{lbase}.mlp.shared_expert"
            if f"{sb}.gate_proj.weight" in tensors or f"{sb}.gate_proj.qweight" in tensors:
                mlp["shared_expert"] = {
                    name: pick_linear(f"{sb}.{name}") for name in _MLP
                }
                mlp["shared_expert_gate"] = DenseLinear(
                    jnp.asarray(
                        tensors[f"{lbase}.mlp.shared_expert_gate.weight"].T.copy(),
                        dtype,
                    ),
                    None,
                )
        else:
            for name in _MLP:
                mlp[name] = pick_linear(f"{lbase}.mlp.{name}")
        lp["mlp"] = mlp
        params["layers"].append(lp)
    return params, config
