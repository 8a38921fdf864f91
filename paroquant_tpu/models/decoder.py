"""Functional JAX decoder covering the reference's model families.

One implementation serves Llama / Qwen2 / Qwen3 (dense + MoE) / Gemma-class,
selected by ModelConfig feature flags — replacing the reference's reliance on
HF Transformers / vLLM / MLX model zoos (SURVEY.md §2.3). Params are plain
pytrees; every linear is either a DenseLinear or an ops.QuantizedLinear, so a
quantized checkpoint swaps layer pytrees without touching model code (the
TPU equivalent of the reference's Linear->RotateQuantizedLinear module
surgery, backends/transformers/quantizer.py:88-115).

Design notes (TPU-first):
- static shapes everywhere; decode uses a preallocated KV cache with
  dynamic_update_slice, prefill is one batched pass
- attention is einsum-based GQA for the contiguous path; the serving engine
  additionally has a paged decode path (serve/paged.py)
- math in bf16 with f32 accumulators (preferred_element_type), RMSNorm in f32
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qlinear import (
    MergedQuantizedLinear,
    QuantizedLinear,
    merge_quantized_linears,
    merged_linear_forward,
    quantized_linear_forward,
)
from .config import ModelConfig


class DenseLinear(NamedTuple):
    w: jax.Array  # [I, O]
    b: jax.Array | None


Linear = DenseLinear | QuantizedLinear


def apply_linear(lin: Linear, x: jax.Array, *, quant_mode: str = "xla") -> jax.Array:
    if isinstance(lin, QuantizedLinear):
        return quantized_linear_forward(lin, x, mode=quant_mode)
    if type(lin).__name__ == "TPQuantizedLinear":  # sharded serving (TP/SP)
        from ..parallel.tp import tp_linear_forward

        return tp_linear_forward(lin, x, quant_mode)
    if type(lin).__name__ == "PseudoQuantLinear":  # calibration path
        from ..optim.pseudo import pseudo_linear_forward

        return pseudo_linear_forward(lin, x)
    y = jnp.dot(x, lin.w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if lin.b is not None:
        y = y + lin.b.astype(y.dtype)
    return y


def merged_forward_parts(layer, x: jax.Array, quant_mode: str) -> tuple:
    """Per-partition outputs of a merged projection, handling both the plain
    MergedQuantizedLinear (forward + split) and the TP wrapper (shard_map
    tuple output) — the single dispatch point for every QKV/gate-up caller."""
    if type(layer).__name__ == "TPMergedLinear":
        from ..parallel.tp import tp_merged_forward_split

        return tp_merged_forward_split(layer, x, quant_mode)
    y = merged_linear_forward(layer, x, mode=quant_mode)
    return tuple(jnp.split(y, layer.split_points, axis=-1))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float, gemma_style: bool) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if gemma_style:
        w = 1.0 + w
    return (xn * w).astype(x.dtype)


def rope_tables(positions: jax.Array, head_dim: int, theta: float) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables [.., T, head_dim//2] for rotate-half RoPE."""
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., T, half]
    return jnp.cos(angles), jnp.sin(angles)


def layer_rope_theta(config: ModelConfig, layer_idx: int) -> float:
    """Per-layer RoPE base: Gemma-3-class local (sliding-window) layers use
    rope_local_base_freq (e.g. 10k) while global layers keep rope_theta
    (e.g. 1e6) — HF Gemma3 rotary handling, parsed in config.py."""
    if (
        config.rope_local_theta is not None
        and config.layer_sliding_window(layer_idx) is not None
    ):
        return config.rope_local_theta
    return config.rope_theta


def rope_tables_per_layer(
    positions: jax.Array, config: ModelConfig
) -> list[tuple[jax.Array, jax.Array]]:
    """One (cos, sin) pair per layer, computed once per distinct theta.
    Tables cover config.rotary_dim dims (partial rotary passes the rest)."""
    by_theta: dict[float, tuple[jax.Array, jax.Array]] = {}
    out = []
    for li in range(config.num_hidden_layers):
        th = layer_rope_theta(config, li)
        if th not in by_theta:
            by_theta[th] = rope_tables(positions, config.rotary_dim, th)
        out.append(by_theta[th])
    return out


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, T, H, D]; rotate-half convention (HF llama). Supports partial
    rotary (qwen3_next partial_rotary_factor): when the tables cover fewer
    dims than D, the remaining dims pass through unrotated."""
    half = cos.shape[-1]
    rd = 2 * half
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    x1f, x2f = x1.astype(jnp.float32), x2.astype(jnp.float32)
    rotated = jnp.concatenate([x1f * c - x2f * s, x2f * c + x1f * s], axis=-1).astype(x.dtype)
    if x_pass.shape[-1] == 0:
        return rotated
    return jnp.concatenate([rotated, x_pass], axis=-1)


class KVCache(NamedTuple):
    """Uniform-length KV cache for batch decode: k/v are TUPLES of Lf
    per-layer head-major buffers [B, Hkv, S, D].

    Per-layer leaves, NOT one stacked [Lf, ...] array: the round-5 B=32
    device profile (scripts/bench_decode_accounting.py) showed a stacked
    carry cost ~2 full cache copies per decode step — each scan step
    sliced every layer out of the stack and jnp.stack'ed the updates back
    (4 cache-sized slice_bitcast fusions + a 6 ms dynamic-update-slice
    bucket = 13.5 of 29 ms/step at 7B). With one buffer per layer the
    only write is the layer's own one-token dynamic_update_slice, which
    XLA aliases in place across the scan. Head-major (S inside Hkv)
    matches the attention dots' batch dims and the Pallas flash kernel.

    Lf = number of full-attention layers (== num_hidden_layers for
    non-hybrid models). Hybrid (qwen3_next) models carry the linear-layer
    conv/recurrent states in `linear` instead of KV rows."""

    k: tuple[jax.Array, ...]
    v: tuple[jax.Array, ...]
    length: jax.Array  # int32 scalar: tokens already cached
    linear: Any = None  # LinearAttnStates for hybrid models

    @classmethod
    def create(
        cls, config: ModelConfig, batch: int, max_len: int, dtype=jnp.bfloat16
    ) -> "KVCache":
        shape = (
            batch,
            config.num_key_value_heads,
            max_len,
            config.head_dim,
        )
        linear = None
        if config.num_linear_layers:
            from .linear_attn import LinearAttnStates

            linear = LinearAttnStates.create(config, batch)
        n = config.num_full_attn_layers
        return cls(
            k=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
            v=tuple(jnp.zeros(shape, dtype) for _ in range(n)),
            length=jnp.zeros((), jnp.int32), linear=linear,
        )


def attention_kvmajor(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, Hkv, S, D]  (head-major: KVCache storage layout)
    v: jax.Array,  # [B, Hkv, S, D]
    q_positions: jax.Array,  # int32 [B, T] absolute positions of queries
    kv_valid_len: jax.Array,  # int32 scalar: number of valid kv slots
    *,
    scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    bidir_groups: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Causal GQA attention over a (possibly partially-filled) kv buffer.

    HEAD-MAJOR kv: both dots batch over (b, h) with k/v consumed in their
    stored layout — no transpose materialization of the cache (the round-5
    B=32 profile showed those transposes + the copy they forced on the scan
    carry cost ~2 full-cache moves per decode step).

    bidir_groups: optional (q_groups [B, T], kv_groups [B, S]) int32 ids;
    positions sharing a non-negative id attend BIDIRECTIONALLY (Gemma3 VLM
    image blocks, HF token_type_ids_mask_function)."""
    B, T, Hq, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = Hq // Hkv
    # Dots run in the STORED kv dtype with f32 accumulation (MXU-native
    # bf16 x bf16 -> f32). Upcasting k/v to f32 materializes the whole cache
    # as f32 every decode step — at 7B/B=32 that cast traffic exceeded the
    # W4 weight stream and dominated the batched-decode device profile
    # (scripts/bench_decode_accounting.py). bf16 inputs lose nothing (the
    # cache IS bf16); probs are cast down for the PV dot — standard flash
    # -attention practice (bf16 operands, f32 accumulation). NOTE: the Pallas
    # flash kernels (kernels/attention.py) keep their PV dot in f32, so this
    # einsum path is the LOWER-precision side of flash-vs-einsum tests.
    cdt = k.dtype if k.dtype in (jnp.bfloat16, jnp.float16, jnp.float32) \
        else jnp.float32
    qc = q.reshape(B, T, Hkv, group, D).astype(cdt)
    scores = jnp.einsum("bthgd,bhsd->bhgts", qc, k.astype(cdt),
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, None, :]  # [1, 1, S]
    qp = q_positions[:, :, None]  # [B, T, 1]
    mask = (kv_pos <= qp) & (kv_pos < kv_valid_len)
    if sliding_window is not None:
        mask &= kv_pos > qp - sliding_window
    if bidir_groups is not None:
        qg, kg = bidir_groups
        same = (qg[:, :, None] >= 0) & (qg[:, :, None] == kg[:, None, :])
        mask |= same & (kv_pos < kv_valid_len)
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhgts,bhsd->bthgd", probs.astype(cdt), v.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, Hq, D).astype(q.dtype)


def attention(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, S, Hkv, D]  (token-major convenience layout)
    v: jax.Array,  # [B, S, Hkv, D]
    q_positions: jax.Array,
    kv_valid_len: jax.Array,
    *,
    scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    bidir_groups: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Token-major wrapper over attention_kvmajor (reference/test surface;
    ring attention and the kernel-equality tests speak [B, S, Hkv, D])."""
    return attention_kvmajor(
        q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), q_positions,
        kv_valid_len, scale=scale, sliding_window=sliding_window,
        logit_softcap=logit_softcap, bidir_groups=bidir_groups,
    )


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------


def _act(x: jax.Array, name: str) -> jax.Array:
    xf = x.astype(jnp.float32)
    if name in ("gelu_pytorch_tanh", "gelu_tanh", "gelu"):
        return jax.nn.gelu(xf, approximate=True).astype(x.dtype)
    return jax.nn.silu(xf).astype(x.dtype)


def mlp_forward(p: dict[str, Any], x: jax.Array, quant_mode: str,
                act: str = "silu", return_act: bool = False):
    if "gate_up_proj" in p:  # merged projections (one kernel launch)
        gate, up = merged_forward_parts(p["gate_up_proj"], x, quant_mode)
    else:
        gate = apply_linear(p["gate_proj"], x, quant_mode=quant_mode)
        up = apply_linear(p["up_proj"], x, quant_mode=quant_mode)
    act_v = _act(gate, act) * up
    out = apply_linear(p["down_proj"], act_v, quant_mode=quant_mode)
    if return_act:  # down_proj's input tap (GPTQ Hessian collection)
        return out, act_v
    return out


def qkv_forward(
    p: dict[str, Any], h: jax.Array, config: ModelConfig, quant_mode: str
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array | None]:
    """q/k/v projections (via the merged layer when present) + optional
    attention output gate (qwen3_next: q_proj emits (query, gate) per head,
    HF Qwen3NextAttention)."""
    B, T, _ = h.shape
    Hq, Hkv, D = config.num_attention_heads, config.num_key_value_heads, config.head_dim
    if "qkv_proj" in p:
        q, k, v = merged_forward_parts(p["qkv_proj"], h, quant_mode)
    else:
        q = apply_linear(p["q_proj"], h, quant_mode=quant_mode)
        k = apply_linear(p["k_proj"], h, quant_mode=quant_mode)
        v = apply_linear(p["v_proj"], h, quant_mode=quant_mode)
    gate = None
    if config.attn_gate:
        qg = q.reshape(B, T, Hq, 2 * D)
        q = qg[..., :D]
        gate = qg[..., D:].reshape(B, T, Hq * D)
    return (
        q.reshape(B, T, Hq, D),
        k.reshape(B, T, Hkv, D),
        v.reshape(B, T, Hkv, D),
        gate,
    )


def merge_projections(params: dict[str, Any], config: ModelConfig) -> dict[str, Any]:
    """Post-load optimization: merge q/k/v and gate/up quantized projections
    per layer into MergedQuantizedLinears (one kernel launch + one weight
    stream each, like the reference vLLM plugin's merged QKV/gate-up,
    plugin.py:193-205). Single-device layout; apply before TP sharding rules
    only if the rules understand merged layers."""
    out = dict(params)
    layers = []
    for li, lp in enumerate(params["layers"]):
        nlp = dict(lp)
        # gemma3n shared-KV tail: k/v projections are never applied, so a
        # merged QKV would compute (and stream) them for nothing
        kv_unused = config.kv_share_source(li) is not None
        if not kv_unused and all(
            isinstance(lp.get(n), QuantizedLinear) for n in ("q_proj", "k_proj", "v_proj")
        ):
            nlp["qkv_proj"] = merge_quantized_linears(
                [lp["q_proj"], lp["k_proj"], lp["v_proj"]]
            )
            for n in ("q_proj", "k_proj", "v_proj"):
                nlp.pop(n)
        mlp = dict(lp["mlp"])
        if all(isinstance(mlp.get(n), QuantizedLinear) for n in ("gate_proj", "up_proj")):
            mlp["gate_up_proj"] = merge_quantized_linears(
                [mlp["gate_proj"], mlp["up_proj"]]
            )
            mlp.pop("gate_proj")
            mlp.pop("up_proj")
        nlp["mlp"] = mlp
        layers.append(nlp)
    out["layers"] = layers
    return out


def moe_forward(p: dict[str, Any], x: jax.Array, config: ModelConfig,
                quant_mode: str, return_act: bool = False):
    """Token-choice top-k MoE (Qwen3-MoE semantics).

    Router in f32; top-k gating optionally renormalized (norm_topk_prob).
    Expert weights are stacked [E, I, O_e]; dispatch gathers only the selected
    experts' weights per token — efficient for decode-sized T. (A capacity-
    bucketed grouped-GEMM path for large prefill lives in ops/moe.py.)
    """
    from ..ops.moe import moe_apply

    experts = p["experts"]
    if type(experts).__name__ == "PseudoQuantMoEExperts":  # calibration path
        from ..optim.pseudo_moe import pseudo_moe_effective_experts

        p = dict(p)
        p["experts"] = pseudo_moe_effective_experts(experts)

    shape = x.shape
    xt = x.reshape(-1, shape[-1])
    router_logits = jnp.dot(
        xt.astype(jnp.float32), p["router"].w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(router_logits, axis=-1)
    gate_vals, idx = jax.lax.top_k(probs, config.num_experts_per_tok)
    if config.norm_topk_prob:
        gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)
    act = shared_act = None
    if return_act:
        y, act = moe_apply(
            p["experts"], xt, idx, gate_vals.astype(x.dtype), quant_mode,
            return_act=True,
        )
    else:
        y = moe_apply(p["experts"], xt, idx, gate_vals.astype(x.dtype), quant_mode)
    if "shared_expert" in p:
        if return_act:
            shared, shared_act = mlp_forward(
                p["shared_expert"], xt, quant_mode, return_act=True
            )
        else:
            shared = mlp_forward(p["shared_expert"], xt, quant_mode)
        sg = jax.nn.sigmoid(
            jnp.dot(xt.astype(jnp.float32), p["shared_expert_gate"].w.astype(jnp.float32))
        ).astype(x.dtype)
        y = y + shared * sg
    y = y.reshape(shape)
    return (y, act, shared_act) if return_act else y


def layer_forward(
    p: dict[str, Any],
    x: jax.Array,
    config: ModelConfig,
    layer_idx: int,
    cos: jax.Array,
    sin: jax.Array,
    q_positions: jax.Array,
    kv_cache_layer: tuple[jax.Array, jax.Array] | None,
    cache_offset: jax.Array,
    quant_mode: str,
    attn_mode: str = "einsum",
    bidir_groups: jax.Array | None = None,  # [B, T] image-block ids (VLM)
    return_taps: bool = False,  # also return per-linear input activations
):
    B, T, _ = x.shape
    Hq, Hkv, D = config.num_attention_heads, config.num_key_value_heads, config.head_dim
    taps: dict[str, jax.Array] = {}

    h = rms_norm(x, p["input_layernorm"], config.rms_norm_eps, config.zero_centered_norm)
    if return_taps:
        taps["qkv"] = h  # input to q/k/v projections
    q, k, v, attn_gate = qkv_forward(p, h, config, quant_mode)
    if config.qk_norm:
        q = rms_norm(q, p["q_norm"], config.rms_norm_eps, config.zero_centered_norm)
        k = rms_norm(k, p["k_norm"], config.rms_norm_eps, config.zero_centered_norm)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # head-major kv from here on ([B, Hkv, S, D] — the KVCache storage and
    # flash-kernel layout; the transpose touches only the T fresh tokens)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    if kv_cache_layer is not None:
        ck, cv = kv_cache_layer  # [B, Hkv, S, D]
        ck = jax.lax.dynamic_update_slice(
            ck, kh.astype(ck.dtype), (0, 0, cache_offset, 0))
        cv = jax.lax.dynamic_update_slice(
            cv, vh.astype(cv.dtype), (0, 0, cache_offset, 0))
        k_all, v_all = ck, cv
        valid = cache_offset + T
        new_cache = (ck, cv)
    else:
        k_all, v_all = kh, vh
        valid = jnp.asarray(T, jnp.int32)
        new_cache = None

    S_kv = k_all.shape[2]
    # kv block: whole buffer when small, else the largest 128-multiple tile
    # that divides it (chunked prefill's kv buffer is bucket+chunk, which is
    # a 128-multiple but not always a 256-multiple — e.g. bucket 128 + chunk
    # 256 = 384; block_k=128 keeps those on the flash path)
    block_k = next((b for b in (256, 128) if S_kv % b == 0),
                   S_kv if S_kv <= 256 else None)
    flash_ok = (
        attn_mode == "flash"
        and T >= 128 and T % 128 == 0
        and block_k is not None
        and bidir_groups is None
    )
    if flash_ok:
        # Pallas flash kernel. q_offset is TRACED (q_positions ==
        # cache_offset + arange(T)), so chunked prefill at any chunk start
        # reuses one compilation; bucketed prefill pads kv and masks by
        # `valid`
        from ..kernels.attention import flash_attention

        attn_out = flash_attention(
            jnp.swapaxes(q, 1, 2), k_all, v_all,
            jnp.broadcast_to(valid.reshape(-1), (B,)),
            scale=config.attn_scale,
            q_offset=jnp.asarray(cache_offset, jnp.int32),
            sliding_window=config.layer_sliding_window(layer_idx),
            logit_softcap=config.attn_logit_softcap,
            block_q=min(256, T), block_k=block_k,
        )
        attn_out = jnp.swapaxes(attn_out, 1, 2)
    elif callable(attn_mode):
        # injected attention impl (parallel/tp.py make_tp_flash_attn,
        # parallel/ring.py sp_prefill, bench ablations). CONVENTION: impls
        # take q [B, T, Hq, D] and HEAD-MAJOR k/v [B, Hkv, S, D] (the
        # KVCache storage layout). bidir groups loudly unsupported.
        if bidir_groups is not None:
            raise NotImplementedError("bidir (VLM) blocks under SP prefill")
        attn_out = attn_mode(
            q, k_all, v_all, q_positions, valid,
            scale=config.attn_scale,
            sliding_window=config.layer_sliding_window(layer_idx),
            logit_softcap=config.attn_logit_softcap,
        )
    else:
        bg = None
        if bidir_groups is not None:
            kv_groups = jnp.full((B, S_kv), -1, jnp.int32)
            kv_groups = jax.lax.dynamic_update_slice(
                kv_groups, bidir_groups, (0, cache_offset)
            ) if kv_cache_layer is not None else jnp.pad(
                bidir_groups, ((0, 0), (0, S_kv - T)), constant_values=-1
            )
            bg = (bidir_groups, kv_groups)
        attn_out = attention_kvmajor(
            q, k_all, v_all, q_positions, valid,
            scale=config.attn_scale,
            sliding_window=config.layer_sliding_window(layer_idx),
            logit_softcap=config.attn_logit_softcap,
            bidir_groups=bg,
        )
    attn_out = attn_out.reshape(B, T, Hq * D)
    if attn_gate is not None:
        attn_out = (
            attn_out.astype(jnp.float32) * jax.nn.sigmoid(attn_gate.astype(jnp.float32))
        ).astype(attn_out.dtype)
    if return_taps:
        taps["o"] = attn_out  # input to o_proj
    attn_out = apply_linear(p["o_proj"], attn_out, quant_mode=quant_mode)
    if config.post_norms:
        attn_out = rms_norm(
            attn_out, p["post_attention_layernorm"], config.rms_norm_eps, config.zero_centered_norm
        )
        x = x + attn_out
        h2 = rms_norm(x, p["pre_feedforward_layernorm"], config.rms_norm_eps, config.zero_centered_norm)
    else:
        x = x + attn_out
        h2 = rms_norm(x, p["post_attention_layernorm"], config.rms_norm_eps, config.zero_centered_norm)

    if return_taps:
        taps["mlp"] = h2  # input to gate/up projections (dense mlp)
    if config.layer_is_sparse(layer_idx) and return_taps:
        mlp_out, moe_act, shared_act = moe_forward(
            p["mlp"], h2, config, quant_mode, return_act=True
        )
        # routed down_proj inputs, pooled over expert assignments [N, I_moe]
        # (shared-Hessian GPTQ across experts, like pseudo_moe's shared
        # rotations / reference qexperts.py)
        taps["moe_down"] = moe_act
        if shared_act is not None:
            taps["shared_down"] = shared_act
    elif config.layer_is_sparse(layer_idx):
        mlp_out = moe_forward(p["mlp"], h2, config, quant_mode)
    elif return_taps:
        mlp_out, act_v = mlp_forward(
            p["mlp"], h2, quant_mode, config.hidden_act, return_act=True
        )
        taps["down"] = act_v
    else:
        mlp_out = mlp_forward(p["mlp"], h2, quant_mode, config.hidden_act)
    if config.post_norms:
        mlp_out = rms_norm(
            mlp_out, p["post_feedforward_layernorm"], config.rms_norm_eps, config.zero_centered_norm
        )
    if return_taps:
        return x + mlp_out, new_cache, taps
    return x + mlp_out, new_cache


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def lm_head_logits(params, config, x, quant_mode="xla"):
    """Final-hidden [.., H] -> f32 logits [.., V] (tied-embedding aware)."""
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(
            x, params["embed_tokens"].T.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        logits = apply_linear(lm_head, x, quant_mode=quant_mode)
    logits = logits.astype(jnp.float32)
    if config.logit_softcap:
        logits = jnp.tanh(logits / config.logit_softcap) * config.logit_softcap
    return logits


def model_forward(
    params: dict[str, Any],
    config: ModelConfig,
    tokens: jax.Array,  # int32 [B, T]
    cache: KVCache | None = None,
    *,
    quant_mode: str = "xla",
    attn_mode: str = "einsum",
    input_embeds: jax.Array | None = None,  # [B, T, H] (VLM: image soft tokens)
    bidir_groups: jax.Array | None = None,  # [B, T] image-block ids (VLM)
    linear_valid_len: jax.Array | None = None,  # hybrid: true length of a
    # zero-padded prefill bucket (masks padding out of delta-net states)
    positions: jax.Array | None = None,  # [B, T] global position override
    # (striped SP layouts permute tokens; RoPE/causality follow positions)
    return_hidden: bool = False,  # skip lm_head: return final hidden [B,T,H]
) -> tuple[jax.Array, KVCache | None]:
    """Returns (logits [B, T, V] — or final hidden states with
    return_hidden=True — and the updated cache)."""
    if config.is_gemma3n:
        if return_hidden:
            raise NotImplementedError(
                "return_hidden is not plumbed through the gemma3n forward")
        from .gemma3n import gemma3n_forward

        return gemma3n_forward(
            params, config, tokens, cache, quant_mode=quant_mode,
            attn_mode=attn_mode, input_embeds=input_embeds,
        )
    B, T = tokens.shape
    if input_embeds is not None:
        x = input_embeds
    else:
        x = jnp.take(params["embed_tokens"], tokens, axis=0)
        if config.gemma_norm:
            x = x * jnp.asarray(np.sqrt(config.hidden_size), x.dtype)

    offset = cache.length if cache is not None else jnp.zeros((), jnp.int32)
    if positions is None:
        positions = offset + jnp.arange(T, dtype=jnp.int32)[None, :]  # [1, T]
        positions = jnp.broadcast_to(positions, (B, T))
    rope_by_layer = rope_tables_per_layer(positions, config)

    new_k, new_v = [], []
    new_conv, new_rec = [], []
    for i, layer_params in enumerate(params["layers"]):
        if config.layer_is_linear(i):
            from .linear_attn import delta_net_forward

            ll = config.linear_layer_index(i)
            conv_st = None if cache is None else cache.linear.conv[ll]
            rec_st = None if cache is None else cache.linear.rec[ll]
            h = rms_norm(x, layer_params["input_layernorm"], config.rms_norm_eps,
                         config.zero_centered_norm)
            attn_out, conv_st, rec_st = delta_net_forward(
                layer_params["linear_attn"], h, config, conv_st, rec_st,
                quant_mode, valid_len=linear_valid_len,
            )
            x = x + attn_out
            h2 = rms_norm(x, layer_params["post_attention_layernorm"],
                          config.rms_norm_eps, config.zero_centered_norm)
            if config.layer_is_sparse(i):
                mlp_out = moe_forward(layer_params["mlp"], h2, config, quant_mode)
            else:
                mlp_out = mlp_forward(layer_params["mlp"], h2, quant_mode,
                                      config.hidden_act)
            x = x + mlp_out
            if cache is not None:
                new_conv.append(conv_st)
                new_rec.append(rec_st)
            continue
        ki = config.kv_layer_index(i)
        layer_cache = None if cache is None else (cache.k[ki], cache.v[ki])
        cos, sin = rope_by_layer[i]
        x, updated = layer_forward(
            layer_params, x, config, i, cos, sin, positions, layer_cache, offset,
            quant_mode, attn_mode, bidir_groups,
        )
        if updated is not None:
            new_k.append(updated[0])
            new_v.append(updated[1])

    x = rms_norm(x, params["norm"], config.rms_norm_eps, config.zero_centered_norm)
    if return_hidden:
        # pre-lm_head hidden states: long-window PPL computes the CE in
        # token chunks (a [16k, 151936] f32 logits tensor is ~10GB — OOM on
        # one chip); see lm_head_logits + cli/evaluate.perplexity
        logits = x
    else:
        logits = lm_head_logits(params, config, x, quant_mode)

    if cache is not None:
        linear = None
        if new_conv:
            from .linear_attn import LinearAttnStates

            linear = LinearAttnStates(jnp.stack(new_conv), jnp.stack(new_rec))
        cache = KVCache(tuple(new_k), tuple(new_v), offset + T, linear)
    return logits, cache


# ---------------------------------------------------------------------------
# Random init (tests / synthetic benchmarks)
# ---------------------------------------------------------------------------


def _dense(key, fan_in, fan_out, dtype, bias=False) -> DenseLinear:
    w = jax.random.normal(key, (fan_in, fan_out), jnp.float32) / np.sqrt(fan_in)
    return DenseLinear(w.astype(dtype), jnp.zeros((fan_out,), dtype) if bias else None)


def init_params(config: ModelConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict[str, Any]:
    if config.is_gemma3n:
        from .gemma3n import init_gemma3n_params

        return init_gemma3n_params(config, key, dtype)
    keys = iter(jax.random.split(key, 64 + 16 * config.num_hidden_layers))
    H, D = config.hidden_size, config.head_dim
    Hq, Hkv = config.num_attention_heads, config.num_key_value_heads
    params: dict[str, Any] = {
        "embed_tokens": (
            jax.random.normal(next(keys), (config.vocab_size, H), jnp.float32) * 0.02
        ).astype(dtype),
        "norm": jnp.ones((H,), dtype),
        "layers": [],
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = _dense(next(keys), H, config.vocab_size, dtype)
    for i in range(config.num_hidden_layers):
        if config.layer_is_linear(i):
            Hk_l, Hv_l = config.linear_num_key_heads, config.linear_num_value_heads
            dk_l, dv_l = config.linear_key_head_dim, config.linear_value_head_dim
            cdim, Kc = config.linear_conv_dim, config.linear_conv_kernel_dim
            k1, k2, k3, k4 = jax.random.split(next(keys), 4)
            lp = {
                "input_layernorm": jnp.ones((H,), dtype),
                "post_attention_layernorm": jnp.ones((H,), dtype),
                "linear_attn": {
                    "in_proj_qkvz": _dense(
                        k1, H, 2 * Hk_l * dk_l + 2 * Hv_l * dv_l, dtype
                    ),
                    "in_proj_ba": _dense(k2, H, 2 * Hv_l, dtype),
                    "conv_w": (
                        jax.random.normal(k3, (cdim, Kc), jnp.float32) * 0.3
                    ).astype(jnp.float32),
                    "dt_bias": jnp.ones((Hv_l,), jnp.float32),
                    "A_log": jnp.log(
                        jax.random.uniform(k4, (Hv_l,), jnp.float32, 1e-2, 16.0)
                    ),
                    "norm": jnp.ones((dv_l,), dtype),
                    "out_proj": _dense(next(keys), Hv_l * dv_l, H, dtype),
                },
            }
            lp["mlp"] = _init_mlp(config, keys, i, dtype)
            params["layers"].append(lp)
            continue
        q_out = Hq * D * 2 if config.attn_gate else Hq * D
        lp: dict[str, Any] = {
            "input_layernorm": jnp.ones((H,), dtype),
            "post_attention_layernorm": jnp.ones((H,), dtype),
            "q_proj": _dense(next(keys), H, q_out, dtype, config.attention_bias),
            "k_proj": _dense(next(keys), H, Hkv * D, dtype, config.attention_bias),
            "v_proj": _dense(next(keys), H, Hkv * D, dtype, config.attention_bias),
            "o_proj": _dense(next(keys), Hq * D, H, dtype),
        }
        if config.qk_norm:
            lp["q_norm"] = jnp.ones((D,), dtype)
            lp["k_norm"] = jnp.ones((D,), dtype)
        if config.post_norms:
            lp["pre_feedforward_layernorm"] = jnp.ones((H,), dtype)
            lp["post_feedforward_layernorm"] = jnp.ones((H,), dtype)
        lp["mlp"] = _init_mlp(config, keys, i, dtype)
        params["layers"].append(lp)
    return params


def _init_mlp(config: ModelConfig, keys, i: int, dtype) -> dict[str, Any]:
    H = config.hidden_size
    if config.layer_is_sparse(i):
        E, I_moe = config.num_experts, config.moe_intermediate_size
        k1, k2, k3, k4 = jax.random.split(next(keys), 4)
        mlp: dict[str, Any] = {
            "router": DenseLinear(
                (jax.random.normal(k1, (H, E), jnp.float32) * 0.02).astype(dtype), None
            ),
            "experts": {
                "gate_proj": (
                    jax.random.normal(k2, (E, H, I_moe), jnp.float32) / np.sqrt(H)
                ).astype(dtype),
                "up_proj": (
                    jax.random.normal(k3, (E, H, I_moe), jnp.float32) / np.sqrt(H)
                ).astype(dtype),
                "down_proj": (
                    jax.random.normal(k4, (E, I_moe, H), jnp.float32) / np.sqrt(I_moe)
                ).astype(dtype),
            },
        }
        if config.shared_expert_intermediate_size:
            I_sh = config.shared_expert_intermediate_size
            mlp["shared_expert"] = {
                "gate_proj": _dense(next(keys), H, I_sh, dtype),
                "up_proj": _dense(next(keys), H, I_sh, dtype),
                "down_proj": _dense(next(keys), I_sh, H, dtype),
            }
            mlp["shared_expert_gate"] = DenseLinear(
                (jax.random.normal(next(keys), (H, 1), jnp.float32) * 0.02
                 ).astype(dtype), None,
            )
        return mlp
    return {
        "gate_proj": _dense(next(keys), H, config.intermediate_size, dtype, config.mlp_bias),
        "up_proj": _dense(next(keys), H, config.intermediate_size, dtype, config.mlp_bias),
        "down_proj": _dense(next(keys), config.intermediate_size, H, dtype, config.mlp_bias),
    }


# ---------------------------------------------------------------------------
# Greedy decode (the per-token hot loop, reference call stack §3.3)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config", "quant_mode", "attn_mode"))
def prefill(params, config: ModelConfig, tokens, cache: KVCache, *,
            quant_mode="xla", attn_mode="einsum"):
    logits, cache = model_forward(
        params, config, tokens, cache, quant_mode=quant_mode, attn_mode=attn_mode
    )
    return logits[:, -1, :], cache


@partial(jax.jit, static_argnames=("config", "quant_mode"), donate_argnames=("cache",))
def decode_step(params, config: ModelConfig, token, cache: KVCache, *, quant_mode="xla"):
    logits, cache = model_forward(params, config, token, cache, quant_mode=quant_mode)
    return logits[:, -1, :], cache


@partial(jax.jit, static_argnames=("config", "n_tokens", "quant_mode",
                                   "attn_mode"),
         donate_argnames=("cache",))
def greedy_decode_scan(
    params, config: ModelConfig, first_token, cache: KVCache, n_tokens: int,
    *, quant_mode: str = "xla", attn_mode="einsum",
):
    """n_tokens greedy decode steps as ONE compiled lax.scan — a single
    dispatch for the whole generation (the relay/driver-friendly hot loop).
    first_token: [B] int32. Returns (tokens [B, n_tokens], cache).
    attn_mode passes through to model_forward (a callable ablates/overrides
    attention — scripts/bench_decode_accounting.py)."""

    def body(carry, _):
        tok, cache = carry
        logits, cache = model_forward(
            params, config, tok[:, None], cache, quant_mode=quant_mode,
            attn_mode=attn_mode,
        )
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt, cache), tok

    (_, cache), toks = jax.lax.scan(
        body, (first_token, cache), None, length=n_tokens
    )
    return jnp.moveaxis(toks, 0, 1), cache


def greedy_generate(
    params,
    config: ModelConfig,
    prompt_tokens: np.ndarray,  # [B, T]
    max_new_tokens: int,
    *,
    max_len: int | None = None,
    cache_dtype=jnp.bfloat16,
    quant_mode: str = "xla",
    eos_token_id: int | None = None,
) -> np.ndarray:
    B, T = prompt_tokens.shape
    max_len = max_len or T + max_new_tokens
    cache = KVCache.create(config, B, max_len, cache_dtype)
    logits, cache = prefill(
        params, config, jnp.asarray(prompt_tokens, jnp.int32), cache, quant_mode=quant_mode
    )
    out = []
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    for _ in range(max_new_tokens):
        out.append(np.asarray(tok))
        if eos_token_id is not None and bool((np.asarray(tok) == eos_token_id).all()):
            break
        logits, cache = decode_step(
            params, config, tok[:, None], cache, quant_mode=quant_mode
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return np.stack(out, axis=1)
