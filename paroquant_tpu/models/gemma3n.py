"""gemma-4-class (HF Gemma3n) decoder: AltUp, laurel, per-layer embeddings,
shared-KV tail, per-layer MLP widths with activation sparsity.

The reference treats this family through the HF model zoo and only adapts its
calibration plumbing to it — moving the per-layer-embedding modules to the
device (optim/util.py:83-103) and retaining `shared_kv_states` kwargs through
the layer Catcher (optim/util.py:17, 217-279). Here the family is implemented
natively so it can run quantized through the fused TPU kernels like every
other family. Ground truth for the math: transformers
models/gemma3n/modeling_gemma3n.py (Gemma3nTextModel et al.); parity-tested
against it in tests/test_gemma3n.py.

TPU notes: the AltUp coefficient matmuls are [*, A, A] with A=4 — far below
MXU tile size, so they are expressed as einsums and left to the VPU; the
heavy compute stays in the q/k/v/o and MLP projections, which accept
QuantizedLinear / MergedQuantizedLinear pytrees like the shared decoder.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .decoder import (
    DenseLinear,
    KVCache,
    _act,
    apply_linear,
    apply_rope,
    attention_kvmajor,
    rms_norm,
    rope_tables,
)
from .decoder import merged_forward_parts


def _rms_noscale(x: jax.Array, eps: float) -> jax.Array:
    """Gemma3nRMSNorm(with_scale=False): used on v before caching."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """Gemma3nRMSNorm: plain weight (not the Gemma (1+w) convention)."""
    return rms_norm(x, w, eps, gemma_style=False)


def _magnitude_match(proj: jax.Array, target: jax.Array) -> jax.Array:
    """Scale proj rows to target's RMS magnitude (Gemma3nTextModel altup
    expand/unembed: sqrt(max(mean(proj^2), 1e-5)) denominator)."""
    pf = proj.astype(jnp.float32)
    tf = target.astype(jnp.float32)
    target_mag = jnp.sqrt(jnp.mean(tf * tf, axis=-1, keepdims=True))
    new_mag = jnp.sqrt(jnp.maximum(jnp.mean(pf * pf, axis=-1, keepdims=True), 1e-5))
    return (pf * target_mag / new_mag).astype(proj.dtype)


# ---------------------------------------------------------------------------
# AltUp (alternating updates; Gemma3nTextAltUp)
# ---------------------------------------------------------------------------


def _altup_modalities(ap: dict[str, Any], x: jax.Array, config: ModelConfig) -> jax.Array:
    """tanh(router(router_norm(x) / H)) in f32 — [B, T, A]."""
    r_in = _norm(x, ap["router_norm"], config.rms_norm_eps)
    r_in = r_in * jnp.asarray(1.0 / config.hidden_size, r_in.dtype)
    routed = apply_linear(ap["modality_router"], r_in)
    return jnp.tanh(routed.astype(jnp.float32)).astype(x.dtype)


def altup_predict(ap: dict[str, Any], hidden: jax.Array, config: ModelConfig) -> jax.Array:
    """hidden [A, B, T, H] -> predictions [A, B, T, H]."""
    A = config.altup_num_inputs
    modal = _altup_modalities(ap, hidden[config.altup_active_idx], config)
    coefs = apply_linear(ap["prediction_coefs"], modal)  # [B, T, A*A]
    coefs = coefs.reshape(*coefs.shape[:-1], A, A)
    # torch permutes (..., -1, -2) before matmul; coefs[b,t,a,j] below is the
    # post-permute layout: out[j] = sum_a hidden[a] * coefs[a, j]
    coefs = jnp.swapaxes(coefs, -1, -2)
    pred = jnp.einsum(
        "abth,btaj->jbth", hidden.astype(jnp.float32), coefs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(hidden.dtype)
    return pred + hidden


def altup_correct(
    ap: dict[str, Any], predictions: jax.Array, activated: jax.Array,
    config: ModelConfig,
) -> jax.Array:
    """predictions [A, B, T, H], activated [B, T, H] -> corrected [A, B, T, H]."""
    modal = _altup_modalities(ap, activated, config)
    innovation = activated - predictions[config.altup_active_idx]  # [B, T, H]
    coefs = apply_linear(ap["correction_coefs"], modal) + 1.0  # [B, T, A]
    coefs = jnp.moveaxis(coefs, -1, 0)[..., None]  # [A, B, T, 1]
    return predictions + innovation[None] * coefs


# ---------------------------------------------------------------------------
# Laurel + MLP
# ---------------------------------------------------------------------------


def laurel_forward(lp: dict[str, Any], x: jax.Array, config: ModelConfig) -> jax.Array:
    h = apply_linear(lp["linear_left"], x)
    h = apply_linear(lp["linear_right"], h)
    return x + _norm(h, lp["post_laurel_norm"], config.rms_norm_eps)


def _gaussian_topk(x: jax.Array, sparsity: float) -> jax.Array:
    """Keep ~(1-sparsity) of activations: relu(x - (mean + std*ppf(sparsity)))
    with population std (Gemma3nTextMLP._gaussian_topk, unbiased=False)."""
    from statistics import NormalDist

    mult = NormalDist().inv_cdf(sparsity)  # pure-Python: jit-trace safe
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True))
    cutoff = mean + std * jnp.asarray(mult, jnp.float32)
    return jax.nn.relu(xf - cutoff).astype(x.dtype)


def gemma3n_mlp(
    p: dict[str, Any], x: jax.Array, config: ModelConfig, layer_idx: int,
    quant_mode: str,
) -> jax.Array:
    if "gate_up_proj" in p:
        gate, up = merged_forward_parts(p["gate_up_proj"], x, quant_mode)
    else:
        gate = apply_linear(p["gate_proj"], x, quant_mode=quant_mode)
        up = apply_linear(p["up_proj"], x, quant_mode=quant_mode)
    sparsity = config.layer_activation_sparsity(layer_idx)
    if sparsity > 0.0:
        gate = _gaussian_topk(gate, sparsity)
    act_v = _act(gate, config.hidden_act) * up
    return apply_linear(p["down_proj"], act_v, quant_mode=quant_mode)


# ---------------------------------------------------------------------------
# Per-layer inputs
# ---------------------------------------------------------------------------


def per_layer_inputs(
    params: dict[str, Any], config: ModelConfig, tokens: jax.Array,
    inputs_embeds: jax.Array,
) -> jax.Array:
    """[B, T, L, P]: scaled per-layer token embeddings combined with the
    projection of the main embedding (Gemma3nTextModel.get_per_layer_inputs +
    project_per_layer_inputs)."""
    L, P = config.num_hidden_layers, config.hidden_size_per_layer_input
    # ids outside the per-layer vocab (e.g. multimodal soft tokens) use row 0
    # (Gemma3nModel.forward per_layer_inputs_mask)
    pl_tokens = jnp.where(tokens < config.vocab_size_per_layer_input, tokens, 0)
    ple = jnp.take(params["embed_tokens_per_layer"], pl_tokens, axis=0)
    ple = ple * jnp.asarray(np.sqrt(P), ple.dtype)
    ple = ple.reshape(*tokens.shape, L, P)
    proj = apply_linear(params["per_layer_model_projection"], inputs_embeds)
    proj = proj * jnp.asarray(config.hidden_size ** -0.5, proj.dtype)
    proj = proj.reshape(*inputs_embeds.shape[:-1], L, P)
    proj = _norm(proj, params["per_layer_projection_norm"], config.rms_norm_eps)
    return (proj + ple) * jnp.asarray(2.0 ** -0.5, proj.dtype)


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------


def gemma3n_qkv(
    p: dict[str, Any],
    h: jax.Array,  # [B, T, H]
    config: ModelConfig,
    cos: jax.Array,
    sin: jax.Array,
    quant_mode: str,
    *,
    need_kv: bool = True,
) -> tuple[jax.Array, jax.Array | None, jax.Array | None]:
    """q/k/v projections with the gemma3n norms: q_norm->rope, k_norm->rope,
    no-scale RMS on v. Returns (q [B,T,Hq,D], k [B,T,Hkv,D]|None, v|None)."""
    B, T, _ = h.shape
    Hq, Hkv, D = config.num_attention_heads, config.num_key_value_heads, config.head_dim
    eps = config.rms_norm_eps
    if "qkv_proj" in p:  # merged projections (one fused kernel launch)
        q, k_raw, v_raw = merged_forward_parts(p["qkv_proj"], h, quant_mode)
        q = q.reshape(B, T, Hq, D)
    else:
        q = apply_linear(p["q_proj"], h, quant_mode=quant_mode).reshape(B, T, Hq, D)
        k_raw = v_raw = None
    q = _norm(q, p["q_norm"], eps)
    q = apply_rope(q, cos, sin)
    if not need_kv:
        return q, None, None
    if k_raw is None:
        k_raw = apply_linear(p["k_proj"], h, quant_mode=quant_mode)
        v_raw = apply_linear(p["v_proj"], h, quant_mode=quant_mode)
    k = _norm(k_raw.reshape(B, T, Hkv, D), p["k_norm"], eps)
    k = apply_rope(k, cos, sin)
    v = _rms_noscale(v_raw.reshape(B, T, Hkv, D), eps)  # v_norm has no scale
    return q, k, v


def gemma3n_attention(
    p: dict[str, Any],
    h: jax.Array,  # [B, T, H] (normed active prediction)
    config: ModelConfig,
    layer_idx: int,
    cos: jax.Array,
    sin: jax.Array,
    q_positions: jax.Array,
    kv_cache_layer: tuple[jax.Array, jax.Array] | None,
    cache_offset: jax.Array,
    shared_kv: tuple[jax.Array, jax.Array] | None,
    quant_mode: str,
    attn_mode: str = "einsum",
) -> tuple[jax.Array, tuple[jax.Array, jax.Array] | None, tuple[jax.Array, jax.Array] | None]:
    """Returns (attn out [B,T,Hq*D], updated cache rows, this layer's (k, v)
    full-sequence tensors for shared-KV consumers when cache is None)."""
    B, T, _ = h.shape
    Hq, Hkv, D = config.num_attention_heads, config.num_key_value_heads, config.head_dim

    is_shared = shared_kv is not None
    q, k, v = gemma3n_qkv(p, h, config, cos, sin, quant_mode, need_kv=not is_shared)
    if is_shared:
        # full head-major rows of the source layer's cache ([B, Hkv, S, D])
        k_all, v_all = shared_kv
        new_cache = None
        own_kv = None
    else:
        kh = jnp.swapaxes(k, 1, 2)  # head-major, like decoder.layer_forward
        vh = jnp.swapaxes(v, 1, 2)
        if kv_cache_layer is not None:
            ck, cv = kv_cache_layer  # [B, Hkv, S, D]
            ck = jax.lax.dynamic_update_slice(
                ck, kh.astype(ck.dtype), (0, 0, cache_offset, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vh.astype(cv.dtype), (0, 0, cache_offset, 0))
            k_all, v_all = ck, cv
            new_cache = (ck, cv)
            own_kv = (ck, cv)
        else:
            k_all, v_all = kh, vh
            new_cache = None
            own_kv = (kh, vh)

    valid = cache_offset + T
    S_kv = k_all.shape[2]
    block_k = next((b for b in (256, 128) if S_kv % b == 0),
                   S_kv if S_kv <= 256 else None)
    flash_ok = (
        attn_mode == "flash"
        and T >= 128 and T % 128 == 0
        and block_k is not None
    )
    if flash_ok:
        # Pallas flash kernel (traced q_offset, like decoder.layer_forward)
        from ..kernels.attention import flash_attention

        out = flash_attention(
            jnp.swapaxes(q, 1, 2), k_all, v_all,
            jnp.broadcast_to(valid.reshape(-1), (B,)),
            scale=config.attn_scale,  # 1.0
            q_offset=jnp.asarray(cache_offset, jnp.int32),
            sliding_window=config.layer_sliding_window(layer_idx),
            block_q=min(256, T), block_k=block_k,
        )
        out = jnp.swapaxes(out, 1, 2)
    else:
        out = attention_kvmajor(
            q, k_all, v_all, q_positions, valid,
            scale=config.attn_scale,  # 1.0
            sliding_window=config.layer_sliding_window(layer_idx),
        )
    out = out.reshape(B, T, Hq * D)
    out = apply_linear(p["o_proj"], out, quant_mode=quant_mode)
    return out, new_cache, own_kv


def gemma3n_layer_core(
    p: dict[str, Any],
    hidden: jax.Array,  # [A, B, T, H] altup stack
    per_layer_input: jax.Array,  # [B, T, P]
    config: ModelConfig,
    layer_idx: int,
    attn_fn,  # callable(active_normed [B,T,H]) -> o_proj output [B,T,H]
    quant_mode: str,
) -> jax.Array:
    """Layer math shared by the contiguous and paged decode paths; the
    attention inner (contiguous cache vs paged pool) is injected."""
    eps = config.rms_norm_eps
    predictions = altup_predict(p["altup"], hidden, config)
    active = predictions[config.altup_active_idx]
    active_normed = _norm(active, p["input_layernorm"], eps)
    laurel_out = laurel_forward(p["laurel"], active_normed, config)

    attn = attn_fn(active_normed)
    attn = _norm(attn, p["post_attention_layernorm"], eps)
    attn_gated = active + attn
    attn_laurel = (attn_gated + laurel_out) * jnp.asarray(2.0 ** -0.5, attn.dtype)

    h2 = _norm(attn_laurel, p["pre_feedforward_layernorm"], eps)
    ffw = gemma3n_mlp(p["mlp"], h2, config, layer_idx, quant_mode)
    ffw = _norm(ffw, p["post_feedforward_layernorm"], eps)
    activated = attn_laurel + ffw

    corrected = altup_correct(p["altup"], predictions, activated, config)
    first = corrected[config.altup_active_idx]
    if config.altup_correct_scale:
        first = (
            first.astype(jnp.float32)
            * p["altup"]["correct_output_scale"].astype(jnp.float32)
        ).astype(first.dtype)
    gate = apply_linear(p["per_layer_input_gate"], first)
    gate = _act(gate, config.hidden_act)
    gated = gate * per_layer_input
    proj = apply_linear(p["per_layer_projection"], gated)
    proj = _norm(proj, p["post_per_layer_input_norm"], eps)
    corrected = corrected.at[1:].add(proj.astype(corrected.dtype))
    return corrected


def gemma3n_layer(
    p: dict[str, Any],
    hidden: jax.Array,  # [A, B, T, H] altup stack
    per_layer_input: jax.Array,  # [B, T, P]
    config: ModelConfig,
    layer_idx: int,
    cos: jax.Array,
    sin: jax.Array,
    q_positions: jax.Array,
    kv_cache_layer: tuple[jax.Array, jax.Array] | None,
    cache_offset: jax.Array,
    shared_kv: tuple[jax.Array, jax.Array] | None,
    quant_mode: str,
    attn_mode: str = "einsum",
) -> tuple[jax.Array, tuple | None, tuple | None]:
    out: dict[str, Any] = {"cache": None, "own_kv": None}

    def attn_fn(active_normed: jax.Array) -> jax.Array:
        attn, out["cache"], out["own_kv"] = gemma3n_attention(
            p, active_normed, config, layer_idx, cos, sin, q_positions,
            kv_cache_layer, cache_offset, shared_kv, quant_mode, attn_mode,
        )
        return attn

    corrected = gemma3n_layer_core(
        p, hidden, per_layer_input, config, layer_idx, attn_fn, quant_mode
    )
    return corrected, out["cache"], out["own_kv"]


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def gemma3n_forward(
    params: dict[str, Any],
    config: ModelConfig,
    tokens: jax.Array,  # int32 [B, T]
    cache: KVCache | None = None,
    *,
    quant_mode: str = "xla",
    attn_mode: str = "einsum",
    input_embeds: jax.Array | None = None,
) -> tuple[jax.Array, KVCache | None]:
    """Returns (logits [B, T, V], updated cache).

    Shared-KV layers ALWAYS reuse the source layer's (k, v) — the trained
    semantic (HF activates it whenever a cache is present, which covers
    generate and eval; parity tests run HF with use_cache=True)."""
    B, T = tokens.shape
    H = config.hidden_size
    x0 = input_embeds
    if x0 is None:
        x0 = jnp.take(params["embed_tokens"], tokens, axis=0)
        x0 = x0 * jnp.asarray(np.sqrt(H), x0.dtype)

    pli = per_layer_inputs(params, config, tokens, x0)  # [B, T, L, P]

    offset = cache.length if cache is not None else jnp.zeros((), jnp.int32)
    positions = offset + jnp.arange(T, dtype=jnp.int32)[None, :]
    positions = jnp.broadcast_to(positions, (B, T))
    rope_global = rope_tables(positions, config.head_dim, config.rope_theta)
    rope_local = rope_tables(
        positions, config.head_dim, config.rope_local_theta or config.rope_theta
    )

    # altup expand: magnitude-matched projections of the embedding
    stack = [x0]
    for proj in params["altup_projections"]:
        stack.append(_magnitude_match(apply_linear(proj, x0), x0))
    hidden = jnp.stack(stack)  # [A, B, T, H]

    first_shared = config.first_kv_shared_layer
    new_k, new_v = [], []
    own_kvs: dict[int, tuple[jax.Array, jax.Array]] = {}
    for i, lp in enumerate(params["layers"]):
        sliding = config.layer_sliding_window(i) is not None
        cos, sin = rope_local if sliding else rope_global
        src = config.kv_share_source(i)
        if src is not None:
            shared_kv = own_kvs[src]
            layer_cache = None
        else:
            shared_kv = None
            layer_cache = None if cache is None else (cache.k[i], cache.v[i])
        hidden, updated, own_kv = gemma3n_layer(
            lp, hidden, pli[:, :, i], config, i, cos, sin, positions,
            layer_cache, offset, shared_kv, quant_mode, attn_mode,
        )
        if updated is not None:
            new_k.append(updated[0])
            new_v.append(updated[1])
        if own_kv is not None and i < first_shared:
            own_kvs[i] = own_kv

    # altup unembed: magnitude-matched per-input projections, then mean
    outs = [hidden[0]]
    for j, proj in enumerate(params["altup_unembed_projections"]):
        outs.append(_magnitude_match(apply_linear(proj, hidden[j + 1]), hidden[0]))
    x = jnp.mean(jnp.stack(outs), axis=0)
    x = _norm(x, params["norm"], config.rms_norm_eps)

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

    if cache is not None:
        cache = KVCache(tuple(new_k), tuple(new_v), offset + T)
    return logits, cache


# ---------------------------------------------------------------------------
# Random init (tests / benchmarks)
# ---------------------------------------------------------------------------


def init_gemma3n_params(
    config: ModelConfig, key: jax.Array, dtype=jnp.bfloat16
) -> dict[str, Any]:
    from .decoder import _dense

    H, D, P = config.hidden_size, config.head_dim, config.hidden_size_per_layer_input
    Hq, Hkv = config.num_attention_heads, config.num_key_value_heads
    A, L = config.altup_num_inputs, config.num_hidden_layers
    keys = iter(jax.random.split(key, 16 + 24 * L))
    params: dict[str, Any] = {
        "embed_tokens": (
            jax.random.normal(next(keys), (config.vocab_size, H), jnp.float32) * 0.02
        ).astype(dtype),
        "embed_tokens_per_layer": (
            jax.random.normal(
                next(keys), (config.vocab_size_per_layer_input, L * P), jnp.float32
            ) * 0.02
        ).astype(dtype),
        "per_layer_model_projection": _dense(next(keys), H, L * P, dtype),
        "per_layer_projection_norm": jnp.ones((P,), dtype),
        "altup_projections": [_dense(next(keys), H, H, dtype) for _ in range(A - 1)],
        "altup_unembed_projections": [
            _dense(next(keys), H, H, dtype) for _ in range(A - 1)
        ],
        "norm": jnp.ones((H,), dtype),
        "layers": [],
    }
    for i in range(L):
        inter = config.layer_intermediate_size(i)
        lp = {
            "input_layernorm": jnp.ones((H,), dtype),
            "post_attention_layernorm": jnp.ones((H,), dtype),
            "pre_feedforward_layernorm": jnp.ones((H,), dtype),
            "post_feedforward_layernorm": jnp.ones((H,), dtype),
            "q_proj": _dense(next(keys), H, Hq * D, dtype),
            "k_proj": _dense(next(keys), H, Hkv * D, dtype),
            "v_proj": _dense(next(keys), H, Hkv * D, dtype),
            "o_proj": _dense(next(keys), Hq * D, H, dtype),
            "q_norm": jnp.ones((D,), dtype),
            "k_norm": jnp.ones((D,), dtype),
            "mlp": {
                "gate_proj": _dense(next(keys), H, inter, dtype),
                "up_proj": _dense(next(keys), H, inter, dtype),
                "down_proj": _dense(next(keys), inter, H, dtype),
            },
            "altup": {
                "correct_output_scale": jnp.zeros((H,), jnp.float32),
                "correction_coefs": _dense(next(keys), A, A, dtype),
                "prediction_coefs": _dense(next(keys), A, A * A, dtype),
                "modality_router": _dense(next(keys), H, A, dtype),
                "router_norm": jnp.ones((H,), dtype),
            },
            "laurel": {
                "linear_left": _dense(next(keys), H, config.laurel_rank, dtype),
                "linear_right": _dense(next(keys), config.laurel_rank, H, dtype),
                "post_laurel_norm": jnp.ones((H,), dtype),
            },
            "per_layer_input_gate": _dense(next(keys), H, P, dtype),
            "per_layer_projection": _dense(next(keys), P, H, dtype),
            "post_per_layer_input_norm": jnp.ones((H,), dtype),
        }
        params["layers"].append(lp)
    return params
