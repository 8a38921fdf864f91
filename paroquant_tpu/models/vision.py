"""SigLIP vision tower + Gemma3 multimodal projector (VLM support).

The reference serves VLMs by delegating to HF AutoModelForImageTextToText /
mlx-vlm (reference backends/transformers/generator.py:26-34,
mlx/load.py:212-253). Here the vision path is native JAX: a bidirectional
pre-LN ViT (SigLIP; behavioral spec HF modeling_siglip.py) whose patch
embedding is one [P, C*p*p] x [C*p*p, D] matmul (the conv with stride ==
kernel is exactly a patch-flatten matmul — MXU-shaped, no conv primitive),
followed by the Gemma3 projector (patch-grid average pool to
mm_tokens_per_image soft tokens, zero-centered RMSNorm, linear map into the
LM's embedding space; HF Gemma3MultiModalProjector).

Param layout mirrors the HF module tree so checkpoint mapping is mechanical:
  vision: {patch_embed_w [C*p*p, D], patch_embed_b [D], pos_embed [P, D],
           layers: [{ln1_w, ln1_b, q/k/v/out (DenseLinear, bias),
                     ln2_w, ln2_b, fc1, fc2}],
           post_ln_w, post_ln_b}
  projector: {mm_input_projection [Dv, Dt], mm_soft_emb_norm [Dv]}
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2

    @classmethod
    def from_hf_dict(cls, d: dict[str, Any]) -> "VisionConfig":
        return cls(**{
            k: d[k] for k in (
                "hidden_size", "intermediate_size", "num_hidden_layers",
                "num_attention_heads", "image_size", "patch_size",
                "num_channels", "layer_norm_eps",
            ) if k in d
        })


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """[B, C, H, W] -> [B, nH*nW, C*p*p] with conv-weight-compatible channel
    ordering (C major, then the p x p window, matching a flattened
    nn.Conv2d weight [D, C, p, p])."""
    B, C, H, W = pixel_values.shape
    nH, nW = H // patch, W // patch
    x = pixel_values.reshape(B, C, nH, patch, nW, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, nH, nW, C, p, p]
    return x.reshape(B, nH * nW, C * patch * patch)


def _vit_attention(p: dict[str, Any], x: jax.Array, n_heads: int) -> jax.Array:
    from .decoder import apply_linear

    B, T, D = x.shape
    hd = D // n_heads
    q = apply_linear(p["q_proj"], x).reshape(B, T, n_heads, hd)
    k = apply_linear(p["k_proj"], x).reshape(B, T, n_heads, hd)
    v = apply_linear(p["v_proj"], x).reshape(B, T, n_heads, hd)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * (hd ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd", probs, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(B, T, D).astype(x.dtype)
    return apply_linear(p["out_proj"], out)


def siglip_encode(
    params: dict[str, Any], cfg: VisionConfig, pixel_values: jax.Array
) -> jax.Array:
    """pixel_values [B, C, H, W] -> patch features [B, num_patches, D]."""
    from .decoder import apply_linear

    patches = patchify(pixel_values, cfg.patch_size)
    x = (
        jnp.dot(
            patches.astype(jnp.float32),
            params["patch_embed_w"].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        + params["patch_embed_b"].astype(jnp.float32)
    ).astype(pixel_values.dtype)
    x = x + params["pos_embed"].astype(x.dtype)[None]
    eps = cfg.layer_norm_eps
    for lp in params["layers"]:
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
        x = x + _vit_attention(lp, h, cfg.num_attention_heads)
        h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
        h = apply_linear(lp["fc1"], h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
        x = x + apply_linear(lp["fc2"], h)
    return layer_norm(x, params["post_ln_w"], params["post_ln_b"], eps)


def gemma3_project(
    proj: dict[str, Any],
    vision_out: jax.Array,  # [B, P, Dv]
    cfg: VisionConfig,
    mm_tokens_per_image: int,
    rms_eps: float,
) -> jax.Array:
    """Average-pool the patch grid to mm_tokens_per_image soft tokens, then
    zero-centered RMSNorm + linear projection (HF Gemma3MultiModalProjector)."""
    B, P, Dv = vision_out.shape
    pps = cfg.patches_per_side
    tps = int(mm_tokens_per_image ** 0.5)
    kernel = pps // tps
    grid = vision_out.reshape(B, pps, pps, Dv).astype(jnp.float32)
    pooled = grid.reshape(B, tps, kernel, tps, kernel, Dv).mean(axis=(2, 4))
    pooled = pooled.reshape(B, tps * tps, Dv)
    # Gemma3RMSNorm: zero-centered weights (1 + w)
    var = jnp.mean(pooled * pooled, axis=-1, keepdims=True)
    normed = pooled * jax.lax.rsqrt(var + rms_eps)
    normed = normed * (1.0 + proj["mm_soft_emb_norm"].astype(jnp.float32))
    return jnp.dot(
        normed, proj["mm_input_projection"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(vision_out.dtype)


def merge_image_embeddings(
    text_embeds: jax.Array,  # [B, T, H] (image positions hold placeholder rows)
    image_embeds: jax.Array,  # [N_img, mm_tokens, H] (flattened over batch)
    image_token_mask: jax.Array,  # bool [B, T]
) -> jax.Array:
    """Scatter soft image tokens into the text embedding sequence at the
    image-token positions (row-major over the batch, like HF masked_scatter)."""
    B, T, H = text_embeds.shape
    flat = text_embeds.reshape(B * T, H)
    mask = image_token_mask.reshape(B * T)
    # destination index for each flattened image token: positions of mask=True
    # in order; implement as cumsum-gather (static shapes)
    src = image_embeds.reshape(-1, H)
    order = jnp.cumsum(mask.astype(jnp.int32)) - 1  # index into src per pos
    gathered = jnp.take(src, jnp.clip(order, 0, src.shape[0] - 1), axis=0)
    out = jnp.where(mask[:, None], gathered.astype(flat.dtype), flat)
    return out.reshape(B, T, H)


def image_group_ids(image_token_mask: jax.Array) -> jax.Array:
    """[B, T] bool -> consecutive-image-block ids (-1 for text), matching the
    HF token_type_ids grouping for bidirectional image attention."""
    m = image_token_mask.astype(jnp.int32)
    starts = (m == 1) & (jnp.pad(m, ((0, 0), (1, 0)))[:, :-1] == 0)
    gid = jnp.cumsum(starts.astype(jnp.int32), axis=1) - 1
    return jnp.where(image_token_mask, gid, -1)


def vlm_prefill(
    params: dict[str, Any],
    config,
    tokens: jax.Array,  # [B, T] with image_token_id runs at image positions
    pixel_values: jax.Array,  # [N_img, C, H, W]
    cache=None,
    *,
    quant_mode: str = "xla",
):
    """Image+text prefill: encode images, project to soft tokens, scatter
    into the embedding sequence, run the decoder with bidirectional image
    blocks (HF Gemma3Model.forward semantics). Subsequent decode steps use
    the returned cache through the ordinary text path."""
    from .decoder import model_forward

    vcfg = VisionConfig.from_hf_dict(config.vision)
    feats = siglip_encode(params["vision"], vcfg, pixel_values)
    img_embeds = gemma3_project(
        params["projector"], feats, vcfg, config.mm_tokens_per_image,
        rms_eps=vcfg.layer_norm_eps,
    )  # [N_img, mm_tokens, H]
    mask = tokens == config.image_token_id
    safe_tokens = jnp.where(mask, 0, tokens)
    x = jnp.take(params["embed_tokens"], safe_tokens, axis=0)
    if config.gemma_norm:
        x = x * jnp.asarray(np.sqrt(config.hidden_size), x.dtype)
    merged = merge_image_embeddings(x, img_embeds, mask)
    groups = image_group_ids(mask)
    return model_forward(
        params, config, tokens, cache, quant_mode=quant_mode,
        input_embeds=merged, bidir_groups=groups,
    )


@partial(jax.jit, static_argnames=("config", "quant_mode"))
def vlm_prefill_step(params, config, tokens, pixel_values, cache, *,
                     quant_mode: str = "xla"):
    """Jitted image+text prefill returning (last-token logits [B, V], cache)
    — the VLM twin of decoder.prefill for the serving paths."""
    logits, cache = vlm_prefill(
        params, config, tokens, pixel_values, cache, quant_mode=quant_mode
    )
    return logits[:, -1, :], cache
