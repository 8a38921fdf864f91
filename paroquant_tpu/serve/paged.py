"""Paged KV cache + paged decode step (pure JAX, static shapes).

The reference delegates paged attention to vLLM (SURVEY.md §2.6 row SP:
"32k generation handled by vLLM paged attention"). TPU-native version:

- a global page pool  k/v [L, P, page_size, Hkv, D]  (donated through the
  jitted decode step -> in-place updates, no copies)
- per-slot page tables [max_batch, max_pages] int32 + seq lens [max_batch]
- decode = ONE jitted step over every active slot: new k/v are scattered
  into pages by (page, offset) advanced indexing; attention gathers each
  slot's pages and masks by its length. All shapes static: batch slots,
  page count and pages-per-slot are engine constants, so the step compiles
  once and serves any request mix.

Prefill runs through the standard contiguous path (bucketed lengths) and
the resulting KV is scattered into freshly allocated pages.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.decoder import (
    apply_linear,
    lm_head_logits,
    apply_rope,
    mlp_forward,
    moe_forward,
    qkv_forward,
    rms_norm,
    rope_tables_per_layer,
)


class PagedKVCache(NamedTuple):
    """Paged pool for attention layers + (hybrid models) per-slot linear
    states. k/v [Lf, P, ps, Hkv, D]; conv [Ll, B, conv_dim, Kc-1] and
    rec [Ll, B, Hv, dk, dv] are slot-indexed (qwen3_next delta-net).

    With kv_quant="int8" the pools hold symmetric per-(token, head) int8
    values and k_scale/v_scale [Lf, P, Hkv, ps] f32 carry the dequant scales
    (the vLLM --kv-cache-dtype counterpart; ~1.9x less attention HBM traffic
    at D=128 and ~2x the KV capacity per chip). Scales keep the page size on
    the lane axis so the Pallas kernels read them as [1, ps] row vectors."""

    k: jax.Array
    v: jax.Array
    conv: Any = None
    rec: Any = None
    k_scale: Any = None
    v_scale: Any = None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(
        cls, config: ModelConfig, num_pages: int, page_size: int = 128,
        dtype=jnp.bfloat16, batch: int | None = None,
        kv_quant: str | None = None,
    ) -> "PagedKVCache":
        shape = (
            config.num_full_attn_layers, num_pages, page_size,
            config.num_key_value_heads, config.head_dim,
        )
        conv = rec = None
        if config.num_linear_layers:
            assert batch is not None, "hybrid paged cache needs max_batch"
            Ll = config.num_linear_layers
            conv = jnp.zeros(
                (Ll, batch, config.linear_conv_dim,
                 config.linear_conv_kernel_dim - 1), dtype,
            )
            rec = jnp.zeros(
                (Ll, batch, config.linear_num_value_heads,
                 config.linear_key_head_dim, config.linear_value_head_dim),
                jnp.float32,
            )
        ks = vs = None
        if kv_quant is not None:
            if kv_quant != "int8":
                raise ValueError(f"unsupported kv_quant {kv_quant!r}")
            dtype = jnp.int8
            sshape = (shape[0], num_pages, config.num_key_value_heads, page_size)
            ks = jnp.zeros(sshape, jnp.float32)
            vs = jnp.zeros(sshape, jnp.float32)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), conv, rec,
                   ks, vs)


def kv_quantize(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization over the trailing (head_dim) axis:
    returns (q int8 [..., D], scale f32 [...])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _dequant_pages(pages: jax.Array, scales: jax.Array) -> jax.Array:
    """pages [..., ps, Hkv, D] int8 + scales [..., Hkv, ps] -> f32 pages."""
    return pages.astype(jnp.float32) * jnp.swapaxes(scales, -1, -2)[..., None]


def _headshard_attn(kernel, mesh, q, k_pool, v_pool, page_table, lens, *,
                    k_scales=None, v_scales=None, axis="model", **kw):
    """Launch a paged Pallas attention kernel per device on its head shard.

    GSPMD has no pallas partitioning rule, so under a TP mesh the kernel
    would run replicated (operands all-gathered). Attention is embarrassingly
    parallel over heads — q heads and kv pools shard on the same contiguous
    head blocks GQA grouping uses (q head h reads kv head h//group; shard d's
    q block [d*Hq/n, ...) maps exactly onto its kv block [d*Hkv/n, ...)).
    No collectives. Falls back to a direct (replicated) call when the head
    counts don't divide the axis."""
    from jax.sharding import PartitionSpec as P

    kernel = functools.partial(
        kernel, interpret=jax.default_backend() == "cpu", **kw)
    Hq, Hkv = q.shape[-2], k_pool.shape[-2]
    n = 1 if mesh is None else mesh.shape[axis]
    if n == 1 or Hq % n or Hkv % n:
        return kernel(q, k_pool, v_pool, page_table, lens,
                      k_scales=k_scales, v_scales=v_scales)
    qs = P(*(None,) * (q.ndim - 2), axis, None)
    pool = P(None, None, axis, None)
    sc = None if k_scales is None else P(None, axis, None)

    def local(q, kp, vp, table, lens, ks, vs):
        return kernel(q, kp, vp, table, lens, k_scales=ks, v_scales=vs)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(qs, pool, pool, P(None, None), P(None), sc, sc),
        out_specs=qs, check_vma=False,
    )(q, k_pool, v_pool, page_table, lens, k_scales, v_scales)


def paged_attention(
    q: jax.Array,  # [B, Hq, D] one query token per slot
    k_pages: jax.Array,  # [B, maxP, ps, Hkv, D] gathered pages
    v_pages: jax.Array,
    seq_lens: jax.Array,  # [B] int32, lengths INCLUDING current token
    *,
    scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
) -> jax.Array:
    B, Hq, D = q.shape
    _, maxP, ps, Hkv, _ = k_pages.shape
    S = maxP * ps
    k = k_pages.reshape(B, S, Hkv, D)
    v = v_pages.reshape(B, S, Hkv, D)
    group = Hq // Hkv
    qf = q.reshape(B, Hkv, group, D).astype(jnp.float32)
    scores = jnp.einsum("bhgd,bshd->bhgs", qf, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    if logit_softcap:
        # Gemma-2-class attention softcapping, applied before masking like the
        # contiguous path (models/decoder.py attention)
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, :]  # [1, S]
    mask = kv_pos < seq_lens[:, None]
    if sliding_window is not None:
        mask &= kv_pos > seq_lens[:, None] - 1 - sliding_window
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Hq, D)


def _gemma3n_paged_decode(
    params: dict[str, Any],
    config: ModelConfig,
    tokens: jax.Array,  # [B] int32
    seq_lens: jax.Array,  # [B] int32 length BEFORE this token
    page_table: jax.Array,  # [B, maxP] int32
    cache: PagedKVCache,
    *,
    quant_mode: str,
    attn_mode: str,
    attn_mesh=None,
) -> tuple[jax.Array, PagedKVCache]:
    """gemma-4-class paged decode step: AltUp stack + laurel + per-layer
    inputs over the paged KV pool. Pool rows cover only the first
    `first_kv_shared_layer` layers; shared-KV tail layers attend over their
    source layer's pages (already updated with the current token this step,
    since the source runs earlier in the layer loop). Layer math is
    single-sourced from models/gemma3n.gemma3n_layer_core."""
    from ..models.gemma3n import (
        _magnitude_match,
        _norm,
        gemma3n_layer_core,
        gemma3n_qkv,
        per_layer_inputs,
    )
    from ..models.decoder import rope_tables

    B = tokens.shape[0]
    ps = cache.page_size
    H = config.hidden_size

    x0 = jnp.take(params["embed_tokens"], tokens, axis=0)[:, None, :]  # [B,1,H]
    x0 = x0 * jnp.asarray(np.sqrt(H), x0.dtype)
    pli = per_layer_inputs(params, config, tokens[:, None], x0)  # [B,1,L,P]

    positions = seq_lens[:, None]  # [B, 1] 0-based position of current token
    rope_global = rope_tables(positions, config.head_dim, config.rope_theta)
    rope_local = rope_tables(
        positions, config.head_dim, config.rope_local_theta or config.rope_theta
    )
    page_idx = jnp.take_along_axis(
        page_table, (seq_lens // ps)[:, None], axis=1
    )[:, 0]
    offset = seq_lens % ps

    stack = [x0]
    from ..models.decoder import apply_linear as _apply

    for proj in params["altup_projections"]:
        stack.append(_magnitude_match(_apply(proj, x0), x0))
    hidden = jnp.stack(stack)  # [A, B, 1, H]

    new_k, new_v = cache.k, cache.v
    for i, lp in enumerate(params["layers"]):
        sliding = config.layer_sliding_window(i)
        cos, sin = rope_local if sliding is not None else rope_global
        src = config.kv_share_source(i)

        def attn_fn(h, i=i, lp=lp, cos=cos, sin=sin, src=src, sliding=sliding):
            nonlocal new_k, new_v
            q, k, v = gemma3n_qkv(
                lp, h, config, cos, sin, quant_mode, need_kv=src is None
            )
            q = q[:, 0]  # [B, Hq, D]
            if src is None:
                new_k = new_k.at[i, page_idx, offset].set(k[:, 0].astype(new_k.dtype))
                new_v = new_v.at[i, page_idx, offset].set(v[:, 0].astype(new_v.dtype))
                row = i
            else:
                row = src
            if attn_mode == "kernel":
                from ..kernels.attention import paged_decode_attention

                attn = _headshard_attn(
                    paged_decode_attention, attn_mesh,
                    q, new_k[row], new_v[row], page_table, seq_lens + 1,
                    scale=config.attn_scale, sliding_window=sliding,
                    logit_softcap=None,
                )
            else:
                attn = paged_attention(
                    q, new_k[row][page_table], new_v[row][page_table],
                    seq_lens + 1, scale=config.attn_scale, sliding_window=sliding,
                )
            attn = attn.reshape(B, 1, -1)
            return apply_linear(lp["o_proj"], attn, quant_mode=quant_mode)

        hidden = gemma3n_layer_core(
            lp, hidden, pli[:, :, i], config, i, attn_fn, quant_mode
        )

    outs = [hidden[0]]
    for j, proj in enumerate(params["altup_unembed_projections"]):
        outs.append(_magnitude_match(_apply(proj, hidden[j + 1]), hidden[0]))
    x = jnp.mean(jnp.stack(outs), axis=0)
    x = _norm(x, params["norm"], config.rms_norm_eps)[:, 0]  # [B, H]

    logits = lm_head_logits(params, config, x, quant_mode)
    return logits, cache._replace(k=new_k, v=new_v)


def _paged_decode_step_impl(
    params: dict[str, Any],
    config: ModelConfig,
    tokens: jax.Array,  # [B] int32 current token per slot
    seq_lens: jax.Array,  # [B] int32 length BEFORE this token
    page_table: jax.Array,  # [B, maxP] int32
    cache: PagedKVCache,
    *,
    quant_mode: str = "xla",
    attn_mode: str = "einsum",
    attn_mesh=None,  # TP mesh: paged Pallas attention launches per head shard
) -> tuple[jax.Array, PagedKVCache]:
    """One decode step for every slot. Returns (logits [B, V], cache)."""
    if config.is_gemma3n:
        return _gemma3n_paged_decode(
            params, config, tokens, seq_lens, page_table, cache,
            quant_mode=quant_mode, attn_mode=attn_mode, attn_mesh=attn_mesh,
        )
    B = tokens.shape[0]
    ps = cache.page_size
    Hq, Hkv, D = config.num_attention_heads, config.num_key_value_heads, config.head_dim

    x = jnp.take(params["embed_tokens"], tokens, axis=0)  # [B, H]
    if config.gemma_norm:
        x = x * jnp.asarray(np.sqrt(config.hidden_size), x.dtype)
    positions = seq_lens  # 0-based position of the current token
    rope_by_layer = rope_tables_per_layer(positions[:, None], config)

    page_idx = jnp.take_along_axis(
        page_table, (seq_lens // ps)[:, None], axis=1
    )[:, 0]  # [B]
    offset = seq_lens % ps

    new_k, new_v = cache.k, cache.v
    new_ks, new_vs = cache.k_scale, cache.v_scale
    new_conv, new_rec = cache.conv, cache.rec
    x = x[:, None, :]  # [B, 1, H]
    for li, lp in enumerate(params["layers"]):
        if config.layer_is_linear(li):
            # hybrid (qwen3_next): O(1) recurrent delta-net step on the
            # slot-indexed conv window + recurrent state
            from ..models.linear_attn import delta_net_forward

            ll = config.linear_layer_index(li)
            h = rms_norm(x, lp["input_layernorm"], config.rms_norm_eps,
                         config.zero_centered_norm)
            attn_o, conv_st, rec_st = delta_net_forward(
                lp["linear_attn"], h, config, new_conv[ll], new_rec[ll],
                quant_mode,
            )
            new_conv = new_conv.at[ll].set(conv_st.astype(new_conv.dtype))
            new_rec = new_rec.at[ll].set(rec_st)
            x = x + attn_o
            h2 = rms_norm(x, lp["post_attention_layernorm"],
                          config.rms_norm_eps, config.zero_centered_norm)
            if config.layer_is_sparse(li):
                mlp_out = moe_forward(lp["mlp"], h2, config, quant_mode)
            else:
                mlp_out = mlp_forward(lp["mlp"], h2, quant_mode, config.hidden_act)
            x = x + mlp_out
            continue
        kv_li = config.kv_layer_index(li)
        cos, sin = rope_by_layer[li]
        h = rms_norm(x, lp["input_layernorm"], config.rms_norm_eps, config.zero_centered_norm)
        q, k, v, attn_gate = qkv_forward(lp, h, config, quant_mode)
        if config.qk_norm:
            q = rms_norm(q, lp["q_norm"], config.rms_norm_eps, config.zero_centered_norm)
            k = rms_norm(k, lp["k_norm"], config.rms_norm_eps, config.zero_centered_norm)
        q = apply_rope(q, cos, sin)[:, 0]  # [B, Hq, D]
        k = apply_rope(k, cos, sin)[:, 0]  # [B, Hkv, D]
        v = v[:, 0]

        if new_ks is not None:
            kq, ksc = kv_quantize(k)  # [B, Hkv, D] int8, [B, Hkv] f32
            vq, vsc = kv_quantize(v)
            new_k = new_k.at[kv_li, page_idx, offset].set(kq)
            new_v = new_v.at[kv_li, page_idx, offset].set(vq)
            new_ks = new_ks.at[kv_li, page_idx, :, offset].set(ksc)
            new_vs = new_vs.at[kv_li, page_idx, :, offset].set(vsc)
        else:
            new_k = new_k.at[kv_li, page_idx, offset].set(k.astype(new_k.dtype))
            new_v = new_v.at[kv_li, page_idx, offset].set(v.astype(new_v.dtype))

        if attn_mode == "kernel":
            # Pallas paged kernel: reads ONLY the allocated pages (DMA clamps
            # at the last page); step cost scales with cached tokens, not
            # engine max_len. Under a TP mesh the launch is per-device on the
            # head shard (_headshard_attn).
            from ..kernels.attention import paged_decode_attention

            attn = _headshard_attn(
                paged_decode_attention, attn_mesh,
                q, new_k[kv_li], new_v[kv_li], page_table, seq_lens + 1,
                scale=config.attn_scale,
                sliding_window=config.layer_sliding_window(li),
                logit_softcap=config.attn_logit_softcap,
                k_scales=None if new_ks is None else new_ks[kv_li],
                v_scales=None if new_vs is None else new_vs[kv_li],
            )
        else:
            k_pages = new_k[kv_li][page_table]  # [B, maxP, ps, Hkv, D]
            v_pages = new_v[kv_li][page_table]
            if new_ks is not None:
                k_pages = _dequant_pages(k_pages, new_ks[kv_li][page_table])
                v_pages = _dequant_pages(v_pages, new_vs[kv_li][page_table])
            attn = paged_attention(
                q, k_pages, v_pages, seq_lens + 1,
                scale=config.attn_scale,
                sliding_window=config.layer_sliding_window(li),
                logit_softcap=config.attn_logit_softcap,
            )
        attn = attn.reshape(B, 1, Hq * D)
        if attn_gate is not None:
            attn = (
                attn.astype(jnp.float32) * jax.nn.sigmoid(attn_gate.astype(jnp.float32))
            ).astype(attn.dtype)
        attn = apply_linear(lp["o_proj"], attn, quant_mode=quant_mode)
        if config.post_norms:
            attn = rms_norm(attn, lp["post_attention_layernorm"], config.rms_norm_eps, config.zero_centered_norm)
            x = x + attn
            h2 = rms_norm(x, lp["pre_feedforward_layernorm"], config.rms_norm_eps, config.zero_centered_norm)
        else:
            x = x + attn
            h2 = rms_norm(x, lp["post_attention_layernorm"], config.rms_norm_eps, config.zero_centered_norm)
        if config.layer_is_sparse(li):
            mlp_out = moe_forward(lp["mlp"], h2, config, quant_mode)
        else:
            mlp_out = mlp_forward(lp["mlp"], h2, quant_mode, config.hidden_act)
        if config.post_norms:
            mlp_out = rms_norm(mlp_out, lp["post_feedforward_layernorm"], config.rms_norm_eps, config.zero_centered_norm)
        x = x + mlp_out

    x = rms_norm(x[:, 0], params["norm"], config.rms_norm_eps, config.zero_centered_norm)
    logits = lm_head_logits(params, config, x, quant_mode)
    return logits, PagedKVCache(new_k, new_v, new_conv, new_rec, new_ks, new_vs)


# Donation aliases the page pool through the step (no copy of the KV pool per
# token) — essential on TPU. On the CPU backend, donation + in-step
# scatter/gather aliasing produced corrupted cached-executable runs (observed
# with jax 0.9: first call correct, subsequent calls wrong), so CPU uses the
# non-donating compilation.
_paged_decode_step_donate = partial(
    jax.jit, static_argnames=("config", "quant_mode", "attn_mode", "attn_mesh"),
    donate_argnames=("cache",),
)(_paged_decode_step_impl)
_paged_decode_step_nodonate = partial(
    jax.jit, static_argnames=("config", "quant_mode", "attn_mode", "attn_mesh")
)(_paged_decode_step_impl)


def paged_decode_step(params, config, tokens, seq_lens, page_table, cache, *,
                      quant_mode="xla", attn_mode=None, attn_mesh=None):
    on_cpu = jax.devices()[0].platform in ("cpu",)
    if attn_mode is None:
        # kernel path on real TPUs; einsum reference on the CPU backend
        attn_mode = "einsum" if on_cpu else "kernel"
    fn = _paged_decode_step_nodonate if on_cpu else _paged_decode_step_donate
    return fn(params, config, tokens, seq_lens, page_table, cache,
              quant_mode=quant_mode, attn_mode=attn_mode, attn_mesh=attn_mesh)


def paged_window_attention(
    q: jax.Array,  # [B, W, Hq, D] a window of query tokens per slot
    k_pages: jax.Array,  # [B, maxP, ps, Hkv, D] gathered pages
    v_pages: jax.Array,
    q_positions: jax.Array,  # [B, W] absolute 0-based position of each query
    *,
    scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
) -> jax.Array:
    """paged_attention generalized to W query tokens per slot (speculative
    verify windows). Causal by absolute position: query at position p attends
    kv rows <= p, which covers both the already-cached prefix and the
    window's own freshly written rows."""
    B, W, Hq, D = q.shape
    _, maxP, ps, Hkv, _ = k_pages.shape
    S = maxP * ps
    k = k_pages.reshape(B, S, Hkv, D)
    v = v_pages.reshape(B, S, Hkv, D)
    group = Hq // Hkv
    qf = q.reshape(B, W, Hkv, group, D).astype(jnp.float32)
    scores = jnp.einsum("bwhgd,bshd->bwhgs", qf, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None, None, :]  # [1, 1, S]
    mask = kv_pos <= q_positions[:, :, None]
    if sliding_window is not None:
        mask &= kv_pos > q_positions[:, :, None] - sliding_window
    scores = jnp.where(mask[:, :, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bwhgs,bshd->bwhgd", probs, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, W, Hq, D)


def _paged_verify_step_impl(
    params: dict[str, Any],
    config: ModelConfig,
    windows: jax.Array,  # [B, W] int32: current token + W-1 drafted tokens
    seq_lens: jax.Array,  # [B] int32 length BEFORE the window
    page_table: jax.Array,  # [B, maxP] int32
    cache: PagedKVCache,
    trash_page: jax.Array,  # () int32: overrun-write redirect target
    *,
    quant_mode: str = "xla",
    attn_mode: str = "einsum",
    attn_mesh=None,  # TP mesh: paged Pallas attention launches per head shard
) -> tuple[jax.Array, jax.Array, PagedKVCache]:
    """Speculative verify: W tokens per slot through one paged forward —
    the engine counterpart of the Generator's _verify_window (vLLM
    multi-token speculative verification). Greedy-only: returns
    (greedy next-token [B, W], its raw logprob [B, W], cache). Rejected
    drafts' KV rows need no rollback: the slot's next window writes land on
    exactly those rows before they ever enter the attended range (attention
    masks by absolute position). Positions past the page table's range
    redirect to the trash page. Standard-attention families only (hybrids'
    recurrent state can't roll back; the engine guards).

    NOTE: this layer loop deliberately mirrors _paged_decode_step_impl's
    full-attention branch (the W=1 case) rather than sharing code — the
    decode loop is the latency-critical hot path and keeps its own kernel.
    Divergence between the two is pinned by the engine-vs-plain token
    equality tests (test_engine_speculative_matches_plain and the TP
    variant), which run the same configs through BOTH stacks; a change to
    one loop but not the other fails them."""
    B, W = windows.shape
    ps = cache.page_size
    maxP = page_table.shape[1]
    Hq, Hkv, D = config.num_attention_heads, config.num_key_value_heads, config.head_dim

    x = jnp.take(params["embed_tokens"], windows, axis=0)  # [B, W, H]
    if config.gemma_norm:
        x = x * jnp.asarray(np.sqrt(config.hidden_size), x.dtype)
    positions = seq_lens[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
    rope_by_layer = rope_tables_per_layer(positions, config)

    in_range = positions < maxP * ps
    page_idx = jnp.where(
        in_range,
        jnp.take_along_axis(page_table, jnp.minimum(positions // ps, maxP - 1), axis=1),
        trash_page,
    )  # [B, W]
    offset = positions % ps

    new_k, new_v = cache.k, cache.v
    new_ks, new_vs = cache.k_scale, cache.v_scale
    for li, lp in enumerate(params["layers"]):
        kv_li = config.kv_layer_index(li)
        cos, sin = rope_by_layer[li]
        h = rms_norm(x, lp["input_layernorm"], config.rms_norm_eps,
                     config.zero_centered_norm)
        q, k, v, attn_gate = qkv_forward(lp, h, config, quant_mode)
        if config.qk_norm:
            q = rms_norm(q, lp["q_norm"], config.rms_norm_eps, config.zero_centered_norm)
            k = rms_norm(k, lp["k_norm"], config.rms_norm_eps, config.zero_centered_norm)
        q = apply_rope(q, cos, sin)  # [B, W, Hq, D]
        k = apply_rope(k, cos, sin)  # [B, W, Hkv, D]

        if new_ks is not None:
            kq, ksc = kv_quantize(k)  # [B, W, Hkv, D] int8, [B, W, Hkv] f32
            vq, vsc = kv_quantize(v)
            new_k = new_k.at[kv_li, page_idx, offset].set(kq)
            new_v = new_v.at[kv_li, page_idx, offset].set(vq)
            new_ks = new_ks.at[kv_li, page_idx, :, offset].set(ksc)
            new_vs = new_vs.at[kv_li, page_idx, :, offset].set(vsc)
        else:
            new_k = new_k.at[kv_li, page_idx, offset].set(k.astype(new_k.dtype))
            new_v = new_v.at[kv_li, page_idx, offset].set(v.astype(new_v.dtype))

        if attn_mode == "kernel":
            # Pallas window kernel: reads only the pages covering
            # seq_len+W rows (same asymptotics as the paged decode kernel)
            from ..kernels.attention import paged_window_attention_kernel

            attn = _headshard_attn(
                paged_window_attention_kernel, attn_mesh,
                q, new_k[kv_li], new_v[kv_li], page_table, seq_lens,
                scale=config.attn_scale,
                sliding_window=config.layer_sliding_window(li),
                logit_softcap=config.attn_logit_softcap,
                k_scales=None if new_ks is None else new_ks[kv_li],
                v_scales=None if new_vs is None else new_vs[kv_li],
            )
        else:
            k_pages = new_k[kv_li][page_table]
            v_pages = new_v[kv_li][page_table]
            if new_ks is not None:
                k_pages = _dequant_pages(k_pages, new_ks[kv_li][page_table])
                v_pages = _dequant_pages(v_pages, new_vs[kv_li][page_table])
            attn = paged_window_attention(
                q, k_pages, v_pages, positions,
                scale=config.attn_scale,
                sliding_window=config.layer_sliding_window(li),
                logit_softcap=config.attn_logit_softcap,
            )
        attn = attn.reshape(B, W, Hq * D)
        if attn_gate is not None:
            attn = (
                attn.astype(jnp.float32) * jax.nn.sigmoid(attn_gate.astype(jnp.float32))
            ).astype(attn.dtype)
        attn = apply_linear(lp["o_proj"], attn, quant_mode=quant_mode)
        if config.post_norms:
            attn = rms_norm(attn, lp["post_attention_layernorm"],
                            config.rms_norm_eps, config.zero_centered_norm)
            x = x + attn
            h2 = rms_norm(x, lp["pre_feedforward_layernorm"],
                          config.rms_norm_eps, config.zero_centered_norm)
        else:
            x = x + attn
            h2 = rms_norm(x, lp["post_attention_layernorm"],
                          config.rms_norm_eps, config.zero_centered_norm)
        if config.layer_is_sparse(li):
            mlp_out = moe_forward(lp["mlp"], h2, config, quant_mode)
        else:
            mlp_out = mlp_forward(lp["mlp"], h2, quant_mode, config.hidden_act)
        if config.post_norms:
            mlp_out = rms_norm(mlp_out, lp["post_feedforward_layernorm"],
                               config.rms_norm_eps, config.zero_centered_norm)
        x = x + mlp_out

    x = rms_norm(x, params["norm"], config.rms_norm_eps, config.zero_centered_norm)
    logits = lm_head_logits(params, config, x, quant_mode)
    toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, W]
    lps = jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), toks[..., None], axis=-1
    )[..., 0]
    # raw window-position-0 logits [B, V]: sampled slots in a mixed batch
    # draw their single token from these through the engine's batched
    # sampler (per-slot speculation gating) — no extra forward needed
    return toks, lps, logits[:, 0], PagedKVCache(
        new_k, new_v, cache.conv, cache.rec, new_ks, new_vs
    )


_paged_verify_donate = partial(
    jax.jit, static_argnames=("config", "quant_mode", "attn_mode", "attn_mesh"),
    donate_argnames=("cache",),
)(_paged_verify_step_impl)
_paged_verify_nodonate = partial(
    jax.jit, static_argnames=("config", "quant_mode", "attn_mode", "attn_mesh")
)(_paged_verify_step_impl)


def paged_verify_step(params, config, windows, seq_lens, page_table, cache,
                      trash_page, *, quant_mode="xla", attn_mode=None,
                      attn_mesh=None):
    on_cpu = jax.devices()[0].platform in ("cpu",)
    if attn_mode is None:
        attn_mode = "einsum" if on_cpu else "kernel"
    fn = _paged_verify_nodonate if on_cpu else _paged_verify_donate
    return fn(params, config, windows, seq_lens, page_table, cache,
              jnp.asarray(trash_page, jnp.int32), quant_mode=quant_mode,
              attn_mode=attn_mode, attn_mesh=attn_mesh)


def _scatter_prefill_impl(
    config: ModelConfig,
    cache: PagedKVCache,
    layer_k: jax.Array,  # [L, T_pad, Hkv, D] from the contiguous prefill
    layer_v: jax.Array,
    page_ids: jax.Array,  # [maxP_req] int32 pages allocated for this request
) -> PagedKVCache:
    """Copy a prefilled sequence's KV into its pages (padded length)."""
    L, T_pad = layer_k.shape[0], layer_k.shape[1]
    ps = cache.page_size
    n_pages = T_pad // ps if T_pad % ps == 0 else T_pad // ps + 1
    pad = n_pages * ps - T_pad
    if pad:
        layer_k = jnp.pad(layer_k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        layer_v = jnp.pad(layer_v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    pages = page_ids[:n_pages]
    if cache.quantized:
        kq, ksc = kv_quantize(layer_k)  # [L, T, Hkv, D] int8, [L, T, Hkv]
        vq, vsc = kv_quantize(layer_v)
        kp = kq.reshape(L, n_pages, ps, *kq.shape[2:])
        vp = vq.reshape(L, n_pages, ps, *vq.shape[2:])
        # scales land as [L, n_pages, Hkv, ps] (ps on the lane axis)
        ksp = jnp.swapaxes(ksc.reshape(L, n_pages, ps, -1), -1, -2)
        vsp = jnp.swapaxes(vsc.reshape(L, n_pages, ps, -1), -1, -2)
        return cache._replace(
            k=cache.k.at[:, pages].set(kp),
            v=cache.v.at[:, pages].set(vp),
            k_scale=cache.k_scale.at[:, pages].set(ksp),
            v_scale=cache.v_scale.at[:, pages].set(vsp),
        )
    kp = layer_k.reshape(L, n_pages, ps, *layer_k.shape[2:])
    vp = layer_v.reshape(L, n_pages, ps, *layer_v.shape[2:])
    new_k = cache.k.at[:, pages].set(kp.astype(cache.k.dtype))
    new_v = cache.v.at[:, pages].set(vp.astype(cache.v.dtype))
    return cache._replace(k=new_k, v=new_v)


_scatter_prefill_donate = partial(
    jax.jit, static_argnames=("config",), donate_argnames=("cache",)
)(_scatter_prefill_impl)
_scatter_prefill_nodonate = partial(jax.jit, static_argnames=("config",))(
    _scatter_prefill_impl
)


def scatter_prefill_kv(config, cache, layer_k, layer_v, page_ids):
    fn = (
        _scatter_prefill_donate
        if jax.devices()[0].platform not in ("cpu",)
        else _scatter_prefill_nodonate
    )
    return fn(config, cache, layer_k, layer_v, page_ids)


@partial(jax.jit, static_argnames=("rows", "out_dtype"))
def gather_prefix_rows(
    cache: PagedKVCache,
    page_vec: jax.Array,  # [maxP] int32 (matched pages first, trash after)
    rows: int,  # static: contiguous rows to materialize (>= the prefix)
    out_dtype=jnp.bfloat16,  # dequant target when the pool is int8-quantized
) -> tuple[jax.Array, jax.Array]:
    """Materialize a request's page-resident KV in the KVCache storage
    layout — per-layer tuples of head-major [1, Hkv, rows, D] — used by
    prefix-cache admission to seed the chunked prefill cache with the
    shared prefix. Rows beyond the true prefix carry trash-page garbage;
    they are overwritten by the suffix chunks and masked by valid lengths
    everywhere else. `rows` is static per (engine, bucket), so compile
    count stays bounded."""
    L = cache.k.shape[0]
    ps = cache.page_size
    maxP = page_vec.shape[0]
    k = cache.k[:, page_vec]
    v = cache.v[:, page_vec]
    if cache.quantized:
        # dequantize: the chunked prefill cache holds float rows
        k = _dequant_pages(k, cache.k_scale[:, page_vec]).astype(out_dtype)
        v = _dequant_pages(v, cache.v_scale[:, page_vec]).astype(out_dtype)
    k = k.reshape(L, maxP * ps, *k.shape[3:])
    v = v.reshape(L, maxP * ps, *v.shape[3:])
    if rows <= maxP * ps:
        k, v = k[:, :rows], v[:, :rows]
    else:
        pad = rows - maxP * ps
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    # [L, rows, Hkv, D] -> per-layer head-major tuples [1, Hkv, rows, D]
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    return (tuple(k[i][None] for i in range(L)),
            tuple(v[i][None] for i in range(L)))
