"""Ring-attention sequence/context parallelism (SP/CP) for long prefill.

The reference has NO sequence parallelism (SURVEY.md §2.6 row "SP/CP":
long prompts run on one rank under vLLM paged attention — reference
inference.py:118 even disables chunked prefill in eval). This module
EXCEEDS that: causal prefill attention whose sequence axis is sharded
over a mesh axis, with KV shards rotating around the ring via
`jax.lax.ppermute` (one ICI hop per step) and flash-style online-softmax
accumulation — so a P-device ring holds 1/P of the KV in memory per
device and overlaps compute with neighbor transfers (Ring Attention,
Liu et al. 2023; the TPU collective-matmul pattern from the scaling
book).

Design notes (tpu-first):
  - shard_map over axis "sp": per-device block [B, S/P, H, D], all shapes
    static; the rotation count P is a compile-time constant (mesh size).
  - Causality by GLOBAL position ids, not rank arithmetic: each KV shard
    carries its global positions implicitly via `chunk_positions`, so the
    same code handles any block->rank layout. Blocks strictly in the
    future contribute zero via masking (predictable, static shapes); the
    well-known ~2x causal load imbalance of contiguous layouts can be
    addressed later with a striped layout without touching the math.
  - The per-(q-shard, kv-shard) block runs the SAME masked-softmax math
    as models/decoder.attention (f32 scores, -1e30 mask fill), so the
    exactness test against single-device prefill holds to f32 rounding.
  - Online combine across ring steps keeps running (max m, denom l,
    accumulator acc) per query — numerically identical to a global
    softmax over the concatenated KV, the flash-attention recurrence.

Ring steps send KV to the NEXT rank ((i, (i+1)%P)), so after t steps a
device holds the shard of rank (p - t) % P — each shard visits every
rank exactly once: collective cost P-1 ppermutes of the local KV bytes,
all riding ICI neighbor links.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attn(q, k, v, q_pos, kv_pos, *, scale, sliding_window,
                logit_softcap):
    """One (q-block, kv-block) flash piece.

    q [B, T, Hq, D], k/v [B, C, Hkv, D], q_pos [B, T], kv_pos [B, C].
    Returns (acc [B, T, Hq, D] f32 — UNNORMALIZED prob-weighted V sum,
    m [B, T, Hq] row max, l [B, T, Hq] row denom at that max).
    """
    B, T, Hq, D = q.shape
    C = k.shape[1]
    Hkv = k.shape[2]
    group = Hq // Hkv
    qf = q.reshape(B, T, Hkv, group, D).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qf, kf, preferred_element_type=jnp.float32
    ) * scale
    if logit_softcap:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    mask = kv_pos[:, None, :] <= q_pos[:, :, None]  # [B, T, C]
    if sliding_window is not None:
        mask &= kv_pos[:, None, :] > q_pos[:, :, None] - sliding_window
    scores = jnp.where(mask[:, None, None, :, :], scores, -1e30)
    m = jnp.max(scores, axis=-1)  # [B, Hkv, g, T]
    # guard all-masked rows (future blocks): exp(-1e30 - (-1e30)) would be 1
    safe_m = jnp.maximum(m, -1e29)
    p = jnp.exp(scores - safe_m[..., None])
    p = jnp.where(mask[:, None, None, :, :], p, 0.0)
    l = jnp.sum(p, axis=-1)  # [B, Hkv, g, T]
    acc = jnp.einsum(
        "bhgts,bshd->bthgd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(B, T, Hq, D)
    # -> [B, T, Hq]
    to_q = lambda a: jnp.transpose(a, (0, 3, 1, 2)).reshape(B, T, Hq)
    return acc, to_q(safe_m), to_q(l)


def _combine(acc, m, l, acc2, m2, l2):
    """Flash online-softmax merge of two partial blocks."""
    m_new = jnp.maximum(m, m2)
    a1 = jnp.exp(m - m_new)
    a2 = jnp.exp(m2 - m_new)
    l_new = l * a1 + l2 * a2
    acc_new = acc * a1[..., None] + acc2 * a2[..., None]
    return acc_new, m_new, l_new


def _pick_chunk(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (static shapes: chunks must
    tile exactly)."""
    c = min(n, target)
    while n % c:
        c -= 1
    return c


def _ring_body(q, k, v, q_pos, kv_pos, *, axis, n_dev, scale,
               sliding_window, logit_softcap, block_q, block_kv):
    """Per-device shard_map body: local q block vs rotating kv ring.

    Long shards never materialize the full [T_local, C_local] score: the
    kv axis scans in block_kv chunks (online-softmax carry) and the q axis
    maps in independent block_q chunks, bounding peak score memory at
    [B, Hq, block_q, block_kv] f32 regardless of context length (the
    un-chunked einsum is 8.6GB/layer at 64k tokens over 8 devices at 8B
    geometry — more than the chip)."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    B, T, Hq, D = q.shape
    bq = _pick_chunk(T, block_q)
    nq = T // bq

    def _attn(kc, vc, pc):
        """(acc2, m2, l2) of local q vs one kv chunk, q chunked via map."""
        if nq == 1:
            return _block_attn(q, kc, vc, q_pos, pc, scale=scale,
                               sliding_window=sliding_window,
                               logit_softcap=logit_softcap)
        qs = jnp.moveaxis(q.reshape(B, nq, bq, Hq, D), 1, 0)
        ps = jnp.moveaxis(q_pos.reshape(B, nq, bq), 1, 0)
        a, mm, ll = jax.lax.map(
            lambda xs: _block_attn(xs[0], kc, vc, xs[1], pc, scale=scale,
                                   sliding_window=sliding_window,
                                   logit_softcap=logit_softcap),
            (qs, ps),
        )  # [nq, B, bq, ...]
        return (jnp.moveaxis(a, 0, 1).reshape(B, T, Hq, D),
                jnp.moveaxis(mm, 0, 1).reshape(B, T, Hq),
                jnp.moveaxis(ll, 0, 1).reshape(B, T, Hq))

    def block(acc, m, l, kc, vc, pc):
        C = kc.shape[1]
        bkv = _pick_chunk(C, block_kv)
        nkv = C // bkv
        if nkv == 1:
            return _combine(acc, m, l, *_attn(kc, vc, pc))
        Hkv = kc.shape[2]
        kcs = jnp.moveaxis(kc.reshape(B, nkv, bkv, Hkv, D), 1, 0)
        vcs = jnp.moveaxis(vc.reshape(B, nkv, bkv, Hkv, D), 1, 0)
        pcs = jnp.moveaxis(pc.reshape(B, nkv, bkv), 1, 0)

        def kstep(carry, xs):
            a, mm, ll = carry
            return _combine(a, mm, ll, *_attn(*xs)), None

        (acc, m, l), _ = jax.lax.scan(kstep, (acc, m, l), (kcs, vcs, pcs))
        return acc, m, l

    def step(carry, _):
        acc, m, l, kc, vc, pc = carry
        acc, m, l = block(acc, m, l, kc, vc, pc)
        # rotate AFTER using the block (the permute overlaps the next
        # step's compute — no data dependence between them)
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        pc = jax.lax.ppermute(pc, axis, perm)
        return (acc, m, l, kc, vc, pc), None

    B, T, Hq, D = q.shape
    # fresh zeros are device-invariant; mark them varying over the ring
    # axis so the scan carry types match the (varying) attention outputs
    vary = lambda x: jax.lax.pcast(x, (axis,), to="varying")
    init = (
        vary(jnp.zeros((B, T, Hq, D), jnp.float32)),
        vary(jnp.full((B, T, Hq), -jnp.inf, jnp.float32)),
        vary(jnp.zeros((B, T, Hq), jnp.float32)),
        k, v, kv_pos,
    )
    # peel the final block out of the scan: its permute (which would
    # restore the original layout) is never consumed — 1/P less ICI traffic
    (acc, m, l, kc, vc, pc), _ = jax.lax.scan(
        step, init, None, length=n_dev - 1)
    acc, m, l = block(acc, m, l, kc, vc, pc)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jax.Array,  # [B, S, Hq, D] sharded on S over `axis`
    k: jax.Array,  # [B, S, Hkv, D] same sharding
    v: jax.Array,
    positions: jax.Array,  # int32 [B, S] global positions (same sharding)
    mesh: Mesh,
    *,
    axis: str = "sp",
    scale: float,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    block_q: int = 1024,
    block_kv: int = 1024,
) -> jax.Array:
    """Causal GQA self-attention with the sequence sharded over `axis`.

    Exact (to f32 rounding) vs models/decoder.attention on the gathered
    sequence; KV memory and score FLOPs per device scale as 1/P; peak
    score memory is bounded by [B, Hq, block_q, block_kv] f32.
    """
    n_dev = mesh.shape[axis]
    spec = P(None, axis)
    body = partial(
        _ring_body, axis=axis, n_dev=n_dev, scale=scale,
        sliding_window=sliding_window, logit_softcap=logit_softcap,
        block_q=block_q, block_kv=block_kv,
    )
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis, None, None),) * 3 + (spec, spec),
        out_specs=P(None, axis, None, None),
    )(q, k, v, positions, positions)


def sp_sharding(mesh: Mesh, axis: str = "sp") -> NamedSharding:
    """Sharding for [B, S, ...] activations with S over the ring axis."""
    return NamedSharding(mesh, P(None, axis))


# ---------------------------------------------------------------------------
# Full-model SP prefill: every pointwise / linear / MLP op is batched over
# the token axis and shards trivially under GSPMD; attention runs the ring.
# Use case: long-context prefill and PPL eval whose activations exceed one
# chip (the reference has no counterpart — it caps prompts at one rank).
# ---------------------------------------------------------------------------

_SP_JIT_CACHE: dict = {}


def striped_perm(S: int, n_dev: int) -> Any:
    """Zigzag token permutation for causal load balance (Megatron-CP
    style): device p holds stripes p and 2P-1-p, so every device's causal
    score area is ~equal — the contiguous layout makes the last device do
    ~P x the first device's work. Returns perm with new_tokens = tokens[
    :, perm]; positions carry the ORIGINAL indices so the ring math is
    layout-oblivious."""
    import numpy as _np

    if S % (2 * n_dev):
        raise ValueError(f"striped layout needs seq {S} % {2 * n_dev} == 0")
    chunk = S // (2 * n_dev)
    order = []
    for p in range(n_dev):
        order += [p, 2 * n_dev - 1 - p]
    return _np.concatenate(
        [_np.arange(s * chunk, (s + 1) * chunk) for s in order])


def sp_prefill(
    params: Any,
    config: Any,
    tokens: jax.Array,  # int32 [B, S]; S must divide the mesh axis size
    mesh: Mesh,
    *,
    axis: str = "sp",
    quant_mode: str = "xla",
    layout: str = "contiguous",  # "contiguous" | "striped"
) -> jax.Array:
    """Prefill logits [B, S, V] with the sequence sharded over `axis`.

    Params replicate; activations shard on the token axis; attention is
    ring_attention (KV rotating via ppermute). Returns sharded logits —
    callers slice/evaluate under the same sharding (PPL eval) or gather.

    layout="striped": tokens permute into the zigzag layout before
    sharding (balanced causal work across the ring) and the logits are
    un-permuted before return — same contract, better load balance. Only
    for pure-attention models (a striped sequence would scramble the
    recurrent delta-net layers of hybrids).
    """
    if getattr(config, "is_gemma3n", False):
        raise NotImplementedError("gemma3n AltUp under SP prefill")
    n_dev = mesh.shape[axis]
    S = tokens.shape[1]
    if S % n_dev:
        raise ValueError(f"seq len {S} not divisible by {axis}={n_dev}")
    perm = None
    if layout == "striped":
        if any(config.layer_is_linear(i)
               for i in range(config.num_hidden_layers)):
            raise NotImplementedError(
                "striped SP over recurrent (delta-net) hybrid layers")
        perm = striped_perm(S, n_dev)
    elif layout != "contiguous":
        raise ValueError(layout)
    key = (mesh, axis, quant_mode, layout, S if perm is not None else None)
    fn = _SP_JIT_CACHE.get(key)
    if fn is None:
        def impl(q, k, v, q_pos, valid, *, scale, sliding_window,
                 logit_softcap):
            del valid  # no cache in SP prefill: all S_kv tokens are valid
            # layer_forward hands attn impls HEAD-MAJOR kv [B, Hkv, S, D];
            # ring_attention's token axis shards over the mesh, so swap back
            # to [B, S, Hkv, D] (local transpose of fresh prefill kv)
            return ring_attention(
                q, jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), q_pos,
                mesh, axis=axis, scale=scale,
                sliding_window=sliding_window, logit_softcap=logit_softcap,
            )

        from functools import partial as _partial

        from ..models.decoder import model_forward

        @_partial(jax.jit, static_argnames=("config",))
        def fn(params, config, tokens):
            positions = None
            if perm is not None:
                tokens = jnp.take(tokens, jnp.asarray(perm), axis=1)
                positions = jnp.broadcast_to(
                    jnp.asarray(perm, jnp.int32)[None], tokens.shape)
                positions = jax.lax.with_sharding_constraint(
                    positions, NamedSharding(mesh, P(None, axis)))
                tokens = jax.lax.with_sharding_constraint(
                    tokens, NamedSharding(mesh, P(None, axis)))
            logits, _ = model_forward(
                params, config, tokens, None,
                quant_mode=quant_mode, attn_mode=impl, positions=positions,
            )
            if perm is not None:
                inv = jnp.argsort(jnp.asarray(perm))
                logits = jnp.take(logits, inv, axis=1)
            return logits

        _SP_JIT_CACHE[key] = fn
    if quant_mode not in ("xla", "w4a8_xla"):
        # fused/auto serving under SP: wrap quantized layers token-sharded so
        # the Pallas kernels launch per device on local rows inside shard_map
        # (GSPMD would replicate pallas_call — the round-3 "--sp forces xla"
        # guard this replaces). Wrapping only restructures the pytree; the
        # new treedef keys the jit cache.
        from .tp import sp_wrap_params

        params = sp_wrap_params(params, config, mesh, axis=axis)
    tokens = jax.device_put(tokens, NamedSharding(mesh, P(None, axis)))
    return fn(params, config, tokens)
