"""Gated delta-net linear attention (qwen3_next family), TPU-first.

Implements the Qwen3-Next hybrid family's linear-attention layers — the
reference runs these through the HF/vLLM model zoos (reference
experiments/optimize/4bit_moe.sh skips their in_proj); behavioral spec:
HF transformers modeling_qwen3_next.py (Qwen3NextGatedDeltaNet).

Math (per value head, state S in R^{dk x dv}):
    beta_t = sigmoid(b_t)
    g_t    = -exp(A_log) * softplus(a_t + dt_bias)          (log-decay, <= 0)
    q_t, k_t l2-normalized; q scaled by dk^-0.5
    S_t    = exp(g_t) * S_{t-1} + k_t (beta_t (v_t - (exp(g_t) S_{t-1})^T k_t))^T
    o_t    = S_t^T q_t
with a short depthwise causal conv (+SiLU) over the concatenated q/k/v
stream before the recurrence, and a z-gated RMSNorm + out_proj after.

TPU design notes:
- prefill uses the CHUNKED parallel form: within a 64-token chunk the
  sequential dependency is a unit-lower-triangular system solved with one
  batched `solve_triangular` (MXU-friendly), replacing the reference's
  O(chunk) in-place python loop; chunks advance with `lax.scan` carrying the
  [H, dk, dv] state. No data-dependent shapes, jit-stable.
- decode is the O(1) recurrent update on a carried state (conv window +
  recurrent state live in the cache pytree).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig

CHUNK = 64


class LinearAttnStates(NamedTuple):
    """Stacked per-linear-layer states for decode.

    conv [Ll, B, conv_dim, Kc-1]: the last Kc-1 conv inputs
    rec  [Ll, B, Hv, dk, dv]: the delta-rule recurrent state (f32)
    """

    conv: jax.Array
    rec: jax.Array

    @classmethod
    def create(cls, config: ModelConfig, batch: int, dtype=jnp.float32):
        Ll = config.num_linear_layers
        return cls(
            conv=jnp.zeros(
                (Ll, batch, config.linear_conv_dim, config.linear_conv_kernel_dim - 1),
                dtype,
            ),
            rec=jnp.zeros(
                (
                    Ll, batch, config.linear_num_value_heads,
                    config.linear_key_head_dim, config.linear_value_head_dim,
                ),
                jnp.float32,
            ),
        )


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _split_qkvz_ba(cfg: ModelConfig, qkvz: jax.Array, ba: jax.Array):
    """HF fix_query_key_value_ordering: projections are interleaved per
    k-head as (q, k, v-group, z-group) / (b-group, a-group)."""
    B, T = qkvz.shape[0], qkvz.shape[1]
    Hk, Hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    r = Hv // Hk
    mixed = qkvz.reshape(B, T, Hk, 2 * dk + 2 * r * dv)
    q = mixed[..., :dk]
    k = mixed[..., dk : 2 * dk]
    v = mixed[..., 2 * dk : 2 * dk + r * dv].reshape(B, T, Hv, dv)
    z = mixed[..., 2 * dk + r * dv :].reshape(B, T, Hv, dv)
    mixed_ba = ba.reshape(B, T, Hk, 2 * r)
    b = mixed_ba[..., :r].reshape(B, T, Hv)
    a = mixed_ba[..., r:].reshape(B, T, Hv)
    return q, k, v, z, b, a  # q/k [B,T,Hk,dk]


def _conv_mix(cfg: ModelConfig, qkv_flat: jax.Array, conv_w: jax.Array,
              prev_window: jax.Array | None, valid_len: jax.Array | None = None):
    """Depthwise causal conv + SiLU over the channel-last [B, T, C] stream.

    conv_w [C, Kc]; prev_window [B, C, Kc-1] (decode) or None (prefill from 0).
    valid_len (padded prefill): the returned window holds the inputs at
    positions [valid_len-Kc+1, valid_len), not the padded tail.
    Returns (mixed [B, T, C], new_window [B, C, Kc-1])."""
    B, T, C = qkv_flat.shape
    Kc = conv_w.shape[-1]
    xc = jnp.swapaxes(qkv_flat, 1, 2)  # [B, C, T]
    if prev_window is None:
        prev_window = jnp.zeros((B, C, Kc - 1), xc.dtype)
    xfull = jnp.concatenate([prev_window.astype(xc.dtype), xc], axis=-1)  # [B, C, T+Kc-1]
    # depthwise conv as a sum of Kc shifted scalings (Kc is 4 — cheap, fuses)
    out = jnp.zeros((B, C, T), jnp.float32)
    for i in range(Kc):
        out = out + conv_w[None, :, i : i + 1].astype(jnp.float32) * xfull[
            :, :, i : i + T
        ].astype(jnp.float32)
    out = jax.nn.silu(out)
    if Kc > 1:
        if valid_len is None:
            new_window = xfull[:, :, -(Kc - 1):]
        else:
            # stream position p lives at xfull index p + Kc - 1 - ... i.e.
            # window = stream[valid_len-(Kc-1) : valid_len] = xfull[valid_len : valid_len+Kc-1]
            start = jnp.clip(valid_len, 0, T)
            new_window = jax.lax.dynamic_slice_in_dim(
                xfull, start, Kc - 1, axis=2
            )
    else:
        new_window = xfull[:, :, :0]
    return jnp.swapaxes(out, 1, 2).astype(qkv_flat.dtype), new_window


def _gated_norm(x: jax.Array, z: jax.Array, weight: jax.Array, eps: float):
    """RMSNorm(x) * w * silu(z) (HF Qwen3NextRMSNormGated)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + eps)
    return (xn * weight.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)


def _chunk_delta_rule(q, k, v, g, beta, init_state):
    """Chunked parallel gated delta rule.

    q/k [B, Hv, T, dk] (already l2-normed, q scaled), v [B, Hv, T, dv],
    g [B, Hv, T] log-decay, beta [B, Hv, T]; T % CHUNK == 0.
    init_state [B, Hv, dk, dv] f32. Returns (out [B, Hv, T, dv], state).
    """
    B, H, T, dk = q.shape
    dv = v.shape[-1]
    nC = T // CHUNK

    def to_chunks(x):
        return x.reshape(B, H, nC, CHUNK, *x.shape[3:]).swapaxes(0, 2).swapaxes(1, 2)
        # -> [nC, B, H, CHUNK, ...]

    qc, kc, vc = to_chunks(q), to_chunks(k), to_chunks(v)
    gc = g.reshape(B, H, nC, CHUNK).swapaxes(0, 2).swapaxes(1, 2)  # [nC,B,H,C]
    bc = beta.reshape(B, H, nC, CHUNK).swapaxes(0, 2).swapaxes(1, 2)

    gcum = jnp.cumsum(gc, axis=-1)  # within-chunk cumulative log decay
    tril = jnp.tril(jnp.ones((CHUNK, CHUNK), bool), -1)
    eye = jnp.eye(CHUNK, dtype=jnp.float32)

    # decay_mask[i,j] = exp(gcum_i - gcum_j) for j <= i
    decay = jnp.where(
        jnp.tril(jnp.ones((CHUNK, CHUNK), bool)),
        jnp.exp(gcum[..., :, None] - gcum[..., None, :]),
        0.0,
    )  # [nC,B,H,C,C]

    k_beta = kc * bc[..., None]
    v_beta = vc * bc[..., None]
    # L = strictly-lower (k_beta k^T * decay); the in-chunk forward
    # substitution composes to M = (I + L)^{-1}, computed here with one
    # batched unit-triangular solve (the reference builds it with an O(C)
    # in-place python loop, torch_chunk_gated_delta_rule)
    L = jnp.where(
        tril,
        jnp.einsum("...id,...jd->...ij", k_beta, kc,
                   preferred_element_type=jnp.float32) * decay,
        0.0,
    )
    M = jax.scipy.linalg.solve_triangular(
        eye + L, jnp.broadcast_to(eye, L.shape), lower=True, unit_diagonal=True
    )  # [nC,B,H,C,C]
    v_eff = jnp.einsum("...ij,...jd->...id", M, v_beta,
                       preferred_element_type=jnp.float32)
    kg = k_beta * jnp.exp(gcum)[..., None]
    k_cumdecay = jnp.einsum("...ij,...jd->...id", M, kg,
                            preferred_element_type=jnp.float32)

    attn_mask = jnp.tril(jnp.ones((CHUNK, CHUNK), bool))

    def chunk_step(state, inputs):
        q_i, k_i, v_i, g_i, gcum_i, dec_i, kcd_i = inputs
        # [B,H,C,C] intra-chunk attention
        attn = jnp.where(
            attn_mask,
            jnp.einsum("bhid,bhjd->bhij", q_i, k_i,
                       preferred_element_type=jnp.float32) * dec_i,
            0.0,
        )
        v_prime = jnp.einsum("bhid,bhdv->bhiv", kcd_i, state,
                             preferred_element_type=jnp.float32)
        v_new = v_i - v_prime
        attn_inter = jnp.einsum(
            "bhid,bhdv->bhiv", q_i * jnp.exp(gcum_i)[..., None], state,
            preferred_element_type=jnp.float32,
        )
        out_i = attn_inter + jnp.einsum("bhij,bhjv->bhiv", attn, v_new,
                                        preferred_element_type=jnp.float32)
        g_last = gcum_i[..., -1]  # [B,H]
        k_scaled = k_i * jnp.exp(g_last[..., None, None] - gcum_i[..., None])
        state = state * jnp.exp(g_last)[..., None, None] + jnp.einsum(
            "bhid,bhiv->bhdv", k_scaled, v_new,
            preferred_element_type=jnp.float32,
        )
        return state, out_i

    state, outs = jax.lax.scan(
        chunk_step, init_state.astype(jnp.float32),
        (qc.astype(jnp.float32), kc.astype(jnp.float32), v_eff,
         gc, gcum, decay, k_cumdecay),
    )
    out = outs.swapaxes(0, 2).swapaxes(0, 1).reshape(B, H, T, dv)
    return out, state


def _recurrent_delta_rule(q, k, v, g, beta, state):
    """One-token recurrent update. q/k [B,Hv,dk], v [B,Hv,dv], g/beta [B,Hv],
    state [B,Hv,dk,dv] f32. Returns (out [B,Hv,dv], new_state)."""
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    state = state * jnp.exp(g)[..., None, None]
    kv_mem = jnp.einsum("bhdv,bhd->bhv", state, kf,
                        preferred_element_type=jnp.float32)
    delta = (vf - kv_mem) * beta[..., None]
    state = state + kf[..., :, None] * delta[..., None, :]
    out = jnp.einsum("bhdv,bhd->bhv", state, qf,
                     preferred_element_type=jnp.float32)
    return out, state


def delta_net_forward(
    p: dict[str, Any],
    x: jax.Array,  # [B, T, H]
    config: ModelConfig,
    conv_state: jax.Array | None,  # [B, conv_dim, Kc-1] or None (prefill)
    rec_state: jax.Array | None,  # [B, Hv, dk, dv] or None
    quant_mode: str,
    valid_len: jax.Array | None = None,  # scalar int32: true prompt length
    return_taps: bool = False,  # also return {"la_out": out_proj input}
):
    """Full gated-delta-net layer. Returns (out [B,T,H], conv_state, rec_state).

    For T == 1 with states present this is the O(1) recurrent decode step;
    otherwise the chunked prefill (states, if given, seed the recurrence).
    `valid_len` supports the engine's zero-padded prefill buckets: positions
    >= valid_len are masked out of the state (g=0, k=v=beta=0) and the conv
    window is sliced at the true length, so the carried states are exactly
    those of an unpadded prefill.
    """
    from .decoder import apply_linear  # local import to avoid cycle

    B, T, _ = x.shape
    Hk, Hv = config.linear_num_key_heads, config.linear_num_value_heads
    dk, dv = config.linear_key_head_dim, config.linear_value_head_dim
    r = Hv // Hk

    qkvz = apply_linear(p["in_proj_qkvz"], x, quant_mode=quant_mode)
    ba = apply_linear(p["in_proj_ba"], x, quant_mode=quant_mode)
    q, k, v, z, b, a = _split_qkvz_ba(config, qkvz, ba)

    qkv_flat = jnp.concatenate(
        [q.reshape(B, T, -1), k.reshape(B, T, -1), v.reshape(B, T, -1)], axis=-1
    )
    valid = None
    if valid_len is not None and T > 1:
        valid = (jnp.arange(T, dtype=jnp.int32) < valid_len)[None, :]  # [1,T]
        qkv_flat = jnp.where(valid[..., None], qkv_flat, 0.0)
    mixed, conv_state = _conv_mix(
        config, qkv_flat, p["conv_w"], conv_state,
        valid_len=valid_len if T > 1 else None,
    )
    q = mixed[..., : Hk * dk].reshape(B, T, Hk, dk)
    k = mixed[..., Hk * dk : 2 * Hk * dk].reshape(B, T, Hk, dk)
    v = mixed[..., 2 * Hk * dk :].reshape(B, T, Hv, dv)

    beta = jax.nn.sigmoid(b.astype(jnp.float32))  # [B,T,Hv]
    g = -jnp.exp(p["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32)
    )  # [B,T,Hv]
    if valid is not None:
        k = jnp.where(valid[..., None, None], k, 0.0)
        v = jnp.where(valid[..., None, None], v, 0.0)
        beta = jnp.where(valid[..., None], beta, 0.0)
        g = jnp.where(valid[..., None], g, 0.0)

    q = _l2norm(q.astype(jnp.float32)) * (dk ** -0.5)
    k = _l2norm(k.astype(jnp.float32))
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)

    if rec_state is None:
        rec_state = jnp.zeros((B, Hv, dk, dv), jnp.float32)

    if T == 1:
        out_h, rec_state = _recurrent_delta_rule(
            q[:, 0], k[:, 0], v[:, 0], g[:, 0], beta[:, 0], rec_state,
        )
        core = out_h[:, None]  # [B,1,Hv,dv]
    else:
        pad = -T % CHUNK

        def hm(xx):  # [B,T,H,*] -> [B,H,T,*], zero-padded to a CHUNK multiple
            xx = jnp.swapaxes(xx, 1, 2)
            if pad:
                xx = jnp.pad(xx, ((0, 0), (0, 0), (0, pad)) + ((0, 0),) * (xx.ndim - 3))
            return xx

        # padding is exact by construction: padded positions get g=0 (no
        # decay) and k=v=beta=0 (no delta update), so the carried rec_state
        # is untouched by the tail
        out_h, rec_state = _chunk_delta_rule(
            hm(q), hm(k), hm(v), hm(g), hm(beta), rec_state
        )
        core = jnp.swapaxes(out_h[:, :, :T], 1, 2)  # [B,T,Hv,dv]
    out = _gated_norm(core, z, p["norm"], config.rms_norm_eps)
    out = out.reshape(B, T, Hv * dv)
    y = apply_linear(p["out_proj"], out, quant_mode=quant_mode)
    if return_taps:
        return y, conv_state, rec_state, {"la_out": out}
    return y, conv_state, rec_state
