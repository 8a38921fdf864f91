"""Token sampling: temperature / top-k / top-p / repetition penalty.

Covers the sampler surface the reference exposes through GenerationParams
(inference/base.py:10-16) and delegates to vLLM/mlx_lm/transformers. Here it
is one jitted function, static in the parameter values so XLA folds the
masking (decode re-jits only when sampling params change, which is per
request, not per token).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    max_tokens: int = 512
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    repetition_penalty: float = 1.0
    seed: int | None = None
    # OpenAI top_logprobs: N alternative tokens per position (engine carries
    # up to engine.TOPN=8); 0 disables the host-side bookkeeping
    top_logprobs: int = 0
    # OpenAI logit_bias: ((token_id, bias), ...) added to logits pre-sampling
    logit_bias: tuple[tuple[int, float], ...] = ()
    stop_token_ids: tuple[int, ...] = ()
    # string stop sequences (OpenAI `stop`): matched against decoded text by
    # the HTTP layer (serve/api.py), which truncates at the match and
    # cancel()s the engine request — the engine itself stays token-level
    stop: tuple[str, ...] = ()

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


def apply_repetition_penalty(
    logits: jax.Array, token_counts: jax.Array, penalty: float
) -> jax.Array:
    """HF-style: divide positive logits of seen tokens by p, multiply negative."""
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    return jnp.where(
        seen, jnp.where(logits > 0, logits / penalty, logits * penalty), logits
    )


@partial(jax.jit, static_argnames=("temperature", "top_p", "top_k", "repetition_penalty"))
def sample_token(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,
    token_counts: jax.Array | None = None,  # [B, V] int32 or None
    *,
    temperature: float = 1.0,
    top_p: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    logits = logits.astype(jnp.float32)
    if repetition_penalty != 1.0 and token_counts is not None:
        logits = apply_repetition_penalty(logits, token_counts, repetition_penalty)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_mask = cum - probs > top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("temperature", "top_p", "top_k"))
def modified_probs(
    logits: jax.Array,  # [..., V] f32
    *,
    temperature: float,
    top_p: float = 1.0,
    top_k: int = 0,
) -> jax.Array:
    """The EXACT distribution sample_token draws from at temperature>0
    (same masking order: temperature -> top-k -> top-p), as probabilities.
    Speculative sampling needs it in closed form for accept/reject math."""
    logits = logits.astype(jnp.float32) / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_mask = cum - probs > top_p
        cutoff_logit = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < cutoff_logit, -jnp.inf, logits)
    return jax.nn.softmax(logits, axis=-1)


@partial(jax.jit, static_argnames=("temperature", "top_p", "top_k"))
def spec_accept_sample(
    logits: jax.Array,  # [W, V] f32: verify-window logits (W = 1 + k)
    draft: jax.Array,  # [k] int32 drafted tokens (point-mass proposal)
    d_len: jax.Array,  # () int32 number of REAL drafts (rest is padding)
    key: jax.Array,
    *,
    temperature: float,
    top_p: float = 1.0,
    top_k: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Speculative SAMPLING verification (Leviathan et al.; deterministic
    point-mass proposal): accept draft i with probability p_i(d_i) under the
    target modified distribution; on first rejection emit one token from the
    residual (p_i with d_i's mass removed, renormalized); if every real
    draft accepts, emit a bonus token from the last position's distribution.

    Returns (tokens [W], n_accepted (), raw_logprobs [W]); the caller emits
    tokens[: n_accepted + 1]. The emitted-token distribution is EXACTLY the
    sequential sampler's (P(x) = p(d)*1[x=d] + (1-p(d))*residual(x) = p(x)),
    though the PRNG stream differs from step-by-step decoding."""
    W, V = logits.shape
    k = draft.shape[0]
    p = modified_probs(logits, temperature=temperature, top_p=top_p, top_k=top_k)
    raw_lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    keys = jax.random.split(key, W + k)

    def body(carry, i):
        still = carry
        d_i = draft[i]
        p_i = p[i]
        u = jax.random.uniform(keys[i])
        real = i < d_len
        accept = still & real & (u < p_i[d_i])
        # residual: remove the proposal's point mass, renormalize
        resid = p_i.at[d_i].set(0.0)
        resid_tok = jax.random.categorical(
            keys[k + i], jnp.log(jnp.maximum(resid, 1e-30))
        ).astype(jnp.int32)
        rejected_now = still & real & ~accept
        tok = jnp.where(accept, d_i, resid_tok)
        # the chain survives padding positions (real=False) untouched; it
        # dies only on a real rejection
        return still & (accept | ~real), (tok, rejected_now)

    still, (toks_k, rejected) = jax.lax.scan(
        body, jnp.asarray(True), jnp.arange(k, dtype=jnp.int32)
    )
    # bonus token when every real draft accepted (position d_len's dist)
    bonus_key = keys[W + k - 1]
    p_bonus = p[d_len]
    bonus = jax.random.categorical(
        bonus_key, jnp.log(jnp.maximum(p_bonus, 1e-30))
    ).astype(jnp.int32)
    n_acc = jnp.sum(
        jnp.cumprod(
            jnp.where(jnp.arange(k) < d_len, ~rejected, False).astype(jnp.int32)
        )
    ).astype(jnp.int32)
    # tokens laid out positionally: accepted drafts / the rejection
    # correction occupy 0..n_acc; the bonus lands at n_acc when all accept
    toks = jnp.zeros((W,), jnp.int32)
    toks = toks.at[:k].set(toks_k)
    toks = toks.at[n_acc].set(jnp.where(still, bonus, toks_k[jnp.minimum(n_acc, k - 1)]))
    lps = jnp.take_along_axis(raw_lp, toks[:, None], axis=1)[:, 0]
    return toks, n_acc, lps
