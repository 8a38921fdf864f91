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
