"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh axis.

The reference has no in-repo pipeline parallelism — it only passes a
`pipeline_parallel_size` config through to vLLM (reference
experiments/tasks/reasoning/lighteval_custom/patch.py:37,96). This module is
a first-class TPU-native implementation for throughput-oriented full-sequence
forwards (perplexity evaluation, calibration teacher passes, offline prefill
scoring): decoder layers are stacked and sharded across a "stage" mesh axis,
microbatches flow stage-to-stage over ICI via `jax.lax.ppermute`, and every
device runs the same SPMD program under `jax.shard_map`.

Design (idiomatic JAX, not a port):
- Layer weights are STACKED into one pytree with a leading layer axis and
  sharded `P("stage")` on that axis — each stage holds a contiguous block of
  L/S layers and scans over them locally (`lax.scan`), so per-stage compute
  is one fused XLA loop.
- The GPipe schedule runs M + S - 1 ticks. Stage 0 injects microbatch t at
  tick t; stage s processes the activation received from stage s-1 at the
  previous tick; a single `ppermute` per tick moves the [mb, T, H] activation
  ring-forward over ICI. The bubble fraction is (S-1)/(M+S-1): callers pick
  n_microbatches >= S (asserted) to keep it small.
- Stage outputs land in a per-device buffer; the final hidden states are
  returned `P("stage")`-sharded and only the LAST stage's slice is real. The
  caller slices it and applies final-norm + lm_head under plain GSPMD.

Restrictions (asserted): homogeneous dense decoders — every layer the same
pytree structure, full attention, one RoPE theta (llama / qwen2 / qwen3
dense). MoE / hybrid / sliding-window families tensor-shard instead (TP/EP
in parallel/shard.py); PP targets the dense-family eval path.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.decoder import apply_linear, layer_forward, rms_norm, rope_tables


def make_pp_mesh(n_stage: int) -> Mesh:
    import numpy as np

    devices = np.array(jax.devices())[:n_stage]
    return Mesh(devices.reshape(n_stage), ("stage",))


def _check_pipelineable(config: ModelConfig) -> None:
    for i in range(config.num_hidden_layers):
        if config.layer_is_linear(i):
            raise ValueError("pipeline_forward: hybrid (linear-attention) layers unsupported; use TP")
        if config.layer_is_sparse(i):
            raise ValueError("pipeline_forward: MoE layers unsupported; use TP/EP")
        if config.layer_sliding_window(i) is not None:
            raise ValueError("pipeline_forward: sliding-window layers unsupported; use TP")
    if config.is_gemma3n:
        raise ValueError("pipeline_forward: gemma3n unsupported; use TP")


def stack_layers(layers: list[dict[str, Any]]) -> dict[str, Any]:
    """Stack per-layer pytrees into one pytree with a leading layer axis.

    Array leaves stack; None leaves (e.g. absent biases) must be None in
    every layer and stay None. Layers must be structurally homogeneous
    (true for the dense families PP supports; asserted via tree structure).
    """
    treedef0 = jax.tree.structure(layers[0], is_leaf=lambda x: x is None)
    for lp in layers[1:]:
        td = jax.tree.structure(lp, is_leaf=lambda x: x is None)
        if td != treedef0:
            raise ValueError(f"non-homogeneous layers: {td} != {treedef0}")

    def _stack(*xs):
        if xs[0] is None:
            assert all(x is None for x in xs)
            return None
        return jnp.stack(xs)

    return jax.tree.map(_stack, *layers, is_leaf=lambda x: x is None)


def shard_stacked_layers(stacked: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """device_put the stacked layer pytree with the leading axis on "stage"."""

    def _put(a):
        if a is None:
            return None
        spec = P(*(("stage",) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(_put, stacked, is_leaf=lambda x: x is None)


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_microbatches", "quant_mode", "mesh"),
)
def pipeline_hidden_states(
    stacked_layers: dict[str, Any],
    embed_tokens: jax.Array,  # [V, H] (replicated)
    tokens: jax.Array,  # [B, T] int32
    *,
    config: ModelConfig,
    n_microbatches: int,
    quant_mode: str = "xla",
    mesh: Mesh,
) -> jax.Array:
    """Run the stacked decoder as a GPipe pipeline. Returns final hidden
    states [B, T, H] (before the final norm), replicated.

    B must divide by n_microbatches; n_microbatches >= n_stage keeps the
    pipeline bubble below 50%.
    """
    S = mesh.shape["stage"]
    L = jax.tree.leaves(stacked_layers)[0].shape[0]
    if L % S:
        raise ValueError(f"num layers {L} must divide by n_stage {S}")
    B, T = tokens.shape
    M = n_microbatches
    if B % M:
        raise ValueError(f"batch {B} must divide by n_microbatches {M}")
    if M < S:
        raise ValueError(f"n_microbatches {M} < n_stage {S}: bubble-dominated")
    mb = B // M
    H = config.hidden_size

    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (mb, T))
    cos, sin = rope_tables(positions, config.rotary_dim, config.rope_theta)
    act_dtype = embed_tokens.dtype  # activations stay in the embed dtype,
    # exactly as model_forward keeps them (bit-equality with the TP/single
    # path is what the tests assert)

    def scan_local_layers(local_layers, x):
        """x [mb, T, H] through this stage's L/S layers (one XLA loop)."""

        def body(carry, lp):
            y, _ = layer_forward(
                lp, carry, config, 0, cos, sin, positions, None,
                jnp.zeros((), jnp.int32), quant_mode,
            )
            return y, None

        y, _ = jax.lax.scan(body, x, local_layers)
        return y

    def pp_body(local_layers, embed, toks_mb):
        # toks_mb [M, mb, T] (replicated); local_layers leaves [L/S, ...]
        stage = jax.lax.axis_index("stage")
        perm = [(s, s + 1) for s in range(S - 1)]
        x = jnp.zeros((mb, T, H), act_dtype)
        outbuf = jnp.zeros((M, mb, T, H), act_dtype)
        for t in range(M + S - 1):
            recv = jax.lax.ppermute(x, "stage", perm)
            inject = jnp.take(embed, toks_mb[min(t, M - 1)], axis=0)
            if config.gemma_norm:
                inject = inject * jnp.asarray(
                    float(config.hidden_size) ** 0.5, inject.dtype
                )
            x_in = jnp.where(stage == 0, inject, recv)
            x = scan_local_layers(local_layers, x_in)
            # the last stage finishes microbatch t-(S-1) at tick t
            done = t - (S - 1)
            if done >= 0:
                outbuf = jax.lax.dynamic_update_slice(
                    outbuf, x[None], (done, 0, 0, 0)
                )
        # [1, M, mb, T, H] per stage -> [S, ...] global; caller takes [-1]
        return outbuf[None]

    layer_specs = jax.tree.map(
        lambda a: P(*(("stage",) + (None,) * (a.ndim - 1))),
        stacked_layers,
    )
    outbuf = jax.shard_map(
        pp_body,
        mesh=mesh,
        in_specs=(layer_specs, P(), P()),
        out_specs=P("stage"),
    )(stacked_layers, embed_tokens, tokens.reshape(M, mb, T))
    h = outbuf[-1]  # last stage's buffer [M, mb, T, H]
    return h.reshape(B, T, H)


def pipeline_logits(
    params: dict[str, Any],
    config: ModelConfig,
    tokens: jax.Array,  # [B, T]
    mesh: Mesh,
    *,
    n_microbatches: int | None = None,
    quant_mode: str = "xla",
) -> jax.Array:
    """Full-model forward under pipeline parallelism. Returns [B, T, V] f32.

    Token-for-token equal to `model_forward` (tests/test_parallel.py). The
    stacked/sharded layer pytree is rebuilt per call — callers doing repeated
    evaluation should hold `shard_stacked_layers(stack_layers(...))` and call
    `pipeline_hidden_states` directly.
    """
    _check_pipelineable(config)
    S = mesh.shape["stage"]
    if n_microbatches is None:
        n_microbatches = max(S, tokens.shape[0])
    stacked = shard_stacked_layers(stack_layers(params["layers"]), mesh)
    rep = NamedSharding(mesh, P())
    embed = jax.device_put(params["embed_tokens"], rep)
    h = pipeline_hidden_states(
        stacked, embed, jax.device_put(tokens, rep),
        config=config, n_microbatches=n_microbatches,
        quant_mode=quant_mode, mesh=mesh,
    )
    h = rms_norm(
        h, jax.device_put(params["norm"], rep), config.rms_norm_eps,
        config.zero_centered_norm,
    )
    # logits math mirrors model_forward's tail exactly (decoder.py)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(
            h, embed.T.astype(h.dtype), preferred_element_type=jnp.float32
        )
    else:
        logits = apply_linear(
            jax.device_put(lm_head, rep), h, quant_mode=quant_mode
        ).astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    if config.logit_softcap:
        logits = jnp.tanh(logits / config.logit_softcap) * config.logit_softcap
    return logits
