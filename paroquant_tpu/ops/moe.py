"""Token-choice MoE expert dispatch (Qwen3-MoE semantics).

The reference replicates experts on every rank and runs either HF's grouped
experts (optim/qexperts.py:224-262) or MLX SwitchGLU gathers
(backends/mlx/modules.py:159-212). Here dispatch is TPU-shaped:

- decode / tiny T: gather the selected experts' weight matrices per token
  (reads only top-k experts' weights from HBM — decode is BW-bound)
- prefill: capacity-bucketed dispatch -> one batched [E, C, H] x [E, H, I]
  grouped GEMM on the MXU -> weighted combine (standard JAX MoE pattern;
  tokens over capacity are dropped, matching common capacity-factor practice)

Expert weights are stacked arrays: gate_proj/up_proj [E, H, I],
down_proj [E, I, H]. A quantized variant (shared rotations per projection
across experts, reference qexperts.py:71-105) lives in QuantizedMoEExperts.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .packing import unpack_wq_tpu


class QuantizedMoEExperts(NamedTuple):
    """Stacked quantized experts with ONE shared rotation per projection.

    gate_up shares a single rotation/scale set across all experts and both
    gate/up halves (reference qexperts.py:71-105); down likewise. Packed
    weights keep the expert dim leading: qweight uint8 [E, I//2, O].
    """

    gate_qweight: jax.Array  # [E, H//2, I_moe]
    gate_scales: jax.Array  # [E, G_h, I_moe]
    gate_zeros: jax.Array  # [E, G_h, I_moe]
    up_qweight: jax.Array  # [E, H//2, I_moe]
    up_scales: jax.Array
    up_zeros: jax.Array
    down_qweight: jax.Array  # [E, I_moe//2, H]
    down_scales: jax.Array  # [E, G_i, H]
    down_zeros: jax.Array
    gate_up_rot: jax.Array  # [G_h, S, S] shared (scales folded)
    down_rot: jax.Array  # [G_i, S, S] shared

    @property
    def group_size(self) -> int:
        return self.gate_up_rot.shape[-1]


def _dequant_stacked(qweight, scales, zeros, group_size):
    """[E, I//2, O] packed -> [E, I, O] float32."""

    def one(qw, s, z):
        q = unpack_wq_tpu(qw, s.shape[0] * group_size, group_size)  # [I, O]
        G = s.shape[0]
        S = group_size
        qg = q.reshape(G, S, -1).astype(jnp.float32)
        return ((qg - z[:, None, :]) * s[:, None, :]).reshape(q.shape)

    return jax.vmap(one)(qweight, scales, zeros)


def _rotate_tokens(x: jax.Array, rot: jax.Array) -> jax.Array:
    """x [T, H] -> rotated via per-group matrices [G, S, S] (scales folded)."""
    G, S, _ = rot.shape
    xg = x.reshape(-1, G, S)
    y = jnp.einsum(
        "gij,tgj->tgi", rot.astype(jnp.float32), xg.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(x.shape).astype(x.dtype)


def _expert_weights(experts: dict[str, Any] | QuantizedMoEExperts, group_size=None):
    """Returns (gate [E,H,I], up [E,H,I], down [E,I,H], pre_rot fns)."""
    if isinstance(experts, QuantizedMoEExperts):
        gs = experts.group_size
        gate = _dequant_stacked(experts.gate_qweight, experts.gate_scales, experts.gate_zeros, gs)
        up = _dequant_stacked(experts.up_qweight, experts.up_scales, experts.up_zeros, gs)
        down = _dequant_stacked(experts.down_qweight, experts.down_scales, experts.down_zeros, gs)
        return gate, up, down, experts.gate_up_rot, experts.down_rot
    return experts["gate_proj"], experts["up_proj"], experts["down_proj"], None, None


def moe_apply(
    experts: dict[str, Any] | QuantizedMoEExperts,
    x: jax.Array,  # [T, H]
    idx: jax.Array,  # int32 [T, K] selected experts
    gates: jax.Array,  # [T, K] combine weights
    quant_mode: str = "xla",
    capacity_factor: float = 2.0,
    return_act: bool = False,  # also return down_proj inputs [T*K, I_moe]
    # (pooled over expert assignments — shared-Hessian GPTQ calibration)
):
    T = x.shape[0]
    K = idx.shape[1]
    if T * K <= 64 and not return_act:
        return _moe_gather(experts, x, idx, gates)
    # prefill: EXACT drop-free grouped GEMM (sort by expert + ragged_dot);
    # the capacity-bucketed path (_moe_capacity) is kept for ablations but
    # drops tokens under routing imbalance (round-1 VERDICT weak item 7)
    return _moe_ragged(experts, x, idx, gates, return_act=return_act)


def _moe_ragged(experts, x, idx, gates, return_act=False):
    """Sort token-expert assignments by expert and run grouped GEMMs with
    jax.lax.ragged_dot — every assignment is processed (no capacity drops),
    shapes stay static, and the MXU sees one contiguous GEMM per expert."""
    gate_w, up_w, down_w, rot_gu, rot_d = _expert_weights(experts)
    E = gate_w.shape[0]
    T, H = x.shape
    K = idx.shape[1]
    N = T * K
    xr = x if rot_gu is None else _rotate_tokens(x, rot_gu)

    flat_e = idx.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    token_of = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
    src_tok = token_of[order]  # [N]
    xs = jnp.take(xr, src_tok, axis=0).astype(jnp.float32)  # [N, H]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    g = jax.lax.ragged_dot(xs, gate_w.astype(jnp.float32), group_sizes,
                           preferred_element_type=jnp.float32)
    u = jax.lax.ragged_dot(xs, up_w.astype(jnp.float32), group_sizes,
                           preferred_element_type=jnp.float32)
    act = jax.nn.silu(g) * u  # [N, I]
    if rot_d is not None:
        act = _rotate_tokens(act.astype(x.dtype), rot_d).astype(jnp.float32)
    ys = jax.lax.ragged_dot(act, down_w.astype(jnp.float32), group_sizes,
                            preferred_element_type=jnp.float32)  # [N, H]
    w = gates.reshape(-1)[order].astype(jnp.float32)[:, None]
    y = jnp.zeros((T, H), jnp.float32).at[src_tok].add(ys * w)
    y = y.astype(x.dtype)
    return (y, act) if return_act else y


def _moe_gather(experts, x, idx, gates):
    T, K = idx.shape
    if isinstance(experts, QuantizedMoEExperts):
        # gather the PACKED buffers for the selected experts first, then
        # dequantize only those [T*K] slices — decode reads just the top-k
        # experts' bytes from HBM, not the whole expert pool
        gs = experts.group_size
        flat = idx.reshape(-1)

        def deq(qw, s, z):
            picked = _dequant_stacked(
                jnp.take(qw, flat, axis=0), jnp.take(s, flat, axis=0),
                jnp.take(z, flat, axis=0), gs,
            )
            return picked.reshape(T, K, *picked.shape[1:])

        wg = deq(experts.gate_qweight, experts.gate_scales, experts.gate_zeros)
        wu = deq(experts.up_qweight, experts.up_scales, experts.up_zeros)
        wd = deq(experts.down_qweight, experts.down_scales, experts.down_zeros)
        rot_gu, rot_d = experts.gate_up_rot, experts.down_rot
    else:
        gate_w, up_w, down_w, rot_gu, rot_d = _expert_weights(experts)
        wg = jnp.take(gate_w, idx, axis=0)  # [T, K, H, I]
        wu = jnp.take(up_w, idx, axis=0)
        wd = jnp.take(down_w, idx, axis=0)  # [T, K, I, H]
    xr = x if rot_gu is None else _rotate_tokens(x, rot_gu)
    g = jnp.einsum("th,tkhi->tki", xr.astype(jnp.float32), wg.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("th,tkhi->tki", xr.astype(jnp.float32), wu.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    act = (jax.nn.silu(g) * u).astype(x.dtype)  # [T, K, I]
    if rot_d is not None:
        G, S, _ = rot_d.shape
        ag = act.reshape(act.shape[0], act.shape[1], G, S)
        act = jnp.einsum("gij,tkgj->tkgi", rot_d.astype(jnp.float32), ag.astype(jnp.float32),
                         preferred_element_type=jnp.float32).reshape(act.shape).astype(x.dtype)
    y = jnp.einsum("tki,tkih->tkh", act.astype(jnp.float32), wd.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.sum(y * gates[..., None].astype(jnp.float32), axis=1).astype(x.dtype)


def _moe_capacity(experts, x, idx, gates, capacity_factor):
    gate_w, up_w, down_w, rot_gu, rot_d = _expert_weights(experts)
    E = gate_w.shape[0]
    T, H = x.shape
    K = idx.shape[1]
    capacity = max(int(T * K * capacity_factor / E), 8)
    capacity = min(capacity, T)

    xr = x if rot_gu is None else _rotate_tokens(x, rot_gu)

    # flatten assignments and compute each one's slot within its expert
    flat_e = idx.reshape(-1)  # [T*K]
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)  # [T*K, E]
    pos = jnp.cumsum(onehot, axis=0) - onehot  # prior count per expert
    slot = jnp.sum(pos * onehot, axis=1)  # [T*K]
    keep = slot < capacity
    dest = jnp.where(keep, flat_e * capacity + slot, E * capacity)  # drop bucket

    token_of = jnp.repeat(jnp.arange(T, dtype=jnp.int32), K)
    xe = jnp.zeros((E * capacity + 1, H), xr.dtype).at[dest].set(xr[token_of])
    xe = xe[:-1].reshape(E, capacity, H)

    g = jnp.einsum("ech,ehi->eci", xe.astype(jnp.float32), gate_w.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("ech,ehi->eci", xe.astype(jnp.float32), up_w.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    act = (jax.nn.silu(g) * u).astype(x.dtype)
    if rot_d is not None:
        G, S, _ = rot_d.shape
        ag = act.reshape(E, capacity, G, S)
        act = jnp.einsum("gij,ecgj->ecgi", rot_d.astype(jnp.float32), ag.astype(jnp.float32),
                         preferred_element_type=jnp.float32).reshape(act.shape).astype(x.dtype)
    ye = jnp.einsum("eci,eih->ech", act.astype(jnp.float32), down_w.astype(jnp.float32),
                    preferred_element_type=jnp.float32)  # [E, C, H]

    ye_flat = jnp.concatenate([ye.reshape(E * capacity, H), jnp.zeros((1, H), ye.dtype)])
    per_assign = ye_flat[jnp.where(keep, dest, E * capacity)]  # [T*K, H]
    w = (gates.reshape(-1) * keep.astype(gates.dtype))[:, None].astype(jnp.float32)
    y = jnp.zeros((T, H), jnp.float32).at[token_of].add(per_assign * w)
    return y.astype(x.dtype)
