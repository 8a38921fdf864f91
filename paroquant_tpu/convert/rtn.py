"""Round-to-nearest quantization of a dense model (no calibration).

Produces the same runtime format as the full calibration pipeline but with
identity rotations / unit channel scales (theta=0) — the "AWQ-less RTN"
starting point. The calibration optimizer (paroquant_tpu/optim) learns
theta/channel_scales/quantizer params on top of this and strictly improves it.

Reference parity: module selection mirrors the reference's swap rules —
q/k/v/o/gate/up/down linears are quantized; embeddings, lm_head, norms and
MoE router gates are not (experiments/optimize/4bit.sh skip list; vLLM
plugin modules_to_not_convert, plugin.py:123-151).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.decoder import DenseLinear
from ..ops import quant, rotation as rot_ops
from ..ops.moe import QuantizedMoEExperts
from ..ops.qlinear import QuantizedLinear, make_quantized_linear
from ..ops.packing import pack_wq_tpu

QUANTIZED_LINEARS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")

import functools

import jax


@functools.partial(jax.jit, static_argnames=("n_bits", "group_size"))
def _rtn_quantize_jit(w_rot, n_bits, group_size):
    """One fused device computation per weight shape (eager per-op dispatch
    is pathologically slow over a remote TPU relay)."""
    qp = quant.calc_scales_and_zero_points(w_rot, group_size, n_bits)
    return quant.quantize_to_int(w_rot, qp, n_bits, group_size)


_ROT_CACHE: dict[tuple, Any] = {}


def _cached_rotation_params(in_features, group_size, num_rotations, seed):
    """Pair generation is O(group_size^2) host work; cache per shape."""
    key = (in_features, group_size, num_rotations, seed)
    if key not in _ROT_CACHE:
        _ROT_CACHE[key] = rot_ops.make_rotation_params(
            in_features, group_size, num_rotations, seed
        )
    return _ROT_CACHE[key]


def _hadamard_rotation_params(in_features: int, group_size: int):
    """Hadamard-equivalent rotation in the pairs/theta interchange format.

    log2(group_size) butterfly stages at theta = pi/4 compose to a dense
    orthogonal per-group mixer with entries +-1/sqrt(group_size) — the
    QuaRot/SpinQuant-style no-training rotation, exactly representable in
    the PARO checkpoint schema (so it flows through every loader/kernel).
    """
    from ..ops.butterfly import make_butterfly_params

    key = ("hadamard", in_features, group_size)
    if key not in _ROT_CACHE:
        k = int(np.log2(group_size))
        params = make_butterfly_params(in_features, group_size, k)
        theta = np.where(
            np.asarray(params.mask), 0.0, np.pi / 4
        ).astype(np.float32)
        _ROT_CACHE[key] = (params, theta)
    return _ROT_CACHE[key]


def quantize_linear_rtn(
    lin: DenseLinear,
    *,
    n_bits: int = 4,
    group_size: int = 128,
    num_rotations: int = 8,
    seed: int = 0,
    random_rotation: bool = False,
    hadamard: bool = False,
    rot_dtype=jnp.bfloat16,
) -> QuantizedLinear:
    """Quantize one dense linear (w [I, O]) to the PARO runtime format."""
    w = np.asarray(lin.w, np.float32).T  # [O, I] reference orientation
    O, I = w.shape
    if hadamard:
        params, theta = _hadamard_rotation_params(I, group_size)
    else:
        params = _cached_rotation_params(
            I, group_size, num_rotations, seed if random_rotation else 0
        )
    if random_rotation and not hadamard:
        rng = np.random.default_rng(seed)
        theta = np.where(
            np.asarray(params.mask), 0.0, rng.normal(0, 0.1, params.theta.shape)
        ).astype(np.float32)
    if random_rotation or hadamard:
        form_np = rot_ops.pairs_to_permutation(np.asarray(params.pairs), group_size)
        form = rot_ops.PermutationForm(*(jnp.asarray(a) for a in form_np))
        w_rot = rot_ops.apply_rotation_stages(jnp.asarray(w), jnp.asarray(theta), form)
    else:
        # theta == 0 -> rotation is the identity; skip the stage application
        theta = np.zeros(params.theta.shape, np.float32)
        w_rot = jnp.asarray(w)
    q, s, z = _rtn_quantize_jit(w_rot, n_bits, group_size)
    return make_quantized_linear(
        np.asarray(q), np.asarray(s), np.asarray(z),
        np.asarray(params.pairs), theta, np.ones(I, np.float32), group_size,
        bias=None if lin.b is None else np.asarray(lin.b, np.float32),
        rot_dtype=rot_dtype, n_bits=n_bits,
    )


def quantize_experts_rtn(
    experts: dict[str, Any], *, n_bits: int = 4, group_size: int = 128,
    num_rotations: int = 8, seed: int = 0, rot_dtype=jnp.bfloat16,
) -> QuantizedMoEExperts:
    """Quantize stacked MoE experts with identity shared rotations."""
    gate = np.asarray(experts["gate_proj"], np.float32)  # [E, H, I]
    up = np.asarray(experts["up_proj"], np.float32)
    down = np.asarray(experts["down_proj"], np.float32)  # [E, I, H]
    E, H, I_moe = gate.shape

    def quant_stack(w_stack):  # [E, In, Out] quantize along In per (e, out) row
        qs, ss, zs = [], [], []
        for e in range(w_stack.shape[0]):
            w = w_stack[e].T  # [Out, In]
            q, s, z = _rtn_quantize_jit(jnp.asarray(w), n_bits, group_size)
            qs.append(pack_wq_tpu(np.asarray(q).T, n_bits, group_size))
            ss.append(np.asarray(s).T)
            zs.append(np.asarray(z).T)
        return (
            jnp.asarray(np.stack(qs)),
            jnp.asarray(np.stack(ss)).astype(jnp.bfloat16),
            jnp.asarray(np.stack(zs)).astype(jnp.bfloat16),
        )

    gq, gs, gz = quant_stack(gate)
    uq, us, uz = quant_stack(up)
    dq, ds, dz = quant_stack(down)
    eye_h = jnp.broadcast_to(
        jnp.eye(group_size, dtype=rot_dtype), (H // group_size, group_size, group_size)
    )
    eye_i = jnp.broadcast_to(
        jnp.eye(group_size, dtype=rot_dtype), (I_moe // group_size, group_size, group_size)
    )
    return QuantizedMoEExperts(
        gate_qweight=gq, gate_scales=gs, gate_zeros=gz,
        up_qweight=uq, up_scales=us, up_zeros=uz,
        down_qweight=dq, down_scales=ds, down_zeros=dz,
        gate_up_rot=eye_h, down_rot=eye_i,
    )


def quantize_model_rtn(
    params: dict[str, Any],
    config: ModelConfig,
    *,
    n_bits: int = 4,
    group_size: int = 128,
    num_rotations: int = 8,
    seed: int = 0,
    rot_dtype=jnp.bfloat16,
    quantize_lm_head: bool = False,
    hadamard: bool = False,
) -> dict[str, Any]:
    """Swap every eligible DenseLinear for a QuantizedLinear (functional copy).

    hadamard=True applies the Hadamard-equivalent butterfly rotation per
    group before quantizing (QuaRot/SpinQuant-style baseline; MoE expert
    stacks keep identity rotations).

    quantize_lm_head extends past the reference (which keeps the lm_head
    dense): at small model scale the vocab projection dominates per-token
    HBM traffic, so W4-ing it buys real decode throughput (untied heads only).
    """
    out = dict(params)
    if quantize_lm_head:
        if "lm_head" in params:
            head = params["lm_head"]
        else:
            # tied embeddings: the OUTPUT projection reads the whole
            # [V, H] bf16 table every decode step while the input lookup
            # gathers one row — so quantize a separate W4 head copy and keep
            # the bf16 table for the gather (big per-token HBM win at small
            # model scale where the vocab projection dominates)
            head = DenseLinear(jnp.asarray(params["embed_tokens"]).T, None)
        out["lm_head"] = quantize_linear_rtn(
            head, n_bits=n_bits, group_size=group_size,
            num_rotations=num_rotations, seed=seed + 10_000, rot_dtype=rot_dtype,
            hadamard=hadamard,
        )
    layers = []
    for i, lp in enumerate(params["layers"]):
        nlp = dict(lp)

        def _q(lin):
            if lin.w.shape[0] % group_size:  # input dim not group-aligned
                return lin
            return quantize_linear_rtn(
                lin, n_bits=n_bits, group_size=group_size,
                num_rotations=num_rotations, seed=seed + i, rot_dtype=rot_dtype,
                hadamard=hadamard,
            )

        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            if name in lp:
                nlp[name] = _q(lp[name])
        if "linear_attn" in lp:
            # gated delta-net (hybrid) layer: quantize the big projections,
            # keep the decay/gate projection dense — the reference skips it
            # (4bit_moe.sh --skipped-modules linear_attn.in_proj_a/b; our
            # fused in_proj_ba is that projection)
            la = dict(lp["linear_attn"])
            for name in ("in_proj_qkvz", "out_proj"):
                la[name] = _q(la[name])
            nlp["linear_attn"] = la
        mlp = dict(lp["mlp"])
        if "experts" in mlp and not isinstance(mlp["experts"], QuantizedMoEExperts):
            if config.moe_intermediate_size % group_size == 0:
                mlp["experts"] = quantize_experts_rtn(
                    mlp["experts"], n_bits=n_bits, group_size=group_size,
                    num_rotations=num_rotations, seed=seed + i, rot_dtype=rot_dtype,
                )
        else:
            for name in ("gate_proj", "up_proj", "down_proj"):
                if name in mlp:
                    mlp[name] = quantize_linear_rtn(
                        mlp[name], n_bits=n_bits, group_size=group_size,
                        num_rotations=num_rotations, seed=seed + i, rot_dtype=rot_dtype,
                        hadamard=hadamard,
                    )
        if "shared_expert" in mlp:
            # quantized like any GLU; its sigmoid gate stays dense (the
            # reference skips only mlp.shared_expert_gate, 4bit_moe.sh)
            mlp["shared_expert"] = {
                name: _q(lin) for name, lin in mlp["shared_expert"].items()
            }
        nlp["mlp"] = mlp
        layers.append(nlp)
    out["layers"] = layers
    return out


def rtn_export_linear(
    lin: DenseLinear, *, n_bits: int = 4, group_size: int = 128,
    num_rotations: int = 8, hadamard: bool = False,
) -> dict[str, Any]:
    """Export dict (checkpoint interchange form) for an RTN-quantized linear:
    identity rotation (theta=0) or Hadamard-equivalent butterfly stages
    (hadamard=True, the QuaRot/SpinQuant-style baseline); unit channel
    scales."""
    w = np.asarray(lin.w, np.float32).T  # [O, I]
    if hadamard:
        params, theta = _hadamard_rotation_params(w.shape[1], group_size)
        form_np = rot_ops.pairs_to_permutation(np.asarray(params.pairs), group_size)
        form = rot_ops.PermutationForm(*(jnp.asarray(a) for a in form_np))
        w_rot = rot_ops.apply_rotation_stages(jnp.asarray(w), jnp.asarray(theta), form)
    else:
        params = _cached_rotation_params(w.shape[1], group_size, num_rotations, 0)
        theta = np.zeros(params.theta.shape, np.float32)
        w_rot = jnp.asarray(w)
    q, s, z = _rtn_quantize_jit(w_rot, n_bits, group_size)
    return {
        "q": np.asarray(q),
        "scales": np.asarray(s),
        "zeros": np.asarray(z),
        "pairs": np.asarray(params.pairs),
        "theta": np.asarray(theta, np.float32),
        "inv_channel_scales": np.ones(w.shape[1], np.float32),
        "bias": None if lin.b is None else np.asarray(lin.b, np.float32),
        "n_bits": n_bits,
        "group_size": group_size,
    }


def rtn_export_model(
    params: dict[str, Any], config: ModelConfig, *,
    n_bits: int = 4, group_size: int = 128, hadamard: bool = False,
) -> list[dict[str, Any]]:
    """Per-layer export dicts for save_paro_checkpoint / save_awq_checkpoint
    (the RTN baseline path; MoE experts stay dense in this baseline).
    hadamard=True rotates each 128-group by the Hadamard-equivalent butterfly
    before quantizing (QuaRot/SpinQuant-style no-training baseline)."""
    exports: list[dict[str, Any]] = []
    for lp in params["layers"]:
        e: dict[str, Any] = {}
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            if isinstance(lp.get(name), DenseLinear):
                if lp[name].w.shape[0] % group_size == 0:
                    e[name] = rtn_export_linear(
                        lp[name], n_bits=n_bits, group_size=group_size,
                        hadamard=hadamard,
                    )
        mlp = lp.get("mlp", {})
        for name in ("gate_proj", "up_proj", "down_proj"):
            if isinstance(mlp.get(name), DenseLinear):
                if mlp[name].w.shape[0] % group_size == 0:
                    e[f"mlp.{name}"] = rtn_export_linear(
                        mlp[name], n_bits=n_bits, group_size=group_size,
                        hadamard=hadamard,
                    )
        exports.append(e)
    return exports
