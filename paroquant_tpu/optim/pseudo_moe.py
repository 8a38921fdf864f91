"""Differentiable pseudo-quantized MoE experts for calibration.

JAX counterpart of the reference PseudoQuantizedMoEExperts
(/root/reference/paroquant/optim/qexperts.py): stacked expert weights with
ONE shared rotation/channel-scale set per projection across all experts —
gate and up share the input-side (hidden) rotation, down has its own
(qexperts.py:71-105). Pseudo-quantization reshapes [E, O, I] -> [E*O, I] so
the group quantizer treats every expert row alike (qexperts.py:151-196).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quant
from ..ops import rotation as rot_ops
from ..ops.packing import pack_wq_tpu
from ..ops.moe import QuantizedMoEExperts


@flax.struct.dataclass
class PseudoQuantMoEExperts:
    # trainable weights [E, In, Out] layout (matches dense expert params)
    gate_weight: jax.Array  # [E, H, I]
    up_weight: jax.Array  # [E, H, I]
    down_weight: jax.Array  # [E, I, H]
    # shared gate/up (input dim H)
    gate_up_channel_scales: jax.Array  # [H]
    gate_up_theta: jax.Array  # [K, H//2]
    gate_up_q_scale: jax.Array | None  # [(2*E*I)*G_h, 1]
    gate_up_q_zp: jax.Array | None
    # down (input dim I)
    down_channel_scales: jax.Array  # [I]
    down_theta: jax.Array  # [K, I//2]
    down_q_scale: jax.Array | None
    down_q_zp: jax.Array | None
    # fixed rotation structure
    gate_up_mask: jax.Array
    gate_up_pairs: jax.Array
    gate_up_perm: jax.Array
    gate_up_sign: jax.Array
    gate_up_theta_idx: jax.Array
    down_mask: jax.Array
    down_pairs: jax.Array
    down_perm: jax.Array
    down_sign: jax.Array
    down_theta_idx: jax.Array
    # static
    n_bits: int = flax.struct.field(pytree_node=False, default=4)
    group_size: int = flax.struct.field(pytree_node=False, default=128)

    PARAM_FIELDS = {
        "weight": ("gate_weight", "up_weight", "down_weight"),
        "bias": (),
        "angles": ("gate_up_theta", "down_theta"),
        "channel_scales": ("gate_up_channel_scales", "down_channel_scales"),
        "quantizer": (
            "gate_up_q_scale", "gate_up_q_zp", "down_q_scale", "down_q_zp",
        ),
    }

    def gu_form(self):
        return rot_ops.PermutationForm(
            self.gate_up_perm, self.gate_up_sign, self.gate_up_theta_idx
        )

    def down_form(self):
        return rot_ops.PermutationForm(
            self.down_perm, self.down_sign, self.down_theta_idx
        )


def make_pseudo_moe(
    experts: dict[str, Any],
    gu_rotation: rot_ops.RotationParams,
    down_rotation: rot_ops.RotationParams,
    *,
    n_bits: int = 4,
    group_size: int = 128,
) -> PseudoQuantMoEExperts:
    gu_perm, gu_sign, gu_tidx = rot_ops.pairs_to_permutation(
        np.asarray(gu_rotation.pairs), group_size
    )
    d_perm, d_sign, d_tidx = rot_ops.pairs_to_permutation(
        np.asarray(down_rotation.pairs), group_size
    )
    gate = jnp.asarray(experts["gate_proj"], jnp.float32)
    H = gate.shape[1]
    I_moe = gate.shape[2]
    return PseudoQuantMoEExperts(
        gate_weight=gate,
        up_weight=jnp.asarray(experts["up_proj"], jnp.float32),
        down_weight=jnp.asarray(experts["down_proj"], jnp.float32),
        gate_up_channel_scales=jnp.ones((H,), jnp.float32),
        gate_up_theta=jnp.asarray(gu_rotation.theta, jnp.float32),
        gate_up_q_scale=None,
        gate_up_q_zp=None,
        down_channel_scales=jnp.ones((I_moe,), jnp.float32),
        down_theta=jnp.asarray(down_rotation.theta, jnp.float32),
        down_q_scale=None,
        down_q_zp=None,
        gate_up_mask=jnp.asarray(gu_rotation.mask),
        gate_up_pairs=jnp.asarray(gu_rotation.pairs, jnp.int32),
        gate_up_perm=jnp.asarray(gu_perm),
        gate_up_sign=jnp.asarray(gu_sign),
        gate_up_theta_idx=jnp.asarray(gu_tidx),
        down_mask=jnp.asarray(down_rotation.mask),
        down_pairs=jnp.asarray(down_rotation.pairs, jnp.int32),
        down_perm=jnp.asarray(d_perm),
        down_sign=jnp.asarray(d_sign),
        down_theta_idx=jnp.asarray(d_tidx),
        n_bits=n_bits,
        group_size=group_size,
    )


def _rotated_scaled(w_stack, scales, theta, mask, form):
    """[E, O, In] -> rotated+scaled rows [E*O, In] (quantizer view)."""
    E, O, In = w_stack.shape[0], w_stack.shape[2], w_stack.shape[1]
    # weights are stored [E, In, Out]; quantizer rows are output rows:
    w = jnp.swapaxes(w_stack, 1, 2).reshape(-1, In)  # [E*Out, In]
    theta_eff = jnp.where(mask, 0.0, theta)
    w = w * scales[None, :]
    return rot_ops.apply_rotation_stages(w, theta_eff, form)


def _gu_rotated(p: PseudoQuantMoEExperts) -> jax.Array:
    """Concatenated gate+up rotated rows [2*E*I, H] (shared quantizer, the
    reference's fused gate_up_weight view)."""
    g = _rotated_scaled(
        p.gate_weight, p.gate_up_channel_scales, p.gate_up_theta,
        p.gate_up_mask, p.gu_form(),
    )
    u = _rotated_scaled(
        p.up_weight, p.gate_up_channel_scales, p.gate_up_theta,
        p.gate_up_mask, p.gu_form(),
    )
    return jnp.concatenate([g, u], axis=0)


def init_moe_quantizers(p: PseudoQuantMoEExperts) -> PseudoQuantMoEExperts:
    gu = _gu_rotated(p)
    qp_gu = quant.calc_scales_and_zero_points(gu, p.group_size, p.n_bits)
    d = _rotated_scaled(
        p.down_weight, p.down_channel_scales, p.down_theta, p.down_mask, p.down_form()
    )
    qp_d = quant.calc_scales_and_zero_points(d, p.group_size, p.n_bits)
    return p.replace(
        gate_up_q_scale=qp_gu.scale, gate_up_q_zp=qp_gu.zero_point_float,
        down_q_scale=qp_d.scale, down_q_zp=qp_d.zero_point_float,
    )


def _pseudo_quant_stack(w_stack, scales, theta, mask, form, q_scale, q_zp,
                        n_bits, group_size, row_offset=0, total_rows=None):
    """Full pseudo-quant round trip for one stacked projection."""
    E, In, Out = w_stack.shape
    w = jnp.swapaxes(w_stack, 1, 2).reshape(-1, In)  # [E*Out, In]
    theta_eff = jnp.where(mask, 0.0, theta)
    w = w * scales[None, :]
    w = rot_ops.apply_rotation_stages(w, theta_eff, form)
    if q_scale is not None:
        G = In // group_size
        n_rows = w.shape[0]
        sl = slice(row_offset * G, (row_offset + n_rows) * G)
        params = quant.QuantizerParams(q_scale[sl], q_zp[sl])
        w = quant.pseudo_quantize(w, n_bits, group_size, params)
    else:
        w = quant.pseudo_quantize(w, n_bits, group_size)
    w = rot_ops.apply_rotation_stages(w, theta_eff, form, inverse=True)
    w = w / scales[None, :]
    return jnp.swapaxes(w.reshape(E, Out, In), 1, 2)  # back to [E, In, Out]


def pseudo_moe_effective_experts(p: PseudoQuantMoEExperts) -> dict[str, jax.Array]:
    """Dense effective expert weights after simulated quantization."""
    E, H, I_moe = p.gate_weight.shape
    gate = _pseudo_quant_stack(
        p.gate_weight, p.gate_up_channel_scales, p.gate_up_theta, p.gate_up_mask,
        p.gu_form(), p.gate_up_q_scale, p.gate_up_q_zp, p.n_bits, p.group_size,
        row_offset=0,
    )
    up = _pseudo_quant_stack(
        p.up_weight, p.gate_up_channel_scales, p.gate_up_theta, p.gate_up_mask,
        p.gu_form(), p.gate_up_q_scale, p.gate_up_q_zp, p.n_bits, p.group_size,
        row_offset=E * I_moe,
    )
    down = _pseudo_quant_stack(
        p.down_weight, p.down_channel_scales, p.down_theta, p.down_mask,
        p.down_form(), p.down_q_scale, p.down_q_zp, p.n_bits, p.group_size,
        row_offset=0,
    )
    return {"gate_proj": gate, "up_proj": up, "down_proj": down}


def export_quantized_moe(p: PseudoQuantMoEExperts) -> dict[str, Any]:
    """Hard-quantize to interchange tensors (reference convert.py:280-405)."""
    E, H, I_moe = p.gate_weight.shape
    gs = p.group_size
    if p.gate_up_q_scale is not None:
        qp_gu = quant.QuantizerParams(p.gate_up_q_scale, p.gate_up_q_zp)
        qp_d = quant.QuantizerParams(p.down_q_scale, p.down_q_zp)
    else:
        tmp = init_moe_quantizers(p)
        qp_gu = quant.QuantizerParams(tmp.gate_up_q_scale, tmp.gate_up_q_zp)
        qp_d = quant.QuantizerParams(tmp.down_q_scale, tmp.down_q_zp)

    gu = _gu_rotated(p)  # [2*E*I, H]
    q_gu, s_gu, z_gu = quant.quantize_to_int(gu, qp_gu, p.n_bits, gs)
    d = _rotated_scaled(
        p.down_weight, p.down_channel_scales, p.down_theta, p.down_mask, p.down_form()
    )
    q_d, s_d, z_d = quant.quantize_to_int(d, qp_d, p.n_bits, gs)

    def split_stack(q, s, z, E, O, In):
        # rows are [E*O, In] -> per-expert [E, O, In]
        return (
            np.asarray(q).reshape(E, O, In),
            np.asarray(s).reshape(E, O, -1),
            np.asarray(z).reshape(E, O, -1),
        )

    q_gate, s_gate, z_gate = split_stack(
        q_gu[: E * I_moe], s_gu[: E * I_moe], z_gu[: E * I_moe], E, I_moe, H
    )
    q_up, s_up, z_up = split_stack(
        q_gu[E * I_moe :], s_gu[E * I_moe :], z_gu[E * I_moe :], E, I_moe, H
    )
    q_down, s_down, z_down = split_stack(q_d, s_d, z_d, E, H, I_moe)

    theta_gu = np.asarray(jnp.where(p.gate_up_mask, 0.0, p.gate_up_theta))
    theta_d = np.asarray(jnp.where(p.down_mask, 0.0, p.down_theta))
    return {
        "moe": True,
        "n_bits": p.n_bits,
        "group_size": gs,
        "gate": {"q": q_gate, "scales": s_gate, "zeros": z_gate},
        "up": {"q": q_up, "scales": s_up, "zeros": z_up},
        "down": {"q": q_down, "scales": s_down, "zeros": z_down},
        "gate_up_theta": theta_gu,
        "gate_up_pairs": np.asarray(p.gate_up_pairs),
        "gate_up_inv_channel_scales": np.asarray(1.0 / p.gate_up_channel_scales),
        "down_theta": theta_d,
        "down_pairs": np.asarray(p.down_pairs),
        "down_inv_channel_scales": np.asarray(1.0 / p.down_channel_scales),
    }


def quantized_moe_from_export(exp: dict[str, Any], rot_dtype=jnp.float32) -> QuantizedMoEExperts:
    gs = int(exp["group_size"])
    n_bits = int(exp["n_bits"])

    def rot_matrices(pairs, theta, inv_cs):
        form_np = rot_ops.pairs_to_permutation(np.asarray(pairs), gs)
        form = rot_ops.PermutationForm(*(jnp.asarray(a) for a in form_np))
        R = rot_ops.build_rotation_matrices(
            jnp.asarray(theta, jnp.float32), form, gs, dtype=jnp.float32
        )
        inv = jnp.asarray(inv_cs, jnp.float32).reshape(-1, gs)
        return (R * inv[:, None, :]).astype(rot_dtype)

    def pack_stack(sub):
        q = np.asarray(sub["q"])  # [E, O, In]
        E = q.shape[0]
        qw = np.stack([pack_wq_tpu(q[e].T, n_bits, gs) for e in range(E)])
        s = np.ascontiguousarray(np.swapaxes(np.asarray(sub["scales"], np.float32), 1, 2))
        z = np.ascontiguousarray(np.swapaxes(np.asarray(sub["zeros"], np.float32), 1, 2))
        # narrow storage like QuantizedLinear: f16 scales, int8 zeros
        return (
            jnp.asarray(qw),
            jnp.asarray(s).astype(jnp.bfloat16),
            jnp.asarray(z).astype(jnp.bfloat16),
        )

    gq, gsc, gz = pack_stack(exp["gate"])
    uq, usc, uz = pack_stack(exp["up"])
    dq, dsc, dz = pack_stack(exp["down"])
    return QuantizedMoEExperts(
        gate_qweight=gq, gate_scales=gsc, gate_zeros=gz,
        up_qweight=uq, up_scales=usc, up_zeros=uz,
        down_qweight=dq, down_scales=dsc, down_zeros=dz,
        gate_up_rot=rot_matrices(
            exp["gate_up_pairs"], exp["gate_up_theta"], exp["gate_up_inv_channel_scales"]
        ),
        down_rot=rot_matrices(
            exp["down_pairs"], exp["down_theta"], exp["down_inv_channel_scales"]
        ),
    )
